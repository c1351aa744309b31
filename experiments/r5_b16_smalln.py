#!/usr/bin/env python
"""Round-5: why is the small-N fold neutral at b16? (VERDICT r4 item 8)

The r4 evidence was internally inconsistent: the SAME b16 configurations
measured 150.0 then 161.9 (gate) and 147.5 then 162.0 (min_n=0) across
reruns — +-10% drift, larger than the effect under test.  Before touching
the admission policy, establish whether there IS a b16 effect:

  step16 A/B x3     interleaved (gate = APLA_FUSED_SMALLN=0, locals on
                    XLA) vs (default = fold admission) — 3 repeats each,
                    alternating, one subprocess per run
  chain B=128       isolated 12-layer local-crop chain at the b16 fold
                    depth (128 images of 50 tokens): XLA vs fused BB=8

If the interleaved step delta matches the chain delta, the b8 win scales
and r4's neutrality was noise; if the step delta is genuinely ~0 while
the chain wins, something in the b16 step (teacher pass overlap, grid
scheduling) eats the win.  Output: experiments/r5_b16_smalln.jsonl

  setsid nohup python experiments/r5_b16_smalln.py > experiments/r5_b16_smalln.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, HERE)

OUT = os.path.join(HERE, "r5_b16_smalln.jsonl")

# interleaved A/B repeats, then the isolated chains at the b16 fold depth
VARIANTS = ("step16_gate_r1", "step16_fused_r1",
            "step16_gate_r2", "step16_fused_r2",
            "step16_gate_r3", "step16_fused_r3",
            "chain128_xla", "chain128_bb8")


def emit(rec):
    rec["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def run(name):
    import r4_smalln_attn as r4
    r4.OUT = OUT  # route rows into this study's jsonl

    def tagged_emit(rec, _orig=r4.emit):
        rec["r5_variant"] = name
        _orig(rec)

    r4.emit = tagged_emit
    if name.startswith("step16"):
        if "gate" in name:
            os.environ["APLA_FUSED_SMALLN"] = "0"
        r4.step(16, None)
    else:
        r4.B = 128  # b16 local fold: 16 images x 8 crops
        if name.endswith("xla"):
            r4.chain("xla_proj")
        else:
            os.environ["APLA_FUSED_BB_FWD_SMALL"] = "8"
            os.environ["APLA_FUSED_BB_BWD_SMALL"] = "8"
            os.environ["APLA_FUSED_MIN_N"] = "0"
            r4.chain("fused")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        try:
            run(sys.argv[1])
        except Exception as e:  # noqa: BLE001
            emit({"study": "r5_b16", "variant": sys.argv[1],
                  "error": repr(e)[:400]})
    else:
        from apla_tpu.utils.tpu_client_lock import tpu_client
        emit({"study": "r5_b16", "subprocess_per_variant": True})
        me = os.path.abspath(__file__)
        root = os.path.dirname(HERE)
        with tpu_client("r5_b16_smalln"):
            for name in VARIANTS:
                subprocess.run([sys.executable, me, name], cwd=root)
        emit({"study": "r5_b16", "done": True})
