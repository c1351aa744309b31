#!/usr/bin/env python
"""Round-5: bisect the Swin fused-kernel remote-compile crash.

All r5_swin_fused fused variants died with `tpu_compile_helper subprocess
exit code 1` (HTTP 500, Mosaic error swallowed).  The kernel differs from
the hardware-validated ViT small-N path in four ways; each variant below
isolates one, compiling the raw pallas_call (no model) in its own
subprocess and dumping the FULL exception text:

  base96      the EXISTING fused_apla_attention at Swin stage-0 shapes
              (C=96, H=3 -> Dh=32, N=49) — unaligned C / small Dh in the
              already-validated kernel
  swin768     fused_swin_attention at stage-3 shapes (C=768 aligned,
              H=24, nW=1 zeros mask) — bias machinery alone
  swin96      stage-0 shapes, nW=1 zeros mask — bias + unaligned C
  swin96sh    stage-0 shapes, real 64-window shift mask — the i % nblk
              mask index map on top
  swin192     stage-1 shapes (C=192, H=6, nW=16 mask)

Each variant tries fwd first, then fwd+bwd (separate records).

  python experiments/r5_swin_bisect.py          # all, serialized
  python experiments/r5_swin_bisect.py swin96   # one
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "r5_swin_bisect.jsonl")

# (C, H, B=images*windows, nW[, env]) — N fixed at 49 (window 7)
# Round-1 findings (r5_swin_bisect.jsonl): only the WIDE stage's backward
# fails — scoped-VMEM 26.16M > 16M at C=768 BB=8 (full [C,C] dW + full
# g_t blocks, doubled-buffered).  C=96/192, the shift mask, the mod index
# map, and Dh=32 all compile.  Round 2 finds the validated bwd BB ladder.
CONFIGS = {
    "base96": (96, 3, 64, 0),      # 0 -> use fused_apla_attention
    "swin768": (768, 24, 64, 1),
    "swin96": (96, 3, 512, 1),
    "swin96sh": (96, 3, 512, 64),
    "swin192": (192, 6, 256, 16),
    # round 2: the wide-stage bwd BB ladder + the untested stage-2 width
    "swin384": (384, 12, 128, 4),
    "swin768bb4": (768, 24, 64, 1, {"APLA_FUSED_BB_BWD_SMALL": "4"}),
    "swin768bb2": (768, 24, 64, 1, {"APLA_FUSED_BB_BWD_SMALL": "2"}),
    "swin384bb4": (384, 12, 128, 4, {"APLA_FUSED_BB_BWD_SMALL": "4"}),
}
ROUND2 = ("swin384", "swin768bb4", "swin768bb2", "swin384bb4")
N = 49


def emit(rec):
    rec["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def run(name):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    import numpy as np

    cfg = CONFIGS[name]
    C, H, B, nW = cfg[:4]
    for k, v in (cfg[4] if len(cfg) > 4 else {}).items():
        os.environ[k] = v
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * C)), jnp.bfloat16)
    scale = (C // H) ** -0.5

    if nW == 0:
        from apla_tpu.ops.pallas_apla_attn import fused_apla_attention
        k = 64
        w_t = jnp.asarray(rng.standard_normal((C, k)), jnp.float32)
        b_t = jnp.zeros((k,), jnp.float32)
        w_f = jnp.asarray(rng.standard_normal((C, C)), jnp.float32)
        b_f = jnp.zeros((C,), jnp.float32)
        inds = jnp.arange(k, dtype=jnp.int32)

        def fwd(qkv, w_t):
            return jnp.sum(fused_apla_attention(
                qkv, w_t, b_t, w_f, b_f, inds, H, scale
            ).astype(jnp.float32))

        diff_args = (qkv, w_t)
    else:
        from apla_tpu.ops.pallas_apla_attn import fused_swin_attention
        w = jnp.asarray(rng.standard_normal((C, C)), jnp.float32)
        b = jnp.zeros((C,), jnp.float32)
        bias = jnp.asarray(rng.standard_normal((H, N, N)), jnp.float32)
        wmask = jnp.zeros((nW, N, N), jnp.float32) if nW == 1 else \
            jnp.asarray(
                rng.choice([0.0, -100.0], (nW, N, N)), jnp.float32)

        def fwd(qkv, w):
            return jnp.sum(fused_swin_attention(
                qkv, w, b, bias, wmask, H, scale).astype(jnp.float32))

        diff_args = (qkv, w)

    for phase in ("fwd", "bwd"):
        fn = jax.jit(fwd) if phase == "fwd" else \
            jax.jit(jax.grad(fwd, argnums=(0, 1)))
        t0 = time.time()
        try:
            out = fn(*diff_args)
            _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
            emit({"study": "r5_swin_bisect", "variant": name, "phase": phase,
                  "ok": True, "compile_s": round(time.time() - t0, 1)})
        except Exception as e:  # noqa: BLE001
            full = repr(e)
            log = OUT.replace(".jsonl", f"_{name}_{phase}.err")
            with open(log, "w") as f:
                f.write(full)
            emit({"study": "r5_swin_bisect", "variant": name, "phase": phase,
                  "ok": False, "err_head": full[:300], "err_file": log})
            return  # bwd would re-hit the fwd failure


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] in CONFIGS:
        run(sys.argv[1])
    else:
        from apla_tpu.utils.tpu_client_lock import tpu_client
        names = ROUND2 if "--round2" in sys.argv else \
            tuple(n for n in CONFIGS if n not in ROUND2)
        emit({"study": "r5_swin_bisect", "subprocess_per_variant": True,
              "names": list(names)})
        here = os.path.abspath(__file__)
        root = os.path.dirname(os.path.dirname(here))
        with tpu_client("r5_swin_bisect"):
            for name in names:
                subprocess.run([sys.executable, here, name], cwd=root)
        emit({"study": "r5_swin_bisect", "done": True})
