#!/usr/bin/env python
"""Round-5: the long q-strip fused kernel on the seg side-car.

The reference seg recipe (apla_setr_vit-l_pup_8xb2-160k_ade20k-512x512.py)
trains APLA-'full' ViT-L/16 @512 — N=1025, squarely the long-sequence
regime the @518 study just won (r5_long_fused.jsonl: +44% over XLA at
N=1370).  Differences from that study: C=1024 (H=16), and 'full' APLA
means k == C (the whole attn.proj trains), so the in-kernel dW_t is a
[1024, 1024] f32 accumulator — the byte model needs the ViT-giant-style
APLA_FUSED_VMEM_MB=15 override to admit the backward.

Baseline (r3_segdet_bench.jsonl): seg_b2 24.9 img/s, seg_b4 21.8,
seg_b8 24.7 — all XLA attention.

One subprocess per variant:
  setsid nohup python experiments/r5_seg_fused.py > experiments/r5_seg_fused.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "r5_seg_fused.jsonl")
STEPS = 15

VARIANTS = ("seg_b2_xla", "seg_b2_fused", "seg_b4_fused", "seg_b8_fused")


def emit(rec):
    rec["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def bench(name):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from apla_tpu.models.seg import init_segmenter, make_seg_train_step
    from apla_tpu.models.vit import VIT_BUILDERS
    from apla_tpu.utils.profiling import compiled_memory_analysis

    _, b, kind = name.split("_")
    batch = int(b[1:])
    fused = kind == "fused"
    rng = np.random.default_rng(0)

    cfg = VIT_BUILDERS["vit_large"](img_size=512, patch_size=16,
                                    gelu_tanh=True, use_fused_apla=fused)
    trainable, frozen = init_segmenter(jax.random.PRNGKey(0), cfg,
                                       n_classes=150)
    tx = optax.adamw(1e-4)
    opt_state = tx.init(trainable)
    step = make_seg_train_step(cfg, tx)
    bt = {
        "image": jnp.asarray(
            rng.standard_normal((batch, 512, 512, 3)), jnp.bfloat16),
        "label": jnp.asarray(
            rng.integers(0, 150, (batch, 512, 512)), jnp.int32),
    }

    if fused:
        from apla_tpu.ops.pallas_apla_attn_long import long_fused_ok
        emit({"study": "r5_seg", "variant": name,
              "long_admitted": bool(long_fused_ok(1025, 1024, 1024,
                                                  b=batch))})

    mem = compiled_memory_analysis(step, trainable, opt_state, frozen, bt)

    t0 = time.time()
    trainable, opt_state, m = step(trainable, opt_state, frozen, bt)
    _ = float(m["loss"])
    compile_s = round(time.time() - t0, 1)
    for _ in range(2):
        trainable, opt_state, m = step(trainable, opt_state, frozen, bt)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        trainable, opt_state, m = step(trainable, opt_state, frozen, bt)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / STEPS
    emit({"study": "r5_seg", "variant": name, "batch": batch,
          "fused": fused, "compile_s": compile_s,
          "ms": round(dt * 1e3, 1), "img_s": round(batch / dt, 1),
          "loss": round(float(m["loss"]), 4), **mem})


if __name__ == "__main__":
    if len(sys.argv) > 1:
        try:
            bench(sys.argv[1])
        except Exception as e:  # noqa: BLE001
            emit({"study": "r5_seg", "variant": sys.argv[1],
                  "error": repr(e)[:400]})
    else:
        from apla_tpu.utils.tpu_client_lock import tpu_client
        emit({"study": "r5_seg", "subprocess_per_variant": True})
        here = os.path.abspath(__file__)
        root = os.path.dirname(os.path.dirname(here))
        env = dict(os.environ, APLA_FUSED_VMEM_MB="15")
        with tpu_client("r5_seg_fused"):
            for name in VARIANTS:
                subprocess.run([sys.executable, here, name], cwd=root,
                               env=env)
        emit({"study": "r5_seg", "done": True})
