#!/usr/bin/env python
"""Round-3 study E: scaling rows round 2 — ViT-giant (SwiGLU trunk) and the
@518 pre-train grid under deeper accum.  ViT-B/L sweeps found micro-b8
optimal; this pins the remaining scale points.  One subprocess per variant:

  python experiments/r3_scaling2.py           # all
  python experiments/r3_scaling2.py g_b16a4   # one
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "r3_scaling2.jsonl")

# name: (builder, img, patch, batch, accum)
VARIANTS = {
    "g_b8a1": ("vit_giant", 224, 14, 8, 1),
    "g_b16a2": ("vit_giant", 224, 14, 16, 2),
    "g_b32a4": ("vit_giant", 224, 14, 32, 4),
    "b518_b8a1": ("vit_base", 518, 14, 8, 1),
    "b518_b16a4": ("vit_base", 518, 14, 16, 4),
    "b518_b32a8": ("vit_base", 518, 14, 32, 8),
}


def emit(rec):
    rec["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def run_variant(name):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    import numpy as np

    from apla_tpu.apla.core import AplaConfig
    from apla_tpu.models.classifier import init_classifier
    from apla_tpu.models.vit import VIT_BUILDERS
    from apla_tpu.train.losses import cross_entropy
    from apla_tpu.train.optim import build_optimizer
    from apla_tpu.train.steps import make_train_step
    from apla_tpu.train.train_state import TrainState
    from apla_tpu.utils.profiling import compiled_memory_analysis

    builder, img, patch, batch, accum = VARIANTS[name]
    cfg = VIT_BUILDERS[builder](
        img_size=img, patch_size=patch, has_layerscale=True,
        layerscale_init=1.0, drop_path_rate=0.0, gelu_tanh=True)
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg, n_classes=1000,
        apla_cfg=AplaConfig(partial_size=128))
    tx = build_optimizer("AdamW", {"lr": 3e-5, "weight_decay": 1e-5},
                         trainable, grad_clip=1.0)
    state = TrainState.create(trainable, tx)
    step = make_train_step(cfg, tx, cross_entropy, accum_steps=accum)

    rng = np.random.default_rng(0)
    b = {
        "image": jnp.asarray(rng.standard_normal((batch, img, img, 3)),
                             jnp.bfloat16),
        "label": jnp.asarray(rng.integers(0, 1000, batch), jnp.int32),
    }
    key = jax.random.PRNGKey(1)
    mem = compiled_memory_analysis(step, state, frozen, b, 3e-5, key)
    state, m = step(state, frozen, b, 3e-5, key)
    _ = float(m["loss"])
    for _ in range(2):
        state, m = step(state, frozen, b, 3e-5, key)
    _ = float(m["loss"])
    n = 15
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, frozen, b, 3e-5, key)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / n
    rec = {"study": "E", "variant": name, "model": builder, "img": img,
           "batch": batch, "accum": accum, "ms": round(dt * 1e3, 2),
           "img_s": round(batch / dt, 1)}
    rec.update(mem)
    emit(rec)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        try:
            run_variant(sys.argv[1])
        except Exception as e:  # noqa: BLE001
            emit({"study": "E", "variant": sys.argv[1],
                  "error": repr(e)[:300]})
    else:
        emit({"study": "E", "subprocess_per_variant": True})
        here = os.path.abspath(__file__)
        root = os.path.dirname(os.path.dirname(here))
        for name in VARIANTS:
            subprocess.run([sys.executable, here, name], cwd=root)
        emit({"study": "E", "done": True})
