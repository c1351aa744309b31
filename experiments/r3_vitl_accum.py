#!/usr/bin/env python
"""Round-3 study C: batch/accum sweep at ViT-L/14 @224 (APLA-128,
gelu_tanh, remat=dots) — does the microbatch-scan win transfer from ViT-B
(b64 = 8x b8 scan, +53%)?  One subprocess per variant:

  python experiments/r3_vitl_accum.py          # all variants
  python experiments/r3_vitl_accum.py b32a4    # one
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "r3_vitl_accum.jsonl")

VARIANTS = {            # name: (batch, accum)
    "b16a1": (16, 1),
    "b32a1": (32, 1),
    "b32a2": (32, 2),
    "b32a4": (32, 4),
    "b32a8": (32, 8),
    "b64a8": (64, 8),
    "b64a16": (64, 16),
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

    batch, accum = VARIANTS[name]
    cfg = VIT_BUILDERS["vit_large"](
        img_size=224, patch_size=14, has_layerscale=True,
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
        "image": jnp.asarray(rng.standard_normal((batch, 224, 224, 3)),
                             jnp.bfloat16),
        "label": jnp.asarray(rng.integers(0, 1000, batch), jnp.int32),
    }
    key = jax.random.PRNGKey(1)
    mem = compiled_memory_analysis(step, state, frozen, b, 3e-5, key)
    state, m = step(state, frozen, b, 3e-5, key)
    _ = float(m["loss"])
    for _ in range(3):
        state, m = step(state, frozen, b, 3e-5, key)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(20):
        state, m = step(state, frozen, b, 3e-5, key)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / 20
    rec = {"study": "C", "variant": name, "batch": batch, "accum": accum,
           "ms": round(dt * 1e3, 2), "img_s": round(batch / dt, 1)}
    rec.update(mem)
    emit(rec)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        try:
            run_variant(sys.argv[1])
        except Exception as e:  # noqa: BLE001
            emit({"study": "C", "variant": sys.argv[1],
                  "error": repr(e)[:300]})
    else:
        emit({"study": "C", "subprocess_per_variant": True})
        here = os.path.abspath(__file__)
        root = os.path.dirname(os.path.dirname(here))
        for name in VARIANTS:
            subprocess.run([sys.executable, here, name], cwd=root)
        emit({"study": "C", "done": True})
