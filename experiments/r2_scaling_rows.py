#!/usr/bin/env python
"""Round-2 scaling rows: ViT-L/14 @224 and ViT-B/14 @518 (the reference
pre-train grid) under the round-2 config (gelu_tanh, dots, accum).

  python experiments/r2_scaling_rows.py            # all
  python experiments/r2_scaling_rows.py <variant>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "r2_scaling_rows.jsonl")

VARIANTS = {
    # name: (builder, img, batch, accum)
    "vitl_224_b32_acc2": ("vit_large", 224, 32, 2),
    "vitl_224_b16_acc1": ("vit_large", 224, 16, 1),
    "vitb_518_b8_acc1": ("vit_base", 518, 8, 1),
    "vitb_518_b8_acc2": ("vit_base", 518, 8, 2),
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

    builder, img, bs, accum = VARIANTS[name]
    cfg = VIT_BUILDERS[builder](
        img_size=img, patch_size=14, has_layerscale=True,
        layerscale_init=1.0, drop_path_rate=0.0, gelu_tanh=True)
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg, n_classes=1000,
        apla_cfg=AplaConfig(partial_size=128))
    tx = build_optimizer("AdamW", {"lr": 3e-5, "weight_decay": 1e-5},
                         trainable, grad_clip=1.0)
    state = TrainState.create(trainable, tx)
    step = make_train_step(cfg, tx, cross_entropy, accum_steps=accum)
    rng = np.random.default_rng(0)
    batch = {"image": jnp.asarray(rng.standard_normal((bs, img, img, 3)),
                                  jnp.bfloat16),
             "label": jnp.asarray(rng.integers(0, 1000, bs), jnp.int32)}
    key = jax.random.PRNGKey(1)
    try:
        mem = compiled_memory_analysis(step, state, frozen, batch, 3e-5, key)
        state, m = step(state, frozen, batch, 3e-5, key)
        _ = float(m["loss"])
        for _ in range(3):
            state, m = step(state, frozen, batch, 3e-5, key)
        _ = float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(20):
            state, m = step(state, frozen, batch, 3e-5, key)
        _ = float(m["loss"])
        dt = (time.perf_counter() - t0) / 20
        rec = {"study": "scaling", "variant": name,
               "ms": round(dt * 1e3, 2), "img_s": round(bs / dt, 1)}
        rec.update(mem)
        emit(rec)
    except Exception as e:  # noqa: BLE001
        emit({"study": "scaling", "variant": name, "error": repr(e)[:300]})


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_variant(sys.argv[1])
    else:
        here = os.path.abspath(__file__)
        root = os.path.dirname(os.path.dirname(here))
        for name in VARIANTS:
            subprocess.run([sys.executable, here, name], cwd=root)
        emit({"study": "scaling", "done": True})
