#!/usr/bin/env python
"""Round-2 study F: the shippable knob matrix (real ViTConfig options, no
monkeypatching), one subprocess per variant (fresh trace caches, one TPU
client).

Knobs from study E's step anatomy (baseline 128.5 ms = attention 46.2 +
gelu-erf 15.4 + LN 10.5 + matmuls ~43 + rest):
  remat: dots | dots_attn (save softmaxed attention weights) | dots_batch
  gelu_tanh: False | True

  python experiments/r2_knob_matrix.py          # all variants
  python experiments/r2_knob_matrix.py <name>   # one (subprocess mode)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "r2_knob_matrix.jsonl")
BATCH = 64

VARIANTS = {
    "dots": dict(remat="dots", gelu_tanh=False),
    "dots_attn": dict(remat="dots_attn", gelu_tanh=False),
    "dots_gelu": dict(remat="dots", gelu_tanh=True),
    "dots_attn_gelu": dict(remat="dots_attn", gelu_tanh=True),
    "dots_batch_gelu": dict(remat="dots_batch", gelu_tanh=True),
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
    from apla_tpu.utils.profiling import device_memory_stats

    kw = VARIANTS[name]
    cfg = VIT_BUILDERS["vit_base"](
        img_size=224, patch_size=14, has_layerscale=True,
        layerscale_init=1.0, drop_path_rate=0.0, **kw)
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg, n_classes=1000,
        apla_cfg=AplaConfig(partial_size=128))
    tx = build_optimizer("AdamW", {"lr": 3e-5, "weight_decay": 1e-5},
                         trainable, grad_clip=1.0)
    state = TrainState.create(trainable, tx)
    step = make_train_step(cfg, tx, cross_entropy)

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.standard_normal((BATCH, 224, 224, 3)),
                             jnp.bfloat16),
        "label": jnp.asarray(rng.integers(0, 1000, BATCH), jnp.int32),
    }
    key = jax.random.PRNGKey(1)
    try:
        state, m = step(state, frozen, batch, 3e-5, key)
        _ = float(m["loss"])
        for _ in range(3):
            state, m = step(state, frozen, batch, 3e-5, key)
        _ = float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(30):
            state, m = step(state, frozen, batch, 3e-5, key)
        _ = float(m["loss"])
        dt = (time.perf_counter() - t0) / 30
        rec = {"study": "F", "variant": name, "ms": round(dt * 1e3, 2),
               "img_s": round(BATCH / dt, 1)}
        rec.update(device_memory_stats())
        emit(rec)
    except Exception as e:  # noqa: BLE001
        emit({"study": "F", "variant": name, "error": repr(e)[:400]})


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_variant(sys.argv[1])
    else:
        emit({"study": "F", "subprocess_per_variant": True})
        here = os.path.abspath(__file__)
        root = os.path.dirname(os.path.dirname(here))
        for name in VARIANTS:
            subprocess.run([sys.executable, here, name], cwd=root)
        emit({"study": "F", "done": True})
