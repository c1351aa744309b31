#!/usr/bin/env python
"""Round-3 study A: knob matrix at the ACCUM regime (b64 update as a scan of
8 b8 microbatches — the shipped bench config).  The round-2 remat/unroll
sweep ran only at the monolithic b64 step; at micro-b8 the activation
footprint is 1/8, so storing more residuals (remat=None / dots_batch) or
unrolling the trunk scan may now pay where it lost at b64.

One subprocess per variant (fresh trace caches, ONE TPU client at a time):
  python experiments/r3_accum_knobs.py          # all variants
  python experiments/r3_accum_knobs.py <name>   # one (subprocess mode)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "r3_accum_knobs.jsonl")
BATCH = 64
ACCUM = 8

VARIANTS = {
    "dots": dict(remat="dots"),                      # shipped default
    "none": dict(remat=None),                        # store-all at micro-b8
    "dots_batch": dict(remat="dots_batch"),
    "dots_attn": dict(remat="dots_attn"),
    "full": dict(remat="full"),
    "dots_unroll2": dict(remat="dots", scan_unroll=2),
    "none_unroll2": dict(remat=None, scan_unroll=2),
    "dots_unroll4": dict(remat="dots", scan_unroll=4),
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

    kw = VARIANTS[name]
    cfg = VIT_BUILDERS["vit_base"](
        img_size=224, patch_size=14, has_layerscale=True,
        layerscale_init=1.0, drop_path_rate=0.0, gelu_tanh=True, **kw)
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg, n_classes=1000,
        apla_cfg=AplaConfig(partial_size=128))
    tx = build_optimizer("AdamW", {"lr": 3e-5, "weight_decay": 1e-5},
                         trainable, grad_clip=1.0)
    state = TrainState.create(trainable, tx)
    step = make_train_step(cfg, tx, cross_entropy, accum_steps=ACCUM)

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
        emit({"study": "A", "variant": name, "accum": ACCUM,
              "ms": round(dt * 1e3, 2), "img_s": round(BATCH / dt, 1)})
    except Exception as e:  # noqa: BLE001
        emit({"study": "A", "variant": name, "error": repr(e)[:400]})


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_variant(sys.argv[1])
    else:
        emit({"study": "A", "subprocess_per_variant": True})
        here = os.path.abspath(__file__)
        root = os.path.dirname(os.path.dirname(here))
        for name in VARIANTS:
            subprocess.run([sys.executable, here, name], cwd=root)
        emit({"study": "A", "done": True})
