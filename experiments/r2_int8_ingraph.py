#!/usr/bin/env python
"""Round-2 study C: full-train-step throughput with SELECTIVE int8 (W8A8,
XLA dynamic per-row activation quant) on chosen frozen kernels.

Study A showed per-op int8 wins at the K>=2304 shapes (fc2) and small wins
at qkv/fc1; the fused Pallas kernel loses everywhere (retired).  This
measures what actually matters: in-graph step time per quantization subset.

Run detached after r2_perf_study.py exits (ONE TPU client at a time):
  setsid nohup python experiments/r2_int8_ingraph.py > experiments/r2_int8_ingraph.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "r2_int8_ingraph.jsonl")
BATCH = 64


def emit(rec):
    rec["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def make_step(which):
    from apla_tpu.apla.core import AplaConfig
    from apla_tpu.models.classifier import init_classifier
    from apla_tpu.models.vit import VIT_BUILDERS
    from apla_tpu.ops.quant import quantize_frozen_backbone
    from apla_tpu.train.losses import cross_entropy
    from apla_tpu.train.optim import build_optimizer
    from apla_tpu.train.steps import make_train_step
    from apla_tpu.train.train_state import TrainState

    cfg = VIT_BUILDERS["vit_base"](
        img_size=224, patch_size=14, has_layerscale=True,
        layerscale_init=1.0, drop_path_rate=0.0)
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg, n_classes=1000,
        apla_cfg=AplaConfig(partial_size=128))
    if which:
        frozen = quantize_frozen_backbone(frozen, which=which)
    tx = build_optimizer("AdamW", {"lr": 3e-5, "weight_decay": 1e-5},
                         trainable, grad_clip=1.0)
    state = TrainState.create(trainable, tx)
    return make_train_step(cfg, tx, cross_entropy), state, frozen


def time_step(step, state, frozen, batch, key, iters=30):
    state, m = step(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    for _ in range(3):
        state, m = step(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.standard_normal((BATCH, 224, 224, 3)),
                             jnp.bfloat16),
        "label": jnp.asarray(rng.integers(0, 1000, BATCH), jnp.int32),
    }
    key = jax.random.PRNGKey(1)
    emit({"study": "C", "devices": str(jax.devices())})
    variants = [
        ("bf16_baseline", ()),
        ("int8_fc2", ("fc2",)),
        ("int8_fc1_fc2", ("fc1", "fc2")),
        ("int8_qkv_fc2", ("qkv", "fc2")),
        ("int8_all", ("qkv", "fc1", "fc2")),
    ]
    for name, which in variants:
        try:
            step, state, frozen = make_step(which)
            dt = time_step(step, state, frozen, batch, key)
            del step, state, frozen
            emit({"study": "C", "variant": name, "ms": round(dt * 1e3, 2),
                  "img_s": round(BATCH / dt, 1)})
        except Exception as e:  # noqa: BLE001
            emit({"study": "C", "variant": name, "error": repr(e)[:300]})
    emit({"study": "C", "done": True})


if __name__ == "__main__":
    main()
