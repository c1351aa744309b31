#!/usr/bin/env python
"""Headline benchmark: ViT-B APLA fine-tune training throughput, one chip.

Matches BASELINE.md's target metric (images/sec/chip for ViT-B, patch 14,
224px, APLA rank 128 supervised fine-tune — the NABirds/ImageNet apla.yml
recipe).  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

vs_baseline is measured against 280 img/s — an A100-80GB PyTorch+xformers
estimate for the same recipe (the reference publishes figures, not numbers;
BASELINE.json sets the target at >=2x A100).
"""

from __future__ import annotations

import json
import os
import time

import jax

# persistent compile cache: ViT-B train-step compiles through the axon
# remote-compile tunnel take minutes; the cache cuts warm runs to seconds
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

A100_BASELINE_IPS = 280.0
BATCH = 64
STEPS = 30


def main():
    from apla_tpu.apla.core import AplaConfig
    from apla_tpu.models.classifier import init_classifier
    from apla_tpu.models.vit import VIT_BUILDERS
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
    tx = build_optimizer("AdamW", {"lr": 3e-5, "weight_decay": 1e-5},
                         trainable, grad_clip=1.0)
    state = TrainState.create(trainable, tx)
    train_step = make_train_step(cfg, tx, cross_entropy)

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.standard_normal((BATCH, 224, 224, 3)),
                             jnp.bfloat16),
        "label": jnp.asarray(rng.integers(0, 1000, BATCH), jnp.int32),
    }
    key = jax.random.PRNGKey(1)

    # compile + tunnel warmup (first device->host transfer is slow)
    state, m = train_step(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    for _ in range(3):
        state, m = train_step(state, frozen, batch, 3e-5, key)
    jax.block_until_ready(state.trainable)

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = train_step(state, frozen, batch, 3e-5, key)
    jax.block_until_ready(state.trainable)
    dt = time.perf_counter() - t0

    ips = BATCH * STEPS / dt
    print(json.dumps({
        "metric": "vit_b_apla128_finetune_throughput",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / A100_BASELINE_IPS, 2),
    }))


if __name__ == "__main__":
    main()
