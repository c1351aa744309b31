#!/usr/bin/env python
"""Round-3 study G: seg/det side-car train-step throughput on one v5e.

- seg: the reference seg recipe shape — SETR-PUP on APLA-'full' ViT-L/16
  @512 (apla_setr_vit-l_pup_8xb2-160k_ade20k-512x512.py; 150 classes).
- det: APLA-Swin-T + FCOS @224, COCO-ish 80 classes.

One subprocess per variant:
  python experiments/r3_segdet_bench.py          # all
  python experiments/r3_segdet_bench.py seg_b8
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "r3_segdet_bench.jsonl")
STEPS = 15

VARIANTS = ("seg_b2", "seg_b4", "seg_b8", "det_b8", "det_b16")


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

    kind, b = name.split("_b")
    batch = int(b)
    rng = np.random.default_rng(0)

    if kind == "seg":
        from apla_tpu.models.seg import init_segmenter, make_seg_train_step
        from apla_tpu.models.vit import VIT_BUILDERS
        cfg = VIT_BUILDERS["vit_large"](img_size=512, patch_size=16,
                                        gelu_tanh=True)
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
        args = (trainable, opt_state, frozen, bt)
        loss_key = "loss"
    else:
        from apla_tpu.models.detection import (_conv_init, init_fcos_head,
                                               make_detection_train_step)
        from apla_tpu.models.swin import (SwinConfig, build_apla_swin,
                                          init_swin_params)
        cfg = SwinConfig(img_size=224)  # Swin-T defaults
        key = jax.random.PRNGKey(0)
        sp = init_swin_params(key, cfg)
        bb_t, bb_f = build_apla_swin(sp)
        n_levels = len(cfg.depths)
        dims = [cfg.embed_dim * 2 ** i for i in range(n_levels)]
        keys = jax.random.split(key, n_levels + 1)
        trainable = {
            "backbone": bb_t,
            "head": init_fcos_head(keys[0], cfg.embed_dim, 80, channels=128,
                                   n_levels=n_levels),
            "laterals": [_conv_init(keys[1 + i], 1, dims[i], cfg.embed_dim)
                         for i in range(n_levels)],
        }
        tx = optax.adamw(1e-4)
        opt_state = tx.init(trainable)
        strides = tuple(4 * 2 ** i for i in range(n_levels))
        step = make_detection_train_step(cfg, tx, strides=strides)
        boxes = np.zeros((batch, 16, 4), np.float32)
        boxes[:, :4] = rng.uniform(0, 100, (batch, 4, 4)).astype(np.float32)
        boxes[:, :4, 2:] += 60
        labels = np.full((batch, 16), -1, np.int32)
        labels[:, :4] = rng.integers(0, 80, (batch, 4))
        bt = {
            "image": jnp.asarray(
                rng.standard_normal((batch, 224, 224, 3)), jnp.bfloat16),
            "boxes": jnp.asarray(boxes),
            "labels": jnp.asarray(labels),
        }
        args = (trainable, opt_state, bb_f, bt)
        loss_key = "total"

    out = step(*args)
    trainable, opt_state, m = out
    _ = float(m[loss_key])
    args = (trainable, opt_state) + args[2:]
    for _i in range(2):
        trainable, opt_state, m = step(trainable, opt_state, *args[2:])
    _ = float(m[loss_key])
    t0 = time.perf_counter()
    for _i in range(STEPS):
        trainable, opt_state, m = step(trainable, opt_state, *args[2:])
    _ = float(m[loss_key])
    dt = (time.perf_counter() - t0) / STEPS
    emit({"study": "G", "variant": name, "batch": batch,
          "ms": round(dt * 1e3, 1), "img_s": round(batch / dt, 1)})


if __name__ == "__main__":
    if len(sys.argv) > 1:
        try:
            bench(sys.argv[1])
        except Exception as e:  # noqa: BLE001
            emit({"study": "G", "variant": sys.argv[1],
                  "error": repr(e)[:300]})
    else:
        emit({"study": "G", "subprocess_per_variant": True})
        here = os.path.abspath(__file__)
        root = os.path.dirname(os.path.dirname(here))
        for name in VARIANTS:
            subprocess.run([sys.executable, here, name], cwd=root)
        emit({"study": "G", "done": True})
