#!/usr/bin/env python
"""Round-3: fix-or-retire the long-sequence flash path (VERDICT r2 item 3).

ViT-B/14 @518 (N=1370, the reference pre-train grid).  Round 1 measured the
blockwise flash path at 22.5 img/s vs 59.7 XLA — with 128-wide blocks
(1370 pads to 1408, which only 128 divides).  Padding to 1536 admits
512-wide blocks.  Variants (one subprocess each):

  xla_b8              XLA attention train step + compile-time HBM
  flash_b8_blk512     blockwise flash, 512 blocks (new default)
  flash_b8_blk256     256 blocks
  flash_b8_blk128     128 blocks (the round-1 configuration)
  vitg_probe_xla_b4   ViT-giant @518 b4, XLA — expected NOT to fit 16 GB
  vitg_probe_flash_b4 ViT-giant @518 b4, flash — the mem-eff fit claim

  setsid nohup python experiments/r3_long_seq.py > experiments/r3_long_seq.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "r3_long_seq.jsonl")


def emit(rec):
    rec["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def step(tag, model="vit_base", batch=8, flash=False, steps=10):
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

    cfg = VIT_BUILDERS[model](
        img_size=518, patch_size=14, has_layerscale=True,
        layerscale_init=1.0, drop_path_rate=0.0, gelu_tanh=True,
        use_flash=flash)
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg, n_classes=1000,
        apla_cfg=AplaConfig(partial_size=128))
    tx = build_optimizer("AdamW", {"lr": 3e-5, "weight_decay": 1e-5},
                         trainable, grad_clip=1.0)
    state = TrainState.create(trainable, tx)
    stepf = make_train_step(cfg, tx, cross_entropy)

    rng = np.random.default_rng(0)
    batch_d = {"image": jnp.asarray(
        rng.standard_normal((batch, 518, 518, 3)), jnp.bfloat16),
        "label": jnp.asarray(rng.integers(0, 1000, batch), jnp.int32)}
    key = jax.random.PRNGKey(1)

    mem = compiled_memory_analysis(stepf, state, frozen, batch_d, 3e-5, key)
    emit({"study": "mem", "tag": tag, "model": model, "batch": batch,
          "flash": flash, **mem})

    state, m = stepf(state, frozen, batch_d, 3e-5, key)
    _ = float(m["loss"])
    for _ in range(2):
        state, m = stepf(state, frozen, batch_d, 3e-5, key)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = stepf(state, frozen, batch_d, 3e-5, key)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / steps
    emit({"study": "step518", "tag": tag, "model": model, "batch": batch,
          "flash": flash,
          "flash_block": os.environ.get("APLA_FLASH_BLOCK", "512"),
          "ms_step": round(dt * 1e3, 1), "img_s": round(batch / dt, 1)})


def _env_variant(tag, blk):
    os.environ["APLA_FLASH_BLOCK"] = str(blk)
    step(tag, flash=True)


VARIANTS = {
    "xla_b8": lambda: step("xla_b8", flash=False),
    "flash_b8_blk512": lambda: _env_variant("flash_b8_blk512", 512),
    "flash_b8_blk256": lambda: _env_variant("flash_b8_blk256", 256),
    "flash_b8_blk128": lambda: _env_variant("flash_b8_blk128", 128),
    "vitg_probe_xla_b4": lambda: step("vitg_xla_b4", model="vit_giant",
                                      batch=4, flash=False, steps=5),
    "vitg_probe_flash_b4": lambda: step("vitg_flash_b4", model="vit_giant",
                                        batch=4, flash=True, steps=5),
}


def main():
    if len(sys.argv) > 1:
        VARIANTS[sys.argv[1]]()
        return
    me = os.path.abspath(__file__)
    for name in VARIANTS:
        print(f"=== {name} ===", flush=True)
        r = subprocess.run([sys.executable, me, name], timeout=1800)
        if r.returncode:
            emit({"study": "error", "kind": name, "rc": r.returncode})


if __name__ == "__main__":
    main()
