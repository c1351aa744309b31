#!/usr/bin/env python
"""Round-3: fused-kernel coverage beyond ViT-B supervised — BYOL (2-view
SSL) and ViT-L, at their round-3 recipe configs.  Baselines on record:
BYOL b64a8 = 307.0 img/s, ViT-L b64a8 = 281.8 (r3_byol_accum.jsonl,
r3_vitl_accum.jsonl).

  python experiments/r3_fused_more.py           # all (one subprocess each)
  python experiments/r3_fused_more.py <variant>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "r3_fused_more.jsonl")


def emit(rec):
    rec["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def setup():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    return jax


def vitl(fused):
    jax = setup()
    import jax.numpy as jnp
    import numpy as np

    from apla_tpu.apla.core import AplaConfig
    from apla_tpu.models.classifier import init_classifier
    from apla_tpu.models.vit import VIT_BUILDERS
    from apla_tpu.train.losses import cross_entropy
    from apla_tpu.train.optim import build_optimizer
    from apla_tpu.train.steps import make_train_step
    from apla_tpu.train.train_state import TrainState

    cfg = VIT_BUILDERS["vit_large"](
        img_size=224, patch_size=14, has_layerscale=True,
        layerscale_init=1.0, gelu_tanh=True, use_fused_apla=fused)
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg, n_classes=1000,
        apla_cfg=AplaConfig(partial_size=128))
    tx = build_optimizer("AdamW", {"lr": 3e-5, "weight_decay": 1e-5},
                         trainable, grad_clip=1.0)
    state = TrainState.create(trainable, tx)
    stepf = make_train_step(cfg, tx, cross_entropy, accum_steps=8)
    rng = np.random.default_rng(0)
    batch = {"image": jnp.asarray(rng.standard_normal((64, 224, 224, 3)),
                                  jnp.bfloat16),
             "label": jnp.asarray(rng.integers(0, 1000, 64), jnp.int32)}
    key = jax.random.PRNGKey(1)
    state, m = stepf(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    for _ in range(2):
        state, m = stepf(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(12):
        state, m = stepf(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / 12
    emit({"study": "vitl_fused", "model": "vit_large", "fused": fused,
          "batch": 64, "accum": 8,
          "ms_step": round(dt * 1e3, 1), "img_s": round(64 / dt, 1)})


def byol(fused):
    jax = setup()
    import tempfile

    from apla_tpu.ssl.byol import BYOLTrainer, BYOLWrapper
    from apla_tpu.utils.config import load_merged_params

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params = load_merged_params(os.path.join(
        root, "params", "synthetic", "vit_tiny", "byol.yml"))
    params.model_params.backbone_type = "vit_base"
    tp = params.model_params.transformers_params
    tp.img_size = [224]
    tp.patch_size = 14
    tp.gelu_tanh = True
    tp.block_conf = {"has_layerscale": True, "layerscale_init_values": 1.0}
    if fused:
        tp.use_fused_apla = True
    params.model_params.adaptation.params.partial_size = 128
    params.dataset_params.device_augment = True
    params.dataset_params.ssl_global_size = 224  # real 224px views
    params.dataset_params.synthetic_img_size = 256
    params.dataset_params.synthetic_size = 256
    params.training_params.is_dry = True
    params.training_params.accum_steps = 8
    for ld in ("trainloader", "valloader", "testloader"):
        params.dataloader_params[ld].batch_size = 64
        params.dataloader_params[ld].num_workers = 2
    params.training_params.save_dir = tempfile.mkdtemp(prefix="byolf_")

    wrapper = BYOLWrapper(params)
    wrapper.instantiate()
    trainer = BYOLTrainer(wrapper)
    loader = wrapper.dataloaders.trainloader
    loader.set_epoch(0)
    batch = next(iter(loader))
    views = trainer._device_views(batch)
    state, m = trainer.train_step(trainer.state, trainer.frozen, views,
                                  1e-3, 0.99, trainer.rng)
    _ = float(m["loss"])
    for _ in range(2):
        state, m = trainer.train_step(state, trainer.frozen, views,
                                      1e-3, 0.99, trainer.rng)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(12):
        state, m = trainer.train_step(state, trainer.frozen, views,
                                      1e-3, 0.99, trainer.rng)
    loss = float(m["loss"])
    dt = (time.perf_counter() - t0) / 12
    emit({"study": "byol_fused", "model": "vit_base@224", "fused": fused,
          "batch": 64, "accum": 8,
          "ms_step": round(dt * 1e3, 1), "img_s": round(64 / dt, 1),
          "loss": round(loss, 4)})


VARIANTS = {
    "vitl_fused": lambda: vitl(True),
    "byol_fused": lambda: byol(True),
    "byol_base": lambda: byol(False),
}


def main():
    if len(sys.argv) > 1:
        VARIANTS[sys.argv[1]]()
        return
    me = os.path.abspath(__file__)
    for name in VARIANTS:
        print(f"=== {name} ===", flush=True)
        r = subprocess.run([sys.executable, me, name], timeout=2400)
        if r.returncode:
            emit({"study": "error", "kind": name, "rc": r.returncode})


if __name__ == "__main__":
    main()
