#!/usr/bin/env python
"""DINOv2 full-recipe TPU throughput (VERDICT #7): steady-state img/s for
the 2x224-global + 8x98-local multi-crop step (ViT-B/14, APLA-128, iBOT
masking, KoLeo, EMA teacher) at b8 and b16 — the reference pre-train recipe
(params/pretrain/dinov2/ISIC2019/vit_b).

Run detached (one TPU client at a time):
  setsid nohup python experiments/r2_dinov2_bench.py > experiments/r2_dinov2_bench.log 2>&1 &
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

OUT = os.path.join(os.path.dirname(__file__), "r2_dinov2_bench.jsonl")
STEPS = 15


def emit(rec):
    rec["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def bench(batch_size):
    from apla_tpu.ssl.dinov2 import Dinov2Trainer, DINOv2Wrapper
    from apla_tpu.utils.config import load_merged_params

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params = load_merged_params(os.path.join(
        root, "params", "synthetic", "vit_tiny", "dinov2.yml"))
    # real pre-train recipe geometry on synthetic data
    params.model_params.backbone_type = "vit_base"
    sp = params.model_params.transformers_params.student
    sp.pre_img_size = 224
    sp.patch_size = 14
    sp.layerscale = 1.0
    params.model_params.adaptation.params.partial_size = 128
    params.dataset_params.ssl_global_size = 224
    params.dataset_params.ssl_local_size = 98
    params.dataset_params.synthetic_size = 4 * batch_size
    params.dataset_params.synthetic_img_size = 256
    # reference head sizes (dinov2 __common__ recipe)
    for head in ("dino", "ibot"):
        params.model_params.dinov2[head].head_n_prototypes = 65536
        params.model_params.dinov2[head].head_bottleneck_dim = 256
        params.model_params.dinov2[head].head_hidden_dim = 2048
    params.training_params.is_dry = True
    for ld in ("trainloader", "valloader", "testloader"):
        params.dataloader_params[ld].batch_size = batch_size

    wrapper = DINOv2Wrapper(params)
    wrapper.instantiate()
    trainer = Dinov2Trainer(wrapper)
    loader = wrapper.dataloaders.trainloader
    batch = next(iter(loader))
    dbatch = trainer._device_batch(batch)
    step_fn = trainer._get_step(False)

    state, m = step_fn(trainer.state, trainer.frozen, dbatch,
                       1e-4, 0.04, 0.994, 0.07, trainer.rng)
    _ = float(m["loss"])
    for _ in range(2):
        state, m = step_fn(state, trainer.frozen, dbatch,
                           1e-4, 0.04, 0.994, 0.07, trainer.rng)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step_fn(state, trainer.frozen, dbatch,
                           1e-4, 0.04, 0.994, 0.07, trainer.rng)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / STEPS

    from apla_tpu.utils.profiling import device_memory_stats
    rec = {"study": "dinov2_recipe", "batch": batch_size,
           "ms_per_step": round(dt * 1e3, 1),
           "img_s": round(batch_size / dt, 1),
           "crops": "2x224g + 8x98l"}
    rec.update(device_memory_stats())
    emit(rec)


if __name__ == "__main__":
    emit({"study": "dinov2_recipe", "devices": str(jax.devices())})
    for bs in (8, 16):
        try:
            bench(bs)
        except Exception as e:  # noqa: BLE001
            emit({"study": "dinov2_recipe", "batch": bs,
                  "error": repr(e)[:300]})
    emit({"study": "dinov2_recipe", "done": True})
