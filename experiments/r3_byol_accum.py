#!/usr/bin/env python
"""Round-3 study D: BYOL throughput + accum on the real chip (never
measured before; the two-view @224 step is structurally close to the
supervised step, where the microbatch scan won +53%).  ViT-B/14, APLA-128,
device-side crops, gelu_tanh.  One subprocess per variant:

  python experiments/r3_byol_accum.py          # all variants
  python experiments/r3_byol_accum.py b64a8    # one
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "r3_byol_accum.jsonl")
STEPS = 20

VARIANTS = {
    "b32a1": (32, 1),
    "b64a1": (64, 1),
    "b64a4": (64, 4),
    "b64a8": (64, 8),
}


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

    from apla_tpu.ssl.byol import BYOLTrainer, BYOLWrapper
    from apla_tpu.utils.config import load_merged_params

    batch_size, accum = VARIANTS[name]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params = load_merged_params(os.path.join(
        root, "params", "synthetic", "vit_tiny", "byol.yml"))
    params.model_params.backbone_type = "vit_base"
    tp = params.model_params.transformers_params
    tp.img_size = [224]
    tp.patch_size = 14
    tp.gelu_tanh = True
    params.model_params.transformers_params.block_conf = {
        "has_layerscale": True, "layerscale_init_values": 1.0}
    params.model_params.adaptation.params.partial_size = 128
    params.dataset_params.synthetic_size = 4 * batch_size
    params.dataset_params.synthetic_img_size = 256
    params.dataset_params.device_augment = True
    params.dataset_params.ssl_global_size = 224
    params.training_params.is_dry = True
    params.training_params.accum_steps = accum
    for ld in ("trainloader", "valloader", "testloader"):
        params.dataloader_params[ld].batch_size = batch_size

    wrapper = BYOLWrapper(params, use_momentum=True)
    wrapper.instantiate()
    trainer = BYOLTrainer(wrapper)
    batch = next(iter(wrapper.dataloaders.trainloader))
    views = trainer._device_views(batch)

    state, m = trainer.train_step(trainer.state, trainer.frozen, views,
                                  1e-4, 0.99, trainer.rng)
    _ = float(m["loss"])
    for _ in range(2):
        state, m = trainer.train_step(state, trainer.frozen, views,
                                      1e-4, 0.99, trainer.rng)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = trainer.train_step(state, trainer.frozen, views,
                                      1e-4, 0.99, trainer.rng)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / STEPS
    emit({"study": "D", "variant": name, "batch": batch_size,
          "accum": accum, "ms_per_step": round(dt * 1e3, 1),
          "img_s": round(batch_size / dt, 1), "views": "2x224 device-crop"})


if __name__ == "__main__":
    if len(sys.argv) > 1:
        try:
            bench(sys.argv[1])
        except Exception as e:  # noqa: BLE001
            emit({"study": "D", "variant": sys.argv[1],
                  "error": repr(e)[:300]})
    else:
        emit({"study": "D", "subprocess_per_variant": True})
        here = os.path.abspath(__file__)
        root = os.path.dirname(os.path.dirname(here))
        for name in VARIANTS:
            subprocess.run([sys.executable, here, name], cwd=root)
        emit({"study": "D", "done": True})
