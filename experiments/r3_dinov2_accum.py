#!/usr/bin/env python
"""Round-3 study B: DINOv2 recipe step with SSL accum_steps on the real
chip.  Round 2 deferred SSL accum on semantics grounds; it now exists with
full-batch teacher statistics (ssl/dinov2.py).  Measures b16 monolithic vs
b16 as 2x/4x microbatch scans, and b32 acc4 (a batch that may not fit
monolithic).  One subprocess per variant, ONE TPU client at a time:

  python experiments/r3_dinov2_accum.py          # all variants
  python experiments/r3_dinov2_accum.py b16a2    # one (subprocess mode)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "r3_dinov2_accum.jsonl")
STEPS = 15

VARIANTS = {
    "b8a1": (8, 1),
    "b16a1": (16, 1),
    "b16a2": (16, 2),
    "b16a4": (16, 4),
    "b32a4": (32, 4),
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

    from apla_tpu.ssl.dinov2 import Dinov2Trainer, DINOv2Wrapper
    from apla_tpu.utils.config import load_merged_params

    batch_size, accum = VARIANTS[name]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params = load_merged_params(os.path.join(
        root, "params", "synthetic", "vit_tiny", "dinov2.yml"))
    params.model_params.backbone_type = "vit_base"
    sp = params.model_params.transformers_params.student
    sp.pre_img_size = 224
    sp.patch_size = 14
    sp.layerscale = 1.0
    sp.gelu_tanh = True
    params.model_params.adaptation.params.partial_size = 128
    params.dataset_params.ssl_global_size = 224
    params.dataset_params.ssl_local_size = 98
    params.dataset_params.synthetic_size = 4 * batch_size
    params.dataset_params.synthetic_img_size = 256
    for head in ("dino", "ibot"):
        params.model_params.dinov2[head].head_n_prototypes = 65536
        params.model_params.dinov2[head].head_bottleneck_dim = 256
        params.model_params.dinov2[head].head_hidden_dim = 2048
    params.training_params.is_dry = True
    params.training_params.accum_steps = accum
    for ld in ("trainloader", "valloader", "testloader"):
        params.dataloader_params[ld].batch_size = batch_size

    wrapper = DINOv2Wrapper(params)
    wrapper.instantiate()
    trainer = Dinov2Trainer(wrapper)
    batch = next(iter(wrapper.dataloaders.trainloader))
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
    emit({"study": "B", "variant": name, "batch": batch_size,
          "accum": accum, "ms_per_step": round(dt * 1e3, 1),
          "img_s": round(batch_size / dt, 1), "gelu": "tanh",
          "crops": "2x224g + 8x98l"})


if __name__ == "__main__":
    if len(sys.argv) > 1:
        try:
            bench(sys.argv[1])
        except Exception as e:  # noqa: BLE001
            emit({"study": "B", "variant": sys.argv[1],
                  "error": repr(e)[:300]})
    else:
        emit({"study": "B", "subprocess_per_variant": True})
        here = os.path.abspath(__file__)
        root = os.path.dirname(os.path.dirname(here))
        for name in VARIANTS:
            subprocess.run([sys.executable, here, name], cwd=root)
        emit({"study": "B", "done": True})
