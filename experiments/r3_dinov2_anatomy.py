#!/usr/bin/env python
"""Round-3 study F: DINOv2 recipe step anatomy via REAL config knobs (no
monkeypatching; one subprocess per variant).  Ablations: KoLeo off, iBOT
off (masked rows now gated out of the shared head), local crops off (via
a custom strategy file — exercises the strategy-geometry path), 4096-proto
heads, Sinkhorn centering.  Baseline = b8 recipe at 142 img/s.

  python experiments/r3_dinov2_anatomy.py        # all
  python experiments/r3_dinov2_anatomy.py base   # one
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "r3_dinov2_anatomy.jsonl")
STEPS = 15
BATCH = 8

VARIANTS = ("base", "no_koleo", "no_ibot", "no_local", "head4096",
            "sinkhorn", "head_bf16")


def emit(rec):
    rec["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _no_local_strategy_file():
    g = {"RandomResizedCrop": {"apply": True, "size": 224,
                               "scale": [0.32, 1.0]},
         "HorizontalFlip": {"apply": True, "p": 0.5}}
    strategy = {
        "general_args": {"overwrite_defaults": True,
                         "inherit": ["Resize", "Normalize"]},
        "repetition_strategy": {"n_augmentations": [1, 1],
                                "order": ["global_1", "global_2"]},
        "transforms": {"train_transforms": {"global_1": g, "global_2": g}},
    }
    path = os.path.join(tempfile.mkdtemp(prefix="anat_"), "strategy.json")
    with open(path, "w") as f:
        json.dump(strategy, f)
    return path


def bench(name):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from apla_tpu.ssl.dinov2 import Dinov2Trainer, DINOv2Wrapper
    from apla_tpu.utils.config import load_merged_params

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
    params.dataset_params.synthetic_size = 4 * BATCH
    params.dataset_params.synthetic_img_size = 256
    for head in ("dino", "ibot"):
        params.model_params.dinov2[head].head_n_prototypes = 65536
        params.model_params.dinov2[head].head_bottleneck_dim = 256
        params.model_params.dinov2[head].head_hidden_dim = 2048
    params.training_params.is_dry = True
    for ld in ("trainloader", "valloader", "testloader"):
        params.dataloader_params[ld].batch_size = BATCH

    if name == "no_koleo":
        params.model_params.dinov2.dino.koleo_loss_weight = 0.0
    elif name == "no_ibot":
        params.model_params.dinov2.ibot.loss_weight = 0.0
    elif name == "no_local":
        params.dataset_params.augmentation_strategy_path = \
            _no_local_strategy_file()
    elif name == "head4096":
        for head in ("dino", "ibot"):
            params.model_params.dinov2[head].head_n_prototypes = 4096
    elif name == "sinkhorn":
        params.model_params.dinov2.centering = "sinkhorn_knopp"
    elif name == "head_bf16":
        params.model_params.dinov2.head_matmul_bf16 = True

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
    emit({"study": "F", "variant": name, "batch": BATCH,
          "ms_per_step": round(dt * 1e3, 1),
          "img_s": round(BATCH / dt, 1)})


if __name__ == "__main__":
    if len(sys.argv) > 1:
        try:
            bench(sys.argv[1])
        except Exception as e:  # noqa: BLE001
            emit({"study": "F", "variant": sys.argv[1],
                  "error": repr(e)[:300]})
    else:
        emit({"study": "F", "subprocess_per_variant": True})
        here = os.path.abspath(__file__)
        root = os.path.dirname(os.path.dirname(here))
        for name in VARIANTS:
            subprocess.run([sys.executable, here, name], cwd=root)
        emit({"study": "F", "done": True})
