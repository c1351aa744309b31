#!/usr/bin/env python
"""Round-3: DINOv2 local-crop PACKING on the real recipe step (VERDICT r2
item 4).  The 8x98px local crops (50 tokens each) underfill the 128-lane
MXU; `pack_local_crops` runs them as ONE [B, 400] block-diagonal sequence
per image (segment-masked attention) — the xformers BlockDiagonalMask
analogue.  Measures the b8/b16 recipe step packed vs unpacked, plus packed
with device-side multi-crop.

One subprocess per variant (jaxpr-cache trap).  Run detached:
  setsid nohup python experiments/r3_pack_dinov2.py > experiments/r3_pack_dinov2.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "r3_pack_dinov2.jsonl")
STEPS = 15


def emit(rec):
    rec["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def bench(batch_size, packed, device_aug=False, fused=False):
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
    sp.pack_local_crops = bool(packed)
    if fused:
        sp.use_fused_apla = True
    params.model_params.adaptation.params.partial_size = 128
    params.dataset_params.ssl_global_size = 224
    params.dataset_params.ssl_local_size = 98
    params.dataset_params.synthetic_size = 4 * batch_size
    params.dataset_params.synthetic_img_size = 256
    if device_aug:
        params.dataset_params.device_augment = True
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
    loader.set_epoch(0)
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
    loss = float(m["loss"])
    dt = (time.perf_counter() - t0) / STEPS

    from apla_tpu.ops.pallas_apla_attn import fused_min_n
    emit({"study": "pack_dinov2", "batch": batch_size,
          "packed": bool(packed), "device_aug": bool(device_aug),
          "fused": bool(fused), "fused_min_n": fused_min_n(),
          "ms_per_step": round(dt * 1e3, 1),
          "img_s": round(batch_size / dt, 1), "loss": round(loss, 4)})


VARIANTS = {
    "b8_unpacked": lambda: bench(8, False),
    "b8_packed": lambda: bench(8, True),
    "b16_unpacked": lambda: bench(16, False),
    "b16_packed": lambda: bench(16, True),
    "b8_packed_devaug": lambda: bench(8, True, device_aug=True),
    # attention+APLA-proj fused kernel for every crop forward (global
    # N=257 and packed local N=400 both fit the fused VMEM budget)
    "b8_packed_fused": lambda: bench(8, True, fused=True),
    "b8_unpacked_fused": lambda: bench(8, False, fused=True),
    "b16_unpacked_fused": lambda: bench(16, False, fused=True),
    # device-side multi-crop + gated fused kernel (the e2e recipe combo)
    "b8_devaug_fused": lambda: bench(8, False, device_aug=True, fused=True),
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
