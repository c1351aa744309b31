#!/usr/bin/env python
"""Round-5: close the supervised input path (VERDICT r4 item 4).

Host-side rows (CPU-pinned subprocesses, no TPU client):
  host_raw_nw{N}      raw-mode loader (uint8 256px ship) worker sweep —
                      root-causes the r4 bench's 4594 -> 1195 img/s drop
                      (hypothesis: host contention + thread count, not a
                      loader regression — the only loader change since r2
                      was error propagation)
  host_fullaug_nw{N}  the REAL supervised recipe pipeline (Resize 256 +
                      HFlip + ColorJitter p0.8 + RandomResizedCrop 224 +
                      Normalize, the NABirds train_transforms) at b64

Device rows (TPU, one client at a time):
  dev_plain_step      f32 224 batch resident, the 949-img/s baseline step
  dev_aug_step        uint8 256 batch resident, device-augment tail
                      (RRC+flip+jitter inside the jitted step) — the
                      `dataset_params.device_augment: true` supervised path

Decision input: if host_fullaug < dev step rate, the shipped supervised
recipe is host-bound on co-located hardware and should default to
device_augment.  Output: experiments/r5_input_path.jsonl

  setsid nohup python experiments/r5_input_path.py > experiments/r5_input_path.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "r5_input_path.jsonl")
BATCH = 64
STEPS = 40

HOST_VARIANTS = tuple(f"host_raw_nw{n}" for n in (1, 4, 8, 16)) + \
    tuple(f"host_fullaug_nw{n}" for n in (4, 8, 16))
DEV_VARIANTS = ("dev_plain_step", "dev_aug_step")
VARIANTS = HOST_VARIANTS + DEV_VARIANTS

FULLAUG_TRANSFORMS = {
    "Resize": {"apply": True, "height": 256, "width": 256},
    "HorizontalFlip": {"apply": True, "p": 0.5},
    "ColorJitter": {"apply": True, "brightness": 0.2, "contrast": 0.2,
                    "saturation": 0.1, "hue": 0.1, "p": 0.8},
    "RandomResizedCrop": {"apply": True, "size": 224, "scale": [0.8, 1.2]},
    "Normalize": True,
}


def emit(rec):
    rec["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _loader(raw, nw):
    from apla_tpu.data.datasets import Synthetic
    from apla_tpu.data.loader import DataLoader
    tf = {} if raw else FULLAUG_TRANSFORMS
    ds = Synthetic({"synthetic_size": 512, "synthetic_img_size": 256,
                    "synthetic_classes": 10,
                    "train_transforms": tf, "val_transforms": {},
                    "test_transforms": {}}, mode="train")
    if raw:
        ds.raw_mode = True
        ds.raw_size = 256
    return DataLoader(ds, batch_size=BATCH, shuffle=True, drop_last=True,
                      num_workers=nw, prefetch_factor=4)


def host_variant(name):
    import jax
    jax.config.update("jax_platforms", "cpu")  # never touch the TPU tunnel
    raw = "raw" in name
    nw = int(name.rsplit("nw", 1)[1])
    loader = _loader(raw, nw)
    for _ in loader:  # warm epoch (thread pool + transform JIT-less warm)
        pass
    done, epoch = 0, 1
    t0 = time.perf_counter()
    while done < STEPS:
        loader.set_epoch(epoch)
        for _b in loader:
            done += 1
            if done >= STEPS:
                break
        epoch += 1
    dt = time.perf_counter() - t0
    emit({"study": "r5_input", "variant": name, "batch": BATCH,
          "workers": nw, "img_s": round(BATCH * STEPS / dt, 1)})


def dev_variant(name):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    aug = None
    if name == "dev_aug_step":
        from apla_tpu.data.device_augs import DeviceAugConfig
        aug = DeviceAugConfig(out_size=224, crop_scale=(0.8, 1.2),
                              hflip_p=0.5, jitter_p=0.8, brightness=0.2,
                              contrast=0.2, saturation=0.1)
    step, state, frozen = bench.build(device_aug_cfg=aug)
    rng = np.random.default_rng(0)
    if aug is None:
        batch = {"image": jnp.asarray(
            rng.standard_normal((BATCH, 224, 224, 3)), jnp.bfloat16),
            "label": jnp.asarray(rng.integers(0, 10, BATCH), jnp.int32)}
    else:
        batch = {"image": jnp.asarray(
            rng.integers(0, 255, (BATCH, 256, 256, 3)), jnp.uint8),
            "label": jnp.asarray(rng.integers(0, 10, BATCH), jnp.int32)}
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    state, m = step(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    compile_s = round(time.time() - t0, 1)
    for _ in range(2):
        state, m = step(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / STEPS
    emit({"study": "r5_input", "variant": name, "batch": BATCH,
          "compile_s": compile_s, "ms_step": round(dt * 1e3, 2),
          "img_s": round(BATCH / dt, 1)})


if __name__ == "__main__":
    if len(sys.argv) > 1:
        name = sys.argv[1]
        try:
            (host_variant if name.startswith("host") else dev_variant)(name)
        except Exception as e:  # noqa: BLE001
            emit({"study": "r5_input", "variant": name,
                  "error": repr(e)[:400]})
    else:
        emit({"study": "r5_input", "subprocess_per_variant": True})
        here = os.path.abspath(__file__)
        root = os.path.dirname(os.path.dirname(here))
        for name in HOST_VARIANTS:
            subprocess.run([sys.executable, here, name], cwd=root)
        from apla_tpu.utils.tpu_client_lock import tpu_client
        with tpu_client("r5_input_path"):
            for name in DEV_VARIANTS:
                subprocess.run([sys.executable, here, name], cwd=root)
        emit({"study": "r5_input", "done": True})
