#!/usr/bin/env python
"""Headline benchmark: ViT-B APLA fine-tune training throughput, one chip.

Matches BASELINE.md's target metric (images/sec/chip for ViT-B, patch 14,
224px, APLA rank 128 supervised fine-tune — the NABirds/ImageNet apla.yml
recipe).  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N,
   "host_pipeline_img_s": N, "e2e_img_s": N, "hbm_*_gb": N}

- value: device-step throughput (fixed device-resident batch, the compute
  ceiling), timed with a VALUE FETCH barrier (block_until_ready is
  unreliable through the axon tunnel).
- e2e_img_s: end-to-end training throughput — real DataLoader (threaded
  host workers shipping uint8), per-step H2D transfer, device-side
  augmentation tail fused into the jitted step (the reference's hot loop
  includes aug workers + H2D, src/defaults/trainer.py:118-124).
- hbm_args_gb / hbm_temp_gb / hbm_total_gb: compile-time device memory
  accounting (the memory half of the reference's headline claim,
  README.md:14-16).

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
# The recipe batch (64) with accum_steps=8: per-image step cost RISES with
# batch on v5e (BASELINE.md round-2 sweep), so the b64 update is computed
# as a lax.scan over eight b8 microbatches with ONE optimizer update —
# numerically the same recipe update, measured 867.5 img/s vs 566.5 for
# the monolithic b64 step (accum sweep: 4 -> 822.5, 8 -> 867.5 peak,
# 16 -> 748.6).
BATCH = int(os.environ.get("BENCH_BATCH", 64))
ACCUM = int(os.environ.get("BENCH_ACCUM", 8))
# attention path: 'fused' (attention + APLA projection in one Pallas
# kernel) is the measured champion at the accum-8 recipe — 937.5 img/s vs
# 860.5 for XLA ('base') and 776 for 'flash' (BASELINE.md round-3 study)
KERNEL = os.environ.get("BENCH_KERNEL", "fused")
if KERNEL not in ("base", "flash", "fused"):
    raise SystemExit(f"BENCH_KERNEL must be base|flash|fused, got {KERNEL!r}")
STEPS = 40


def build_model():
    """The ONE benchmarked model: ViT-B/14 @224 APLA-128 with the TPU
    recipe knobs — shared by the train-step and infer benches so a recipe
    change cannot silently diverge the two rows."""
    from apla_tpu.apla.core import AplaConfig
    from apla_tpu.models.classifier import init_classifier
    from apla_tpu.models.vit import VIT_BUILDERS

    cfg = VIT_BUILDERS["vit_base"](
        img_size=224, patch_size=14, has_layerscale=True,
        layerscale_init=1.0, drop_path_rate=0.0,
        # tanh-approximate GELU (the flax/JAX-ecosystem default): the
        # exact-erf variant costs 15.4 ms of the 128.5 ms step on v5e
        # (BASELINE.md round-2 anatomy); exact is ViTConfig's default for
        # torch-import parity, the TPU recipe opts in here
        gelu_tanh=True,
        use_flash=(KERNEL == "flash"),
        use_fused_apla=(KERNEL == "fused"))
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg, n_classes=1000,
        apla_cfg=AplaConfig(partial_size=128))
    return cfg, trainable, frozen


def build(device_aug_cfg=None):
    from apla_tpu.train.losses import cross_entropy
    from apla_tpu.train.optim import build_optimizer
    from apla_tpu.train.steps import make_train_step
    from apla_tpu.train.train_state import TrainState

    cfg, trainable, frozen = build_model()
    tx = build_optimizer("AdamW", {"lr": 3e-5, "weight_decay": 1e-5},
                         trainable, grad_clip=1.0)
    state = TrainState.create(trainable, tx)
    step = make_train_step(cfg, tx, cross_entropy,
                           device_aug_cfg=device_aug_cfg,
                           accum_steps=ACCUM)
    return step, state, frozen


def bench_device_step():
    """Compute ceiling: one device-resident batch reused STEPS times."""
    step, state, frozen = build()
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.standard_normal((BATCH, 224, 224, 3)),
                             jnp.bfloat16),
        "label": jnp.asarray(rng.integers(0, 1000, BATCH), jnp.int32),
    }
    key = jax.random.PRNGKey(1)
    from apla_tpu.utils.profiling import compiled_memory_analysis
    mem = compiled_memory_analysis(step, state, frozen, batch, 3e-5, key)
    state, m = step(state, frozen, batch, 3e-5, key)  # compile + warmup
    _ = float(m["loss"])
    for _ in range(3):
        state, m = step(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])  # value fetch = the only reliable barrier here
    dt = time.perf_counter() - t0
    return BATCH * STEPS / dt, mem


def bench_infer():
    """Serving-side rate: forward-only eval step at the b64 sweet spot
    (BASELINE.md round-3d; the --test/--knn/export serving path)."""
    from apla_tpu.train.losses import cross_entropy
    from apla_tpu.train.steps import make_eval_step

    cfg, trainable, frozen = build_model()
    ev = make_eval_step(cfg, cross_entropy)
    rng = np.random.default_rng(0)
    b = 64
    batch = {"image": jnp.asarray(rng.standard_normal((b, 224, 224, 3)),
                                  jnp.bfloat16),
             "label": jnp.asarray(rng.integers(0, 1000, b), jnp.int32)}
    losses, _ = ev(trainable, frozen, batch)
    _ = float(losses[0])
    for _ in range(3):
        losses, _ = ev(trainable, frozen, batch)
    _ = float(losses[0])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        losses, _ = ev(trainable, frozen, batch)
    _ = float(losses[0])
    return b * STEPS / (time.perf_counter() - t0)


def bench_end_to_end():
    """Real input pipeline: DataLoader threads decode/ship uint8 256px
    images, H2D every step, device-side augmentation inside the step."""
    from apla_tpu.data.datasets import Synthetic
    from apla_tpu.data.device_augs import DeviceAugConfig
    from apla_tpu.data.loader import DataLoader

    aug = DeviceAugConfig(out_size=224, crop_scale=(0.8, 1.2), hflip_p=0.5,
                          jitter_p=0.8, brightness=0.2, contrast=0.2,
                          saturation=0.1)
    step, state, frozen = build(device_aug_cfg=aug)

    ds = Synthetic({"synthetic_size": 512, "synthetic_img_size": 256,
                    "synthetic_classes": 10,
                    "train_transforms": {}, "val_transforms": {},
                    "test_transforms": {}}, mode="train")
    ds.raw_mode = True
    ds.raw_size = 256
    loader = DataLoader(ds, batch_size=BATCH, shuffle=True, drop_last=True,
                        num_workers=8, prefetch_factor=4)

    key = jax.random.PRNGKey(1)

    def put(b):
        return {"image": jnp.asarray(b["image"]),  # uint8 ships 4x smaller
                "label": jnp.asarray(b["label"], jnp.int32)}

    # compile + tunnel warmup on one batch
    first = put(next(iter(loader)))
    state, m = step(state, frozen, first, 3e-5, key)
    _ = float(m["loss"])

    done = 0
    epoch = 0
    t0 = time.perf_counter()
    while done < STEPS:
        loader.set_epoch(epoch)
        for b in loader:
            state, m = step(state, frozen, put(b), 3e-5, key)
            done += 1
            if done >= STEPS:
                break
        epoch += 1
    _ = float(m["loss"])
    dt = time.perf_counter() - t0
    return BATCH * STEPS / dt


def bench_host_pipeline():
    """Host-side production rate alone (no device): proves whether the
    threaded loader can keep up with the device step.  Through the axon
    tunnel the e2e number is H2D-bound (~34 MiB/s tunnel bandwidth, an
    infra artifact — co-located TPU hosts feed via local DMA), so the
    host rate is the honest input-pipeline signal."""
    from apla_tpu.data.datasets import Synthetic
    from apla_tpu.data.loader import DataLoader

    ds = Synthetic({"synthetic_size": 512, "synthetic_img_size": 256,
                    "synthetic_classes": 10,
                    "train_transforms": {}, "val_transforms": {},
                    "test_transforms": {}}, mode="train")
    ds.raw_mode = True
    ds.raw_size = 256
    loader = DataLoader(ds, batch_size=BATCH, shuffle=True, drop_last=True,
                        num_workers=8, prefetch_factor=4)
    # warmup one epoch
    for _ in loader:
        pass
    done = 0
    epoch = 1
    t0 = time.perf_counter()
    while done < STEPS:
        loader.set_epoch(epoch)
        for b in loader:
            done += 1
            if done >= STEPS:
                break
        epoch += 1
    dt = time.perf_counter() - t0
    return BATCH * STEPS / dt


def _probe_backend(timeout_s: int) -> str | None:
    """Fail fast when the axon tunnel is wedged: backend init then hangs
    indefinitely in grpc (not interruptible in-process), so probe
    jax.devices() in a SUBPROCESS with a hard timeout before this process
    touches the backend.  Returns an error string, or None if healthy."""
    import subprocess
    import sys
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return (f"TPU backend init exceeded {timeout_s}s "
                "(axon tunnel wedged/unavailable)")
    if r.returncode:
        return "TPU backend init failed: " + r.stderr.strip()[-400:]
    return None


def main():
    # register as THE TPU client so concurrent pollers (r4_scaling --watch)
    # defer their backend probes instead of wedging this run
    from apla_tpu.utils.tpu_client_lock import tpu_client
    with tpu_client("bench"):
        _main()


def _main():
    err = _probe_backend(int(os.environ.get("BENCH_INIT_TIMEOUT", 300)))
    if err:
        print(json.dumps({
            "metric": "vit_b_apla128_finetune_throughput",
            "value": 0.0, "unit": "images/sec/chip", "vs_baseline": 0.0,
            "error": err,
            "note": "infra failure, not a perf regression — see "
                    "BENCH_r02/BASELINE.md for the last good numbers",
        }))
        raise SystemExit(1)

    from apla_tpu.models.vit import VIT_BUILDERS
    from apla_tpu.utils.flops import mfu, vit_train_step_flops
    from apla_tpu.utils.profiling import device_memory_stats

    device_ips, mem = bench_device_step()
    mem.update(device_memory_stats())  # runtime stats where exposed
    infer_ips = bench_infer()
    host_ips = bench_host_pipeline()
    e2e_ips = bench_end_to_end()

    # analytic model FLOPs (fwd + APLA-reduced bwd, matmuls only, no remat
    # recompute — the standard MFU convention) for the audit trail
    cfg = VIT_BUILDERS["vit_base"](img_size=224, patch_size=14)
    fl = vit_train_step_flops(cfg, n_classes=1000, batch=1, apla_k=128)

    rec = {
        "metric": "vit_b_apla128_finetune_throughput",
        "batch": BATCH,
        "accum_steps": ACCUM,
        "kernel": KERNEL,
        "value": round(device_ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(device_ips / A100_BASELINE_IPS, 2),
        "host_pipeline_img_s": round(host_ips, 1),
        "infer_img_s": round(infer_ips, 1),
        "e2e_img_s": round(e2e_ips, 1),
        "e2e_note": "e2e is tunnel-H2D-bound on axon (~34 MiB/s); "
                    "host pipeline rate is the input-side signal",
        "flops_per_image_g": round(fl["total_flops"] / 1e9, 1),
    }
    rec.update(mfu(device_ips, fl["total_flops"]))
    rec.update(mem)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
