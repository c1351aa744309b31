#!/usr/bin/env python
"""Multi-chip scaling readiness pack (VERDICT r3 item 6).

Pre-written so a real >1-chip TPU slice is spent MEASURING, not writing
scripts.  Auto-detects the device count and runs every row that fits:

  dp_vitb        DP throughput at 1/2/4/8 chips (the recipe step: ViT-B/14
                 @224 APLA-128, accum-8 micro-scan, fused kernel on TPU)
  fsdp_vitg518   ViT-giant @518 with ZeRO-3 frozen sharding: per-chip HBM
                 from compile-time memory_analysis + step time
  pp_vitb        ViT-B as dp(D/4) x pp4 collective pipeline, micro=8
  dinov2_vitb    the DINOv2 multi-crop SSL step (2x224 + 8x98) on the
                 full mesh through the real wrapper

One SUBPROCESS per row (jaxpr-cache + compile isolation — CLAUDE.md
methodology trap), value-fetch barriers, JSONL rows appended to
experiments/r4_scaling.jsonl.

  python experiments/r4_scaling.py              # run all rows that fit
  python experiments/r4_scaling.py --watch      # poll until >1 chip
                                                # appears, then run
  python experiments/r4_scaling.py --row dp_vitb --chips 2   # one row

Virtual-mesh note: with no multi-chip hardware this script still runs on
the 8-device CPU mesh (APLA_SCALING_CPU=1) to validate the harness — the
timings are then CPU artifacts, flagged in the row (`platform: cpu`).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
OUT = os.path.join(HERE, "r4_scaling.jsonl")
STEPS = 3 if os.environ.get("APLA_SCALING_TOY") == "1" else 20
TOY = os.environ.get("APLA_SCALING_TOY") == "1"


def _vit_recipe(builders, name, **kw):
    """Recipe geometry — or a tiny stand-in for CPU harness validation
    (APLA_SCALING_TOY=1: same code paths, toy shapes)."""
    if TOY:
        return builders["vit_tiny"](img_size=32, patch_size=8,
                                    has_layerscale=True,
                                    layerscale_init=1.0, gelu_tanh=True)
    return builders[name](**kw)


def emit(rec):
    rec["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


# ------------------------------------------------------------------ #
# in-subprocess row implementations
# ------------------------------------------------------------------ #

def _init_jax():
    import jax
    if os.environ.get("APLA_SCALING_CPU") == "1":
        os.environ.setdefault("XLA_FLAGS", "")
        if "--xla_force_host_platform_device_count" not in \
                os.environ["XLA_FLAGS"]:
            os.environ["XLA_FLAGS"] += \
                " --xla_force_host_platform_device_count=8"
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    return jax


def row_dp_vitb(chips: int):
    """The official bench recipe, data-parallel over `chips`: per-chip
    batch 64 as an accum-8 micro-scan; reports per-chip and total img/s."""
    jax = _init_jax()
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, REPO)
    from apla_tpu.apla.core import AplaConfig
    from apla_tpu.models.classifier import init_classifier
    from apla_tpu.models.vit import VIT_BUILDERS
    from apla_tpu.parallel.mesh import make_mesh, replicated_sharding
    from apla_tpu.train.losses import cross_entropy
    from apla_tpu.train.optim import build_optimizer
    from apla_tpu.train.steps import make_train_step
    from apla_tpu.train.train_state import TrainState

    on_tpu = jax.devices()[0].platform == "tpu"
    cfg = _vit_recipe(VIT_BUILDERS, "vit_base",
                      img_size=224, patch_size=14, has_layerscale=True,
                      layerscale_init=1.0, gelu_tanh=True,
                      use_fused_apla=on_tpu)
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg, n_classes=1000,
        apla_cfg=AplaConfig(partial_size=128))
    mesh = make_mesh(n_data=chips, devices=jax.devices()[:chips])
    from apla_tpu.parallel.mesh import shard_params
    tx = build_optimizer("AdamW", {"lr": 3e-5, "weight_decay": 1e-5},
                         trainable, grad_clip=1.0)
    state = jax.device_put(TrainState.create(trainable, tx),
                           replicated_sharding(mesh))
    frozen = shard_params(frozen, mesh, policy="replicated")
    step = make_train_step(cfg, tx, cross_entropy, accum_steps=8)

    img = cfg.img_size
    gbatch = (8 if TOY else 64) * chips
    rng = np.random.default_rng(0)
    batch = {
        "image": jax.device_put(
            jnp.asarray(rng.standard_normal((gbatch, img, img, 3)),
                        jnp.bfloat16), NamedSharding(mesh, P("data"))),
        "label": jax.device_put(
            jnp.asarray(rng.integers(0, 1000, gbatch), jnp.int32),
            NamedSharding(mesh, P("data"))),
    }
    key = jax.random.PRNGKey(1)
    state, m = step(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    for _ in range(3):
        state, m = step(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    dt = time.perf_counter() - t0
    total = gbatch * STEPS / dt
    return {"row": "dp_vitb", "chips": chips, "global_batch": gbatch,
            "img_s_total": round(total, 1),
            "img_s_per_chip": round(total / chips, 1),
            "platform": jax.devices()[0].platform}


def row_fsdp_vitg518(chips: int):
    """ViT-giant @518 fit probe: ZeRO-3 frozen placement over the data
    axis; compile-time per-chip HBM + step time at per-chip batch 1,
    accum over the global batch."""
    jax = _init_jax()
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, REPO)
    from apla_tpu.apla.core import AplaConfig
    from apla_tpu.models.classifier import init_classifier
    from apla_tpu.models.vit import VIT_BUILDERS
    from apla_tpu.parallel.mesh import (make_mesh, replicated_sharding,
                                        shard_params)
    from apla_tpu.train.losses import cross_entropy
    from apla_tpu.train.optim import build_optimizer
    from apla_tpu.train.steps import make_train_step
    from apla_tpu.train.train_state import TrainState
    from apla_tpu.utils.profiling import compiled_memory_analysis

    cfg = _vit_recipe(VIT_BUILDERS, "vit_giant",
                      img_size=518, patch_size=14, has_layerscale=True,
                      layerscale_init=1.0, gelu_tanh=True)
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg, n_classes=1000,
        apla_cfg=AplaConfig(partial_size=128))
    mesh = make_mesh(n_data=chips, devices=jax.devices()[:chips])
    tx = build_optimizer("AdamW", {"lr": 3e-5}, trainable, grad_clip=1.0)
    state = jax.device_put(TrainState.create(trainable, tx),
                           replicated_sharding(mesh))
    frozen = shard_params(frozen, mesh, policy="fsdp")
    step = make_train_step(cfg, tx, cross_entropy, accum_steps=chips)

    img = cfg.img_size
    gbatch = chips  # per-chip micro batch 1 via accum
    rng = np.random.default_rng(0)
    batch = {
        "image": jax.device_put(
            jnp.asarray(rng.standard_normal((gbatch, img, img, 3)),
                        jnp.bfloat16), NamedSharding(mesh, P("data"))),
        "label": jax.device_put(
            jnp.asarray(rng.integers(0, 1000, gbatch), jnp.int32),
            NamedSharding(mesh, P("data"))),
    }
    key = jax.random.PRNGKey(1)
    mem = compiled_memory_analysis(step, state, frozen, batch, 3e-5, key)
    state, m = step(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(5):
        state, m = step(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    dt = time.perf_counter() - t0
    return {"row": "fsdp_vitg518", "chips": chips, "global_batch": gbatch,
            "img_s_total": round(gbatch * 5 / dt, 2),
            "hbm_per_chip_gb": mem,
            "platform": jax.devices()[0].platform}


def row_pp_vitb(chips: int):
    """ViT-B as a dp(chips/4) x pp4 collective pipeline, micro=8."""
    jax = _init_jax()
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, REPO)
    from apla_tpu.apla.core import AplaConfig
    from apla_tpu.models.classifier import init_classifier
    from apla_tpu.models.vit import VIT_BUILDERS
    from apla_tpu.parallel.mesh import make_mesh, shard_params
    from apla_tpu.parallel.pipeline import PipelineSpec
    from apla_tpu.train.losses import cross_entropy
    from apla_tpu.train.optim import build_optimizer
    from apla_tpu.train.steps import make_train_step
    from apla_tpu.train.train_state import TrainState

    n_pp = 4
    n_dp = chips // n_pp
    cfg = _vit_recipe(VIT_BUILDERS, "vit_base",
                      img_size=224, patch_size=14, has_layerscale=True,
                      layerscale_init=1.0, gelu_tanh=True)
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg, n_classes=1000,
        apla_cfg=AplaConfig(partial_size=128))
    mesh = make_mesh(n_data=n_dp, n_model=n_pp,
                     devices=jax.devices()[:chips])
    tx = build_optimizer("AdamW", {"lr": 3e-5}, trainable, grad_clip=1.0)
    trainable = shard_params(trainable, mesh, policy="pp")
    frozen = shard_params(frozen, mesh, policy="pp")
    state = TrainState.create(trainable, tx)
    spec = PipelineSpec(mesh, n_stages=n_pp, n_micro=8)
    step = make_train_step(cfg, tx, cross_entropy, pipeline=spec)

    img = cfg.img_size
    gbatch = (8 if TOY else 32) * n_dp
    rng = np.random.default_rng(0)
    batch = {
        "image": jax.device_put(
            jnp.asarray(rng.standard_normal((gbatch, img, img, 3)),
                        jnp.bfloat16), NamedSharding(mesh, P("data"))),
        "label": jax.device_put(
            jnp.asarray(rng.integers(0, 1000, gbatch), jnp.int32),
            NamedSharding(mesh, P("data"))),
    }
    key = jax.random.PRNGKey(1)
    state, m = step(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    dt = time.perf_counter() - t0
    return {"row": "pp_vitb", "chips": chips, "layout": f"dp{n_dp}xpp4",
            "global_batch": gbatch,
            "img_s_total": round(gbatch * STEPS / dt, 1),
            "platform": jax.devices()[0].platform}


def row_dinov2_vitb(chips: int):
    """The DINOv2 multi-crop SSL step through the real wrapper on the
    full mesh (per-chip batch 8 — the round-3 throughput recipe)."""
    jax = _init_jax()
    sys.path.insert(0, REPO)
    import numpy as np

    from apla_tpu.ssl.dinov2 import DINOv2Wrapper
    from apla_tpu.utils.config import load_merged_params

    params = load_merged_params(os.path.join(
        REPO, "params", "synthetic", "vit_tiny", "dinov2.yml"))
    if not TOY:
        params.model_params.backbone_type = "vit_base"
        params.model_params.transformers_params.img_size = [224]
        params.model_params.transformers_params.patch_size = 14
        params.dataset_params.synthetic_img_size = 256
        params.dataset_params.ssl_global_size = 224
        params.dataset_params.ssl_local_size = 98
    else:
        params.dataset_params.ssl_global_size = 32
        params.dataset_params.ssl_local_size = 16
    params.dataset_params.synthetic_size = 64
    gbatch = 8 * chips
    for split in ("trainloader", "valloader", "testloader"):
        params.dataloader_params[split].batch_size = gbatch
    params.system_params.n_devices = chips
    params.training_params.use_mixed_precision = True
    wrapper = DINOv2Wrapper(params)
    wrapper.instantiate()

    from apla_tpu.ssl.dinov2 import Dinov2Trainer
    trainer = Dinov2Trainer(wrapper)
    loader = wrapper.dataloaders.trainloader
    batch = next(iter(loader))
    dbatch = trainer._device_batch(batch)      # one device-resident batch
    step_fn = trainer._get_step(False)
    lr = wrapper.lr_schedule[0]
    wd = wrapper.wd_schedule[0]
    mom = wrapper.momentum_schedule_tbl[0]
    t_temp = wrapper.teacher_temp_schedule[0]
    state = trainer.state
    t0 = time.perf_counter()
    state, m = step_fn(state, trainer.frozen, dbatch, lr, wd, mom, t_temp,
                       trainer.rng)
    loss = float(m["loss"])                    # value-fetch barrier
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step_fn(state, trainer.frozen, dbatch, lr, wd, mom,
                           t_temp, trainer.rng)
    loss = float(m["loss"])
    dt = time.perf_counter() - t0
    return {"row": "dinov2_vitb", "chips": chips, "global_batch": gbatch,
            "img_s_total": round(gbatch * STEPS / dt, 1),
            "warmup_s": round(warm, 1), "loss": round(loss, 4),
            "platform": jax.devices()[0].platform}


ROWS = {
    "dp_vitb": (row_dp_vitb, (1, 2, 4, 8)),
    "fsdp_vitg518": (row_fsdp_vitg518, (2, 4, 8)),
    "pp_vitb": (row_pp_vitb, (8,)),
    "dinov2_vitb": (row_dinov2_vitb, (2, 4, 8)),
}


# ------------------------------------------------------------------ #
# driver: one subprocess per row
# ------------------------------------------------------------------ #

def _device_count():
    """Probe the backend's device count in a subprocess.  NOTE: the probe
    IS a TPU client (one client at a time through the axon tunnel) — the
    watch loop must not fire it while another registered client runs, or
    it wedges that job (CLAUDE.md).  Callers gate on tpu_client_busy()."""
    code = ("import jax,sys\n"
            "sys.stdout.write(str(len(jax.devices())))")
    env = dict(os.environ)
    try:
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=300)
        return int(out.stdout.strip().splitlines()[-1])
    except Exception:
        return 0


def run_row(name, chips):
    from apla_tpu.utils.tpu_client_lock import tpu_client
    code = (f"import sys; sys.path.insert(0, {HERE!r})\n"
            f"from r4_scaling import {ROWS[name][0].__name__}, emit\n"
            f"emit({ROWS[name][0].__name__}({chips}))\n")
    with tpu_client(f"r4_scaling:{name}x{chips}"):
        r = subprocess.run([sys.executable, "-c", code],
                           env=dict(os.environ), timeout=3600)
    if r.returncode != 0:
        emit({"row": name, "chips": chips, "error": f"rc={r.returncode}"})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--row", choices=sorted(ROWS))
    ap.add_argument("--chips", type=int)
    ap.add_argument("--watch", action="store_true",
                    help="poll every 5 min until >1 device appears, then "
                         "run the full pack")
    args = ap.parse_args()

    if args.watch:
        from apla_tpu.utils.tpu_client_lock import tpu_client_busy
        while True:
            holder = tpu_client_busy()
            if holder:
                print(f"[watch] TPU busy ({holder}) — deferring probe")
                time.sleep(300)
                continue
            n = _device_count()
            print(f"[watch] devices: {n}")
            if n > 1:
                break
            time.sleep(300)

    n = _device_count()
    emit({"row": "meta", "devices_detected": n})
    if args.row:
        run_row(args.row, args.chips or n)
        return
    for name, (fn, sizes) in ROWS.items():
        for chips in sizes:
            if chips <= n:
                run_row(name, chips)


if __name__ == "__main__":
    main()
