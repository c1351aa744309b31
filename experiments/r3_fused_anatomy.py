#!/usr/bin/env python
"""Round-3: anatomy of the fused-kernel champion step (b64 accum-8,
938-950 img/s = ~68-74 ms).  With attention+projection inside the Pallas
kernel, what is the remaining time made of?  Each variant neutralises one
component by monkeypatching BEFORE the jit trace (one subprocess per
variant — the jaxpr-cache trap, ROUND_NOTES.md):

  base          the shipped champion step (reference point)
  ln_identity   layer_norm -> scale/bias-only passthrough (no stats):
                upper bound on what an LN-fused kernel could reclaim
  gelu_identity MLP activation -> identity: the gelu_tanh share
  head_only     trunk output detached from loss?  (not meaningful) — skip
  fwd_only      eval forward of the same geometry (serving-side floor)

Run detached:
  setsid nohup python experiments/r3_fused_anatomy.py > experiments/r3_fused_anatomy.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "r3_fused_anatomy.jsonl")


def emit(rec):
    rec["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def setup_jax():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    return jax


def _apply_ablation(ablation):
    import jax
    import jax.numpy as jnp

    from apla_tpu.models import vit as vit_mod

    if ablation == "ln_identity":
        def fake_ln(x, scale, bias, eps=1e-6):
            # affine only — keeps the op count of the epilogue, drops the
            # f32 mean/var/rsqrt chain and its backward
            return (x.astype(jnp.float32) * scale + bias).astype(x.dtype)
        vit_mod.layer_norm = fake_ln
    elif ablation == "gelu_identity":
        real_gelu = jax.nn.gelu
        jax.nn.gelu = lambda x, approximate=True: x
        return real_gelu
    elif ablation != "base":
        raise SystemExit(f"unknown ablation {ablation}")


def step(ablation, accum=8, batch=64):
    jax = setup_jax()
    import jax.numpy as jnp
    import numpy as np

    _apply_ablation(ablation)

    from apla_tpu.apla.core import AplaConfig
    from apla_tpu.models.classifier import init_classifier
    from apla_tpu.models.vit import VIT_BUILDERS
    from apla_tpu.train.losses import cross_entropy
    from apla_tpu.train.optim import build_optimizer
    from apla_tpu.train.steps import make_train_step
    from apla_tpu.train.train_state import TrainState

    cfg = VIT_BUILDERS["vit_base"](
        img_size=224, patch_size=14, has_layerscale=True,
        layerscale_init=1.0, drop_path_rate=0.0, gelu_tanh=True,
        use_fused_apla=True)
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg, n_classes=1000,
        apla_cfg=AplaConfig(partial_size=128))
    tx = build_optimizer("AdamW", {"lr": 3e-5, "weight_decay": 1e-5},
                         trainable, grad_clip=1.0)
    state = TrainState.create(trainable, tx)
    stepf = make_train_step(cfg, tx, cross_entropy, accum_steps=accum)

    rng = np.random.default_rng(0)
    batch_d = {"image": jnp.asarray(
        rng.standard_normal((batch, 224, 224, 3)), jnp.bfloat16),
        "label": jnp.asarray(rng.integers(0, 1000, batch), jnp.int32)}
    key = jax.random.PRNGKey(1)
    state, m = stepf(state, frozen, batch_d, 3e-5, key)
    _ = float(m["loss"])
    for _ in range(3):
        state, m = stepf(state, frozen, batch_d, 3e-5, key)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        state, m = stepf(state, frozen, batch_d, 3e-5, key)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / reps
    emit({"study": "fused_anatomy", "ablation": ablation, "batch": batch,
          "accum": accum, "ms_step": round(dt * 1e3, 1),
          "img_s": round(batch / dt, 1)})


VARIANTS = {
    "base": lambda: step("base"),
    "ln_identity": lambda: step("ln_identity"),
    "gelu_identity": lambda: step("gelu_identity"),
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
