#!/usr/bin/env python
"""Round-3e: can the fused APLA-attention kernel take ViT-giant?

The default VMEM budget (12 MB) auto-excludes ViT-g: its bwd working-set
model is ~13.4 MB, dominated by the [1536,1536] projection weight
(4.7 MB bf16).  The physical core has 16 MB; APLA_FUSED_VMEM_MB lets the
hardware arbitrate whether Mosaic accepts the tighter fit.  Baseline on
record: ViT-g/14 @224 b32a4 = 75.7 img/s XLA (r3_scaling2.jsonl).

  python experiments/r3_vitg_fused.py             # all (subprocess each)
  python experiments/r3_vitg_fused.py <variant>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "r3_vitg_fused.jsonl")


def emit(rec):
    rec["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def run(fused: bool, vmem_mb: float | None, accum: int = 4):
    if vmem_mb:
        # _vmem_budget() reads the env at gate time, so setting it here
        # (before any tracing) is sufficient
        os.environ["APLA_FUSED_VMEM_MB"] = str(vmem_mb)
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    import numpy as np

    from apla_tpu.apla.core import AplaConfig
    from apla_tpu.models.classifier import init_classifier
    from apla_tpu.models.vit import VIT_BUILDERS
    from apla_tpu.ops import pallas_apla_attn as fk
    from apla_tpu.train.losses import cross_entropy
    from apla_tpu.train.optim import build_optimizer
    from apla_tpu.train.steps import make_train_step
    from apla_tpu.train.train_state import TrainState

    cfg = VIT_BUILDERS["vit_giant"](
        img_size=224, patch_size=14, has_layerscale=True,
        layerscale_init=1.0, gelu_tanh=True, use_fused_apla=fused)
    if fused:
        assert fk.fused_fits(cfg.num_patches + 1, cfg.embed_dim), \
            "giant still gated off — raise APLA_FUSED_VMEM_MB"
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg, n_classes=1000,
        apla_cfg=AplaConfig(partial_size=128))
    tx = build_optimizer("AdamW", {"lr": 3e-5, "weight_decay": 1e-5},
                         trainable, grad_clip=1.0)
    state = TrainState.create(trainable, tx)
    stepf = make_train_step(cfg, tx, cross_entropy, accum_steps=accum)
    rng = np.random.default_rng(0)
    batch = {"image": jnp.asarray(rng.standard_normal((32, 224, 224, 3)),
                                  jnp.bfloat16),
             "label": jnp.asarray(rng.integers(0, 1000, 32), jnp.int32)}
    key = jax.random.PRNGKey(1)
    state, m = stepf(state, frozen, batch, 3e-5, key)
    loss0 = float(m["loss"])
    for _ in range(2):
        state, m = stepf(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        state, m = stepf(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / 10
    emit({"study": "vitg_fused", "model": "vit_giant", "fused": fused,
          "vmem_mb": vmem_mb, "batch": 32, "accum": accum,
          "loss0": round(loss0, 4),
          "ms_step": round(dt * 1e3, 1), "img_s": round(32 / dt, 1)})


VARIANTS = {
    "xla": lambda: run(False, None),
    "xla_a8": lambda: run(False, None, accum=8),
    "fused15": lambda: run(True, 15.0),
    "fused14": lambda: run(True, 14.0),
    # micro-b4: halves the qkv operand XLA stages in scoped VMEM next to
    # the kernel (the fused15 compile failure)
    "fused15a8": lambda: run(True, 15.0, accum=8),
}


def main():
    if len(sys.argv) > 1:
        VARIANTS[sys.argv[1]]()
        return
    for name in ("xla", "fused15"):
        print(f"--- {name} ---", flush=True)
        r = subprocess.run([sys.executable, os.path.abspath(__file__), name],
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))))
        if r.returncode != 0:
            emit({"study": "vitg_fused", "variant": name,
                  "error": f"subprocess rc={r.returncode}"})


if __name__ == "__main__":
    main()
