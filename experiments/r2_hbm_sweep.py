#!/usr/bin/env python
"""Peak-HBM vs APLA rank (the memory half of the reference's headline claim,
README.md:14-16 / figs/fig_1_mem.png): run each configuration in its OWN
process (device peak_bytes_in_use is a lifetime high-water mark) and record
peak HBM + step time.

  python experiments/r2_hbm_sweep.py            # runs all configs serially
  python experiments/r2_hbm_sweep.py <config>   # one config (subprocess)

Appends JSON lines to experiments/r2_hbm_sweep.jsonl.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "r2_hbm_sweep.jsonl")
CONFIGS = ["apla8", "apla128", "apla_full", "full_ft"]
BATCH = 64
STEPS = 10


def run_one(name):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    import numpy as np

    from apla_tpu.apla.core import AplaConfig
    from apla_tpu.models.classifier import init_classifier
    from apla_tpu.models.vit import VIT_BUILDERS
    from apla_tpu.train.losses import cross_entropy
    from apla_tpu.train.optim import build_optimizer
    from apla_tpu.train.steps import make_train_step
    from apla_tpu.train.train_state import TrainState
    from apla_tpu.utils.profiling import device_memory_stats

    apla_cfg = {"apla8": AplaConfig(partial_size=8),
                "apla128": AplaConfig(partial_size=128),
                "apla_full": AplaConfig(partial_size="full"),
                "full_ft": None}[name]
    cfg = VIT_BUILDERS["vit_base"](
        img_size=224, patch_size=14, has_layerscale=True,
        layerscale_init=1.0, drop_path_rate=0.0, gelu_tanh=True)
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg, n_classes=1000, apla_cfg=apla_cfg)
    tx = build_optimizer("AdamW", {"lr": 3e-5, "weight_decay": 1e-5},
                         trainable, grad_clip=1.0)
    state = TrainState.create(trainable, tx)
    step = make_train_step(cfg, tx, cross_entropy)

    from apla_tpu.apla.core import count_params
    n_train = count_params(trainable)

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.standard_normal((BATCH, 224, 224, 3)),
                             jnp.bfloat16),
        "label": jnp.asarray(rng.integers(0, 1000, BATCH), jnp.int32),
    }
    key = jax.random.PRNGKey(1)
    from apla_tpu.utils.profiling import compiled_memory_analysis
    mem_analysis = compiled_memory_analysis(step, state, frozen, batch,
                                            3e-5, key)
    state, m = step(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    for _ in range(3):
        state, m = step(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / STEPS

    rec = {"config": name, "trainable_params": int(n_train),
           "ms_per_step": round(dt * 1e3, 1),
           "img_s": round(BATCH / dt, 1)}
    rec.update(mem_analysis)
    rec.update(device_memory_stats())
    rec["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    if len(sys.argv) > 1:
        run_one(sys.argv[1])
        return
    for name in CONFIGS:
        # fresh process per config: clean peak_bytes_in_use AND one TPU
        # client at a time
        r = subprocess.run([sys.executable, os.path.abspath(__file__), name],
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))))
        if r.returncode != 0:
            with open(OUT, "a") as f:
                f.write(json.dumps({"config": name,
                                    "error": f"rc={r.returncode}"}) + "\n")


if __name__ == "__main__":
    main()
