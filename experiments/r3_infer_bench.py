#!/usr/bin/env python
"""Round-3: inference/serving throughput (forward-only eval step).

The train-side bench (bench.py) covers the fine-tune recipe; this measures
the SERVING side of the reference's --test/--knn paths (the eval loop,
`src/defaults/trainer.py:162-245`): ViT-B/14 @224 logits throughput and
batch-1 latency, XLA attention vs the fused APLA-attention kernel
(forward-only regime: fwd BB rules only, no scoped-VMEM bwd staging).

One subprocess per variant (jaxpr-cache trap).  Run detached:
  setsid nohup python experiments/r3_infer_bench.py > experiments/r3_infer_bench.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "r3_infer_bench.jsonl")
STEPS = 40


def emit(rec):
    rec["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def bench(arch, batch, kernel):
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
    from apla_tpu.train.steps import make_eval_step

    cfg = VIT_BUILDERS[arch](
        img_size=224, patch_size=14, has_layerscale=True,
        layerscale_init=1.0, drop_path_rate=0.0, gelu_tanh=True,
        use_flash=(kernel == "flash"),
        use_fused_apla=(kernel == "fused"))
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg, n_classes=1000,
        apla_cfg=AplaConfig(partial_size=128))
    ev = make_eval_step(cfg, cross_entropy)

    rng = np.random.default_rng(0)
    batch_d = {
        "image": jnp.asarray(rng.standard_normal((batch, 224, 224, 3)),
                             jnp.bfloat16),
        "label": jnp.asarray(rng.integers(0, 1000, batch), jnp.int32),
    }
    losses, logits = ev(trainable, frozen, batch_d)   # compile + warmup
    _ = float(losses[0])
    for _ in range(3):
        losses, logits = ev(trainable, frozen, batch_d)
    _ = float(losses[0])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        losses, logits = ev(trainable, frozen, batch_d)
    _ = float(losses[0])   # value fetch barrier (tunnel-safe)
    dt = (time.perf_counter() - t0) / STEPS
    emit({"study": "infer", "arch": arch, "batch": batch, "kernel": kernel,
          "ms_per_batch": round(dt * 1e3, 2),
          "img_s": round(batch / dt, 1)})


VARIANTS = {}
for _a, _b, _k in [
    ("vit_base", 1, "base"), ("vit_base", 1, "fused"),
    ("vit_base", 8, "base"), ("vit_base", 8, "fused"),
    ("vit_base", 64, "base"), ("vit_base", 64, "fused"),
    ("vit_base", 256, "base"), ("vit_base", 256, "fused"),
    ("vit_large", 64, "base"), ("vit_large", 64, "fused"),
]:
    VARIANTS[f"{_a}_b{_b}_{_k}"] = (lambda a=_a, b=_b, k=_k: bench(a, b, k))


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
