#!/usr/bin/env python
"""Round-3f: does int8 (W8A8 frozen kernels) pay on the FORWARD-ONLY
serving path?

Round 2 retired int8 as a training-speed lever (in-graph it loses
monotonically in the fwd+bwd step — BASELINE.md).  Serving is a different
regime: no backward, no remat, the dense path is a larger fraction of the
step, and the artifact-size/HBM win is already shipped
(`serve.py --quantize_frozen`).  This measures whether the W8A8 path also
buys serve-time throughput, ViT-B/14 @224, XLA and fused-kernel attention.

One subprocess per variant (jaxpr-cache trap).  Run detached:
  setsid nohup python experiments/r3f_int8_infer.py > experiments/r3f_int8_infer.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "r3f_int8_infer.jsonl")
STEPS = 40


def emit(rec):
    rec["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def bench(batch, kernel, quant):
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

    cfg = VIT_BUILDERS["vit_base"](
        img_size=224, patch_size=14, has_layerscale=True,
        layerscale_init=1.0, drop_path_rate=0.0, gelu_tanh=True,
        use_fused_apla=(kernel == "fused"))
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg, n_classes=1000,
        apla_cfg=AplaConfig(partial_size=128))
    if quant:
        from apla_tpu.ops.quant import quantize_frozen_backbone
        frozen = quantize_frozen_backbone(frozen)
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
    emit({"study": "int8_infer", "batch": batch, "kernel": kernel,
          "quant": quant, "ms_per_batch": round(dt * 1e3, 2),
          "img_s": round(batch / dt, 1)})


VARIANTS = {}
for _b, _k, _q in [
    (64, "base", False), (64, "base", True),
    (64, "fused", False), (64, "fused", True),
    (256, "fused", False), (256, "fused", True),
]:
    VARIANTS[f"b{_b}_{_k}_{'i8' if _q else 'bf16'}"] = (
        lambda b=_b, k=_k, q=_q: bench(b, k, q))


def main():
    if len(sys.argv) > 1:
        VARIANTS[sys.argv[1]]()
        return
    me = os.path.abspath(__file__)
    for name in VARIANTS:
        print(f"=== {name} ===", flush=True)
        try:
            r = subprocess.run([sys.executable, me, name], timeout=1800)
            rc = r.returncode
        except subprocess.TimeoutExpired:
            rc = "timeout"
        if rc:
            emit({"study": "error", "kind": name, "rc": rc})


if __name__ == "__main__":
    main()
