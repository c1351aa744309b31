#!/usr/bin/env python
"""Round-5b: forward-only serving at the reference's native 518 grid.

The q-strip long kernel (ops/pallas_apla_attn_long.py) won the @518
TRAINING regime this round (+44% b8, r5_long_fused.jsonl) but no
forward-only row exists at N=1370 — the regime a `--eval_img_size 518`
evaluation or a 518-resolution serve artifact actually runs
(reference builds its ViT at img_size [518]:
/root/reference/params/finetune/dinov2/NABirds/vit_b/__common__.yml:126).

Interleaved same-session A/B subprocess pairs, 3 repeats (the round-5
methodology: cross-session drift is few-percent), plus one int8 pair to
scope the round-5 int8 serving verdict at the long-sequence point.

Output: experiments/r5b_infer518.jsonl

  setsid nohup python experiments/r5b_infer518.py > experiments/r5b_infer518.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

OUT = os.path.join(HERE, "r5b_infer518.jsonl")

VARIANTS = (
    "b8_xla_bf16_r1", "b8_fused_bf16_r1",
    "b8_xla_bf16_r2", "b8_fused_bf16_r2",
    "b8_xla_bf16_r3", "b8_fused_bf16_r3",
    "b32_xla_bf16_r1", "b32_fused_bf16_r1",
    "b32_xla_bf16_r2", "b32_fused_bf16_r2",
    "b32_xla_bf16_r3", "b32_fused_bf16_r3",
    "b32_xla_int8_r1", "b32_fused_int8_r1",
)


def emit(rec):
    rec["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def bench(batch, kernel, quant, rep):
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
        img_size=518, patch_size=14, has_layerscale=True,
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
        "image": jnp.asarray(rng.standard_normal((batch, 518, 518, 3)),
                             jnp.bfloat16),
        "label": jnp.asarray(rng.integers(0, 1000, batch), jnp.int32),
    }
    steps = 40 if batch <= 8 else 20
    t0 = time.time()
    out = ev(trainable, frozen, batch_d)
    loss = float(out[0][0])
    compile_s = round(time.time() - t0, 1)
    for _ in range(3):
        out = ev(trainable, frozen, batch_d)
    _ = float(out[0][0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = ev(trainable, frozen, batch_d)
    _ = float(out[0][0])
    dt = (time.perf_counter() - t0) / steps
    emit({"study": "r5b_infer518", "batch": batch, "kernel": kernel,
          "quant": quant, "rep": rep, "compile_s": compile_s,
          "loss": round(loss, 4), "ms_per_batch": round(dt * 1e3, 2),
          "img_s": round(batch / dt, 1)})


def run(name):
    b, kernel, dtype, rep = name.split("_")
    bench(int(b[1:]), kernel, dtype == "int8", int(rep[1:]))


if __name__ == "__main__":
    if len(sys.argv) > 1:
        try:
            run(sys.argv[1])
        except Exception as e:  # noqa: BLE001
            emit({"study": "r5b_infer518", "variant": sys.argv[1],
                  "error": repr(e)[:400]})
    else:
        from apla_tpu.utils.tpu_client_lock import tpu_client
        emit({"study": "r5b_infer518", "subprocess_per_variant": True,
              "interleaved": True})
        here = os.path.abspath(__file__)
        root = os.path.dirname(HERE)
        with tpu_client("r5b_infer518"):
            for name in VARIANTS:
                subprocess.run([sys.executable, here, name], cwd=root)
        emit({"study": "r5b_infer518", "done": True})
