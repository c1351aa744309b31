#!/usr/bin/env python
"""Round-5: complete the int8 serving evidence (VERDICT r4 item 6).

The round-4 "int8 WINS every forward-only regime" verdict rested on
ViT-B @224 b64/b256 only (r3f_int8_infer.jsonl).  SERVING.md recommends
--quantize_frozen for every artifact family, so this sweep covers what the
claim needs:

  b1 latency        ViT-B fused+XLA, quant on/off (the latency regime)
  ViT-L b64         fused, quant on/off (the larger-backbone regime)
  detector b16      Swin-T features + FCOS head forward, quant on/off
                    (the side-car artifact family; host NMS excluded)

One subprocess per variant.  Output: experiments/r5_int8_serving.jsonl

  setsid nohup python experiments/r5_int8_serving.py > experiments/r5_int8_serving.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "r5_int8_serving.jsonl")

VARIANTS = (
    "vitb_b1_fused_bf16", "vitb_b1_fused_int8",
    "vitb_b1_base_bf16", "vitb_b1_base_int8",
    "vitl_b64_fused_bf16", "vitl_b64_fused_int8",
    "det_b16_bf16", "det_b16_int8",
)


def emit(rec):
    rec["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _time_loop(fn, fetch, steps):
    t0 = time.time()
    out = fn()
    _ = fetch(out)
    compile_s = round(time.time() - t0, 1)
    for _ in range(3):
        out = fn()
    _ = fetch(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn()
    _ = fetch(out)
    return compile_s, (time.perf_counter() - t0) / steps


def bench_vit(model, batch, kernel, quant):
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

    cfg = VIT_BUILDERS[model](
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
    steps = 100 if batch == 1 else 40
    compile_s, dt = _time_loop(lambda: ev(trainable, frozen, batch_d),
                               lambda out: float(out[0][0]), steps)
    emit({"study": "r5_int8", "model": model, "batch": batch,
          "kernel": kernel, "quant": quant, "compile_s": compile_s,
          "ms_per_batch": round(dt * 1e3, 3),
          "img_s": round(batch / dt, 1)})


def bench_det(batch, quant):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    import numpy as np

    from apla_tpu.models.detection import (_conv_init, fcos_head_forward,
                                           init_fcos_head)
    from apla_tpu.models.swin import (SwinConfig, build_apla_swin,
                                      init_swin_params, swin_features)

    cfg = SwinConfig(img_size=224)
    key = jax.random.PRNGKey(0)
    sp = init_swin_params(key, cfg)
    bb_t, bb_f = build_apla_swin(sp)
    if quant:
        from apla_tpu.ops.quant import quantize_frozen_backbone
        bb_f = quantize_frozen_backbone(bb_f)
    n_levels = len(cfg.depths)
    dims = [cfg.embed_dim * 2 ** i for i in range(n_levels)]
    keys = jax.random.split(key, n_levels + 1)
    head = init_fcos_head(keys[0], cfg.embed_dim, 80, channels=128,
                          n_levels=n_levels)
    laterals = [_conv_init(keys[1 + i], 1, dims[i], cfg.embed_dim)
                for i in range(n_levels)]
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)),
                         jnp.bfloat16)

    @jax.jit
    def forward(bb_t, bb_f, head, laterals, images):
        feats = swin_features(bb_f, images, cfg, trainable=bb_t)
        return fcos_head_forward(feats, head, laterals)

    compile_s, dt = _time_loop(
        lambda: forward(bb_t, bb_f, head, laterals, images),
        lambda out: float(out[0][0].sum()), 40)
    emit({"study": "r5_int8", "model": "det_swin_t", "batch": batch,
          "quant": quant, "compile_s": compile_s,
          "ms_per_batch": round(dt * 1e3, 2), "img_s": round(batch / dt, 1)})


def run(name):
    parts = name.split("_")
    if parts[0] == "det":
        bench_det(int(parts[1][1:]), parts[2] == "int8")
    else:
        model = {"vitb": "vit_base", "vitl": "vit_large"}[parts[0]]
        bench_vit(model, int(parts[1][1:]), parts[2], parts[3] == "int8")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        try:
            run(sys.argv[1])
        except Exception as e:  # noqa: BLE001
            emit({"study": "r5_int8", "variant": sys.argv[1],
                  "error": repr(e)[:400]})
    else:
        from apla_tpu.utils.tpu_client_lock import tpu_client
        emit({"study": "r5_int8", "subprocess_per_variant": True})
        here = os.path.abspath(__file__)
        root = os.path.dirname(os.path.dirname(here))
        with tpu_client("r5_int8_serving"):
            for name in VARIANTS:
                subprocess.run([sys.executable, here, name], cwd=root)
        emit({"study": "r5_int8", "done": True})
