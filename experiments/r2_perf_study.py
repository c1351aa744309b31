#!/usr/bin/env python
"""Round-2 perf study (VERDICT #1): does int8 win where K is large?

Round 1 condemned int8 after measuring ONLY the fc1 shape (K=768, the MXU's
small-K regime).  This study measures every dense shape the ViT-B step
actually runs — fc2 and the fc1-backward dx both have K=3072 — plus a
full-train-step remat/unroll sweep.

Run detached (one TPU client at a time):
  setsid nohup python experiments/r2_perf_study.py > experiments/r2_perf_study.log 2>&1 &

Appends one JSON line per measurement to experiments/r2_perf_study.jsonl.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "r2_perf_study.jsonl")


def emit(rec):
    rec["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def fetch(x):
    """Sync barrier that works through the axon tunnel (block_until_ready
    lies): fetch one scalar to host."""
    return float(jnp.sum(x[..., :1].astype(jnp.float32)))


def time_calls(fn, args, iters=30):
    o = fn(*args)
    fetch(o)                      # compile + tunnel warmup
    for _ in range(3):
        o = fn(*args)
    fetch(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    fetch(o)
    return (time.perf_counter() - t0) / iters


# ---------------------------------------------------------------- study A
# Shape-level matmul rates for every dense shape in the ViT-B b64 step.
# M = 64 * 257 tokens = 16448, padded to 16640 (multiple of 256).

def study_a():
    from apla_tpu.ops.pallas_int8_matmul import fused_int8_matmul
    from apla_tpu.ops.quant import quantize_weight

    M = 16640
    shapes = {
        "qkv_fwd":  (M, 768, 2304),
        "fc1_fwd":  (M, 768, 3072),
        "fc2_fwd":  (M, 3072, 768),   # K=3072 — the untested regime
        "dx1_bwd":  (M, 3072, 768),   # fc1 dx: g @ W1^T, K=3072 (same shape)
        "dx_qkv":   (M, 2304, 768),   # qkv dx: K=2304
        "proj_fwd": (M, 768, 768),
    }
    rng = np.random.default_rng(0)

    for name, (m, k, n) in shapes.items():
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
        w_i8, w_scale = quantize_weight(w)
        w_i8, w_scale = jax.device_put(w_i8), jax.device_put(w_scale)
        flops = 2.0 * m * k * n

        def bf16(x, w):
            return jnp.dot(x, w, preferred_element_type=jnp.bfloat16)

        def xla_int8_dyn(x, w_i8, w_scale):
            xf = x.astype(jnp.float32)
            amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
            sx = (amax / 127.0).clip(1e-12)
            x_i8 = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(x_i8, w_i8, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return (y.astype(jnp.float32) * sx * w_scale[None, :]
                    ).astype(jnp.bfloat16)

        def xla_int8_pre(x_i8, w_i8, w_scale):
            # activation already int8: the pure-MXU ceiling at this shape
            y = jax.lax.dot_general(x_i8, w_i8, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return (y.astype(jnp.float32) * w_scale[None, :]
                    ).astype(jnp.bfloat16)

        x_i8 = jnp.clip(jnp.round(x.astype(jnp.float32)), -127, 127
                        ).astype(jnp.int8)

        variants = [
            ("bf16", jax.jit(bf16), (x, w)),
            ("xla_int8_dyn", jax.jit(xla_int8_dyn), (x, w_i8, w_scale)),
            ("xla_int8_pre", jax.jit(xla_int8_pre), (x_i8, w_i8, w_scale)),
            ("pallas_fused_bk256",
             jax.jit(functools.partial(fused_int8_matmul, block_k=256)),
             (x, w_i8, w_scale)),
        ]
        if k >= 512 and k % 512 == 0:
            variants.append(
                ("pallas_fused_bk512",
                 jax.jit(functools.partial(fused_int8_matmul, block_k=512)),
                 (x, w_i8, w_scale)))
        if k >= 1024 and k % 1024 == 0:
            variants.append(
                ("pallas_fused_bk1024",
                 jax.jit(functools.partial(fused_int8_matmul, block_k=1024)),
                 (x, w_i8, w_scale)))

        for vname, fn, args in variants:
            try:
                dt = time_calls(fn, args)
                emit({"study": "A", "shape": name, "mkn": [m, k, n],
                      "kernel": vname, "ms": round(dt * 1e3, 3),
                      "tflops": round(flops / dt / 1e12, 1)})
            except Exception as e:  # noqa: BLE001
                emit({"study": "A", "shape": name, "kernel": vname,
                      "error": repr(e)[:300]})


# ---------------------------------------------------------------- study B
# Full-train-step sweep: remat policy x scan unroll (no model changes).

def make_step(remat, unroll=1, quantize=None):
    from apla_tpu.apla.core import AplaConfig
    from apla_tpu.models.classifier import init_classifier
    from apla_tpu.models.vit import VIT_BUILDERS
    from apla_tpu.train.losses import cross_entropy
    from apla_tpu.train.optim import build_optimizer
    from apla_tpu.train.steps import make_train_step
    from apla_tpu.train.train_state import TrainState

    cfg = VIT_BUILDERS["vit_base"](
        img_size=224, patch_size=14, has_layerscale=True,
        layerscale_init=1.0, drop_path_rate=0.0, remat=remat,
        scan_unroll=unroll)
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg, n_classes=1000,
        apla_cfg=AplaConfig(partial_size=128))
    if quantize:
        from apla_tpu.ops.quant import quantize_frozen_backbone
        frozen = quantize_frozen_backbone(frozen)
    tx = build_optimizer("AdamW", {"lr": 3e-5, "weight_decay": 1e-5},
                         trainable, grad_clip=1.0)
    state = TrainState.create(trainable, tx)
    step = make_train_step(cfg, tx, cross_entropy)
    return step, state, frozen


def time_step(step, state, frozen, batch, key, iters=30):
    state, m = step(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    for _ in range(3):
        state, m = step(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    return (time.perf_counter() - t0) / iters


def study_b():
    BATCH = 64
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.standard_normal((BATCH, 224, 224, 3)),
                             jnp.bfloat16),
        "label": jnp.asarray(rng.integers(0, 1000, BATCH), jnp.int32),
    }
    key = jax.random.PRNGKey(1)

    variants = [
        ("dots_u1", dict(remat="dots", unroll=1)),          # r1 baseline
        ("none_u1", dict(remat=None, unroll=1)),
        ("dots_batch_u1", dict(remat="dots_batch", unroll=1)),
        ("dots_u2", dict(remat="dots", unroll=2)),
        ("dots_u4", dict(remat="dots", unroll=4)),
        ("none_u2", dict(remat=None, unroll=2)),
    ]
    for name, kw in variants:
        try:
            step, state, frozen = make_step(**kw)
            dt = time_step(step, state, frozen, batch, key)
            del step, state, frozen
            emit({"study": "B", "variant": name, "ms": round(dt * 1e3, 2),
                  "img_s": round(BATCH / dt, 1)})
        except Exception as e:  # noqa: BLE001
            emit({"study": "B", "variant": name, "error": repr(e)[:300]})


if __name__ == "__main__":
    emit({"study": "start", "devices": str(jax.devices())})
    study_a()
    study_b()
    emit({"study": "done"})
