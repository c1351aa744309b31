#!/usr/bin/env python
"""Round-2 study E: where do the full step's 128.6 ms actually go?

Study D showed the ViT shapes run at ~140 TFLOP/s in chained form — the
step runs at ~90 effective, so ~40 ms is NOT matmul work.  This measures
in-graph marginal costs by swapping implementations (monkeypatch) inside
the REAL b64 APLA train step:

  baseline        current default (re-measure)
  no_attn         attention output = v (qkv + APLA proj kept)
  softmax_bf16    softmax without the f32 upcast
  no_ln           LayerNorm -> scale+shift only (no statistics)
  gelu_tanh       approximate gelu (cheaper transcendental + dgelu)
  flash_jax       jax.experimental.pallas.ops.tpu flash_attention
                  (the JAX-team-tuned kernel), N padded 257->384 with
                  segment-id masking

Run detached:
  setsid nohup python experiments/r2_step_ablations.py > experiments/r2_step_ablations.log 2>&1 &
"""

from __future__ import annotations

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

OUT = os.path.join(os.path.dirname(__file__), "r2_step_ablations.jsonl")
BATCH = 64


def emit(rec):
    rec["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def build_and_time():
    from apla_tpu.apla.core import AplaConfig
    from apla_tpu.models.classifier import init_classifier
    from apla_tpu.models.vit import VIT_BUILDERS
    from apla_tpu.train.losses import cross_entropy
    from apla_tpu.train.optim import build_optimizer
    from apla_tpu.train.steps import make_train_step
    from apla_tpu.train.train_state import TrainState

    cfg = VIT_BUILDERS["vit_base"](
        img_size=224, patch_size=14, has_layerscale=True,
        layerscale_init=1.0, drop_path_rate=0.0)
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg, n_classes=1000,
        apla_cfg=AplaConfig(partial_size=128))
    tx = build_optimizer("AdamW", {"lr": 3e-5, "weight_decay": 1e-5},
                         trainable, grad_clip=1.0)
    state = TrainState.create(trainable, tx)
    step = make_train_step(cfg, tx, cross_entropy)

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.standard_normal((BATCH, 224, 224, 3)),
                             jnp.bfloat16),
        "label": jnp.asarray(rng.integers(0, 1000, BATCH), jnp.int32),
    }
    key = jax.random.PRNGKey(1)
    state, m = step(state, frozen, batch, 3e-5, key)
    loss0 = float(m["loss"])
    for _ in range(3):
        state, m = step(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(30):
        state, m = step(state, frozen, batch, 3e-5, key)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / 30
    return dt, loss0


# ----------------------------------------------------------------- variants

def attend_noop(x, qkv_kernel, qkv_bias, num_heads, scale=None,
                attn_drop=0.0, rng=None, deterministic=True,
                use_flash=False, logits_f32=True):
    from apla_tpu.ops.quant import maybe_quantized_dot
    B, N, C = x.shape
    qkv = maybe_quantized_dot(x, qkv_kernel, qkv_bias)
    qkv = qkv.reshape(B, N, 3, num_heads, C // num_heads)
    v = qkv[:, :, 2]
    return v.reshape(B, N, C)


def attend_softmax_bf16(x, qkv_kernel, qkv_bias, num_heads, scale=None,
                        attn_drop=0.0, rng=None, deterministic=True,
                        use_flash=False, logits_f32=True):
    from apla_tpu.ops.quant import maybe_quantized_dot
    B, N, C = x.shape
    head_dim = C // num_heads
    if scale is None:
        scale = head_dim ** -0.5
    qkv = maybe_quantized_dot(x, qkv_kernel, qkv_bias)
    qkv = qkv.reshape(B, N, 3, num_heads, head_dim)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=x.dtype) * x.dtype.type(scale)
    attn = jax.nn.softmax(logits, axis=-1)  # bf16 throughout
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                     preferred_element_type=x.dtype)
    return out.reshape(B, N, C)


def make_attend_flashjax(n_pad=384):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention)

    def attend(x, qkv_kernel, qkv_bias, num_heads, scale=None,
               attn_drop=0.0, rng=None, deterministic=True,
               use_flash=False, logits_f32=True):
        from apla_tpu.ops.quant import maybe_quantized_dot
        B, N, C = x.shape
        head_dim = C // num_heads
        if scale is None:
            scale = head_dim ** -0.5
        qkv = maybe_quantized_dot(x, qkv_kernel, qkv_bias)
        qkv = qkv.reshape(B, N, 3, num_heads, head_dim)
        # [B, H, N, Dh]
        q = qkv[:, :, 0].transpose(0, 2, 1, 3)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)
        pad = n_pad - N
        if pad:
            zeros = jnp.zeros((B, num_heads, pad, head_dim), q.dtype)
            q = jnp.concatenate([q, zeros], axis=2)
            k = jnp.concatenate([k, zeros], axis=2)
            v = jnp.concatenate([v, zeros], axis=2)
        seg = jnp.concatenate([jnp.zeros((B, N), jnp.int32),
                               jnp.ones((B, pad), jnp.int32)], axis=1)
        out = flash_attention(q, k, v,
                              segment_ids=SegmentIds(q=seg, kv=seg),
                              sm_scale=float(scale))
        out = out[:, :, :N].transpose(0, 2, 1, 3)
        return out.reshape(B, N, C)

    return attend


def ln_noop(x, scale, bias, eps=1e-6):
    return (x.astype(jnp.float32) * scale + bias).astype(x.dtype)


VARIANTS = ["baseline", "no_attn", "softmax_bf16", "no_ln", "gelu_tanh",
            "flash_jax_384"]


def run_variant(name):
    """Apply the patch BEFORE any tracing: jax.checkpoint caches the traced
    jaxpr keyed on the stable _block_forward object, so a patch applied
    after a first trace in the same process is silently ignored (this is
    also why round 1's in-process ablations read as 'free')."""
    import apla_tpu.models.vit as vit_mod
    import apla_tpu.ops.attention as attn_mod

    orig_gelu = jax.nn.gelu
    if name == "no_attn":
        attn_mod.qkv_and_attend = attend_noop
    elif name == "softmax_bf16":
        attn_mod.qkv_and_attend = attend_softmax_bf16
    elif name == "no_ln":
        vit_mod.layer_norm = ln_noop
    elif name == "gelu_tanh":
        jax.nn.gelu = lambda x, approximate=False: orig_gelu(
            x, approximate=True)
    elif name == "flash_jax_384":
        attn_mod.qkv_and_attend = make_attend_flashjax(384)

    try:
        dt, loss0 = build_and_time()
        emit({"study": "E", "variant": name, "ms": round(dt * 1e3, 2),
              "img_s": round(BATCH / dt, 1), "loss0": round(loss0, 4)})
    except Exception as e:  # noqa: BLE001
        emit({"study": "E", "variant": name, "error": repr(e)[:400]})


def main():
    # one subprocess per variant: fresh trace caches AND one TPU client
    # (no jax.devices() here — the parent must NOT create a TPU client)
    import subprocess
    emit({"study": "E", "subprocess_per_variant": True})
    here = os.path.abspath(__file__)
    root = os.path.dirname(os.path.dirname(here))
    for name in VARIANTS:
        subprocess.run([sys.executable, here, name], cwd=root)
    emit({"study": "E", "done": True})


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_variant(sys.argv[1])
    else:
        main()
