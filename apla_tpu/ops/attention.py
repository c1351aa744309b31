"""Multi-head self-attention ops (jnp reference path).

Reference semantics: `src/utils/transformers/vit.py:174-197` (Attention) and
`src/apla/appla_attn.py:50-83` (APLA_Attention — same attention, APLA on the
output projection).  The QKV projection is always frozen under APLA.

XLA on TPU fuses the softmax chain into the attention matmuls; a Pallas
flash-attention kernel (`apla_tpu/ops/flash_attention.py`) covers the
memory-efficient variant (`appla_attn_mem_eff.py`) for long sequences.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from .apla_proj import apla_proj


def _dropout(x, rate, rng, deterministic):
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, p=keep, shape=x.shape)
    return jnp.where(mask, x / keep, 0.0)


def qkv_and_attend(x, qkv_kernel, qkv_bias, num_heads, scale=None,
                   attn_drop=0.0, rng=None, deterministic=True,
                   use_flash=False, logits_f32=True, segment_len=0):
    """QKV projection + scaled dot-product attention.  Returns [B, N, C].

    `segment_len` > 0: block-diagonal attention — tokens attend only inside
    their own segment of that length (packed DINOv2 local crops)."""
    B, N, C = x.shape
    head_dim = C // num_heads
    if scale is None:
        scale = head_dim ** -0.5
    from .quant import maybe_quantized_dot
    qkv = maybe_quantized_dot(x, qkv_kernel, qkv_bias)
    qkv = qkv.reshape(B, N, 3, num_heads, head_dim)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, H, Dh]

    if use_flash and attn_drop == 0.0:
        from .flash_attention import flash_mha
        out = flash_mha(q, k, v, scale=scale, segment_len=segment_len)
        # saved by the 'dots' remat policies: a pallas_call is not a dot,
        # so without the name the whole kernel would re-run in backward
        out = checkpoint_name(out, "attn_out")
        return out.reshape(B, N, C)

    # logits materialise as [B, H, N, N]; f32 is the safe default, bf16
    # halves the HBM traffic of the softmax chain (max-subtracted exp is
    # fine in bf16 for ViT-scale logits)
    acc = jnp.float32 if logits_f32 else x.dtype
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=acc) * scale
    logits = logits.astype(jnp.float32)
    if segment_len:
        seg = jnp.arange(N) // segment_len
        cross = seg[:, None] != seg[None, :]
        logits = jnp.where(cross[None, None], jnp.float32(-1e9), logits)
    attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    # named for the 'dots_attn' remat policy: saving the softmaxed weights
    # skips the QK^T + softmax recompute in backward (the batched einsums
    # are NOT covered by checkpoint_dots_with_no_batch_dims)
    attn = checkpoint_name(attn, "attn_weights")
    attn = _dropout(attn, attn_drop, rng, deterministic)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                     preferred_element_type=x.dtype)
    return out.reshape(B, N, C)


def multi_head_attention(x, params, num_heads, scale=None, attn_drop=0.0,
                         proj_drop=0.0, rng=None, deterministic=True,
                         use_flash=False, logits_f32=True, segment_len=0):
    """Standard attention block: QKV, attend, dense output projection.

    `params`: {'qkv': {'kernel', 'bias'?}, 'proj': {'kernel', 'bias'}}
    """
    rng_a, rng_p = (jax.random.split(rng) if rng is not None else (None, None))
    out = qkv_and_attend(
        x, params["qkv"]["kernel"], params["qkv"].get("bias"), num_heads,
        scale=scale, attn_drop=attn_drop, rng=rng_a,
        deterministic=deterministic, use_flash=use_flash,
        logits_f32=logits_f32, segment_len=segment_len)
    proj = params["proj"]
    out = jnp.dot(out, proj["kernel"].astype(x.dtype),
                  preferred_element_type=x.dtype) + proj["bias"].astype(x.dtype)
    return _dropout(out, proj_drop, rng_p, deterministic)


def apla_attention(x, frozen, trainable, num_heads, scale=None, attn_drop=0.0,
                   proj_drop=0.0, rng=None, deterministic=True,
                   use_flash=False, logits_f32=True, use_fused=False,
                   segment_len=0):
    """APLA attention: frozen QKV + attention, partial-trainable projection.

    `frozen`:    {'qkv': {'kernel','bias'?}, 'proj': {'kernel','bias'}, 'inds': [k]}
    `trainable`: {'proj_wt': [d, k], 'proj_bt': [k]}  (may be the full proj for
                 partial_size == 'full', in which case `inds` covers all dims)
    `use_fused`: run attention + the partial projection as ONE Pallas kernel
                 (pallas_apla_attn.py) — the attention output never leaves
                 VMEM and dW_t is computed in-kernel.
    """
    rng_a, rng_p = (jax.random.split(rng) if rng is not None else (None, None))
    B, N, C = x.shape
    if use_fused and attn_drop == 0.0:
        from .pallas_apla_attn import (fused_apla_attention, fused_admitted,
                                       fused_available, fused_dtype_ok,
                                       fused_fits, warn_fused_fallback)
        k_tr = trainable["proj_wt"].shape[-1]
        if fused_available() and not fused_dtype_ok(x.dtype):
            # the kernel ladders are bf16-calibrated; f32 doubles the VMEM
            # working set past the bisected Mosaic abort points
            warn_fused_fallback(
                f"compute dtype {jnp.dtype(x.dtype).name} (kernels are "
                "hardware-validated at bfloat16; APLA_FUSED_ALLOW_F32=1 "
                "overrides)")
        elif fused_available() and not fused_admitted(B, N, C, k_tr):
            warn_fused_fallback(
                f"geometry B={B} N={N} C={C} declined by the fold/envelope "
                "admission (runs XLA)")
        elif fused_available() and fused_fits(N, C, k_tr):
            from .quant import maybe_quantized_dot
            head_dim = C // num_heads
            qkv = maybe_quantized_dot(x, frozen["qkv"]["kernel"],
                                      frozen["qkv"].get("bias"))
            out = fused_apla_attention(
                qkv, trainable["proj_wt"], trainable["proj_bt"],
                frozen["proj"]["kernel"], frozen["proj"]["bias"],
                frozen["inds"], num_heads,
                float(scale if scale is not None else head_dim ** -0.5),
                int(segment_len))
            out = checkpoint_name(out, "attn_out")
            return _dropout(out, proj_drop, rng_p, deterministic)
        elif fused_available() and segment_len == 0:
            # beyond the monolithic kernel's VMEM envelope (the @518
            # N=1370 regime): the q-strip long kernel, same contract
            from .pallas_apla_attn_long import (fused_apla_attention_long,
                                                long_fused_ok)
            if long_fused_ok(N, C, k_tr, b=B):
                from .quant import maybe_quantized_dot
                head_dim = C // num_heads
                qkv = maybe_quantized_dot(x, frozen["qkv"]["kernel"],
                                          frozen["qkv"].get("bias"))
                out = fused_apla_attention_long(
                    qkv, trainable["proj_wt"], trainable["proj_bt"],
                    frozen["proj"]["kernel"], frozen["proj"]["bias"],
                    frozen["inds"], num_heads,
                    float(scale if scale is not None
                          else head_dim ** -0.5))
                out = checkpoint_name(out, "attn_out")
                return _dropout(out, proj_drop, rng_p, deterministic)
            warn_fused_fallback(
                f"geometry B={B} N={N} C={C} k={k_tr} exceeds the "
                "monolithic kernel's VMEM envelope and the long kernel "
                "declined (raise APLA_FUSED_VMEM_MB — the ViT-L@512+ "
                "full-k dW_t needs ~15)")
    out = qkv_and_attend(
        x, frozen["qkv"]["kernel"], frozen["qkv"].get("bias"), num_heads,
        scale=scale, attn_drop=attn_drop, rng=rng_a,
        deterministic=deterministic, use_flash=use_flash,
        logits_f32=logits_f32, segment_len=segment_len)
    out = apla_proj(out, trainable["proj_wt"], trainable["proj_bt"],
                    frozen["proj"]["kernel"], frozen["proj"]["bias"],
                    frozen["inds"])
    return _dropout(out, proj_drop, rng_p, deterministic)
