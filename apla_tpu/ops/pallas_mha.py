"""Pallas full-VMEM multi-head attention for short (ViT) sequences.

The generic flash-attention kernel tiles the KV dimension because long
sequences don't fit on-chip; ViT sequences do (N=257 for 224px/14: the
whole [N, N] f32 score matrix is ~280 KB).  This kernel runs a block of
heads per grid step with Q/K/V and the score matrix resident in VMEM: the
scores NEVER touch HBM, in forward or backward.

Round-2 fix: the round-1 version cast q/k/v to f32 BEFORE the dots — f32
MXU matmuls run at a fraction of the bf16 rate, which is why it measured
slower than XLA (BASELINE.md).  Dots now take bf16 operands and accumulate
in f32 (`preferred_element_type`), matching XLA's einsum numerics.

- Inputs are padded on N to a sublane multiple with zeroed rows; a column
  mask keeps padding out of the softmax.
- Backward recomputes scores in VMEM (they're cheap) and emits dq/dk/dv —
  no residual score storage, so the pattern composes with the block-level
  `remat='dots'` policy.

Used via `ViTConfig(use_flash=True)` for sequences that fit VMEM; longer
sequences (518px -> 1370 tokens) fall back to the blockwise flash kernel
(`flash_attention.py`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)

# set True (tests) to run the kernels in the Pallas interpreter off-TPU
INTERPRET = False


def _pad_n(n: int, multiple: int = 16) -> int:
    """Pad N to the bf16 SUBLANE multiple (16), not to a full lane tile.

    Round 2 padded to 128 (257 -> 384); but only the sublane dimension of
    the score/AV matmuls needs explicit alignment — Mosaic pads the lane
    dimension internally and the column mask already keeps padding out of
    the softmax.  257 -> 272 cuts the padded row count (and the K extent of
    the AV/dv dots, whose zero tail was real MXU work) by 29%."""
    return ((n + multiple - 1) // multiple) * multiple


def _softmax_masked(s, n_real, segment_len=0):
    """Masked, max-subtracted softmax over the last axis (f32 in VMEM).
    `segment_len` > 0 additionally restricts attention to the block
    diagonal (packed DINOv2 local crops)."""
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 1)
    valid = col < n_real
    if segment_len:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 2)
        valid &= (col // segment_len) == (row // segment_len)
    s = jnp.where(valid, s, NEG_INF)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_real, seg):
    q = q_ref[...]                             # [HB, Np, D] bf16
    k = k_ref[...]
    v = v_ref[...]
    # bf16 operands, f32 accumulation — the MXU's fast path
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale      # [HB, Np, Np] f32
    p = _softmax_masked(s, n_real, seg)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                scale, n_real, seg):
    q = q_ref[...]                             # [HB, Np, D] bf16
    k = k_ref[...]
    v = v_ref[...]
    do = do_ref[...]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    p = _softmax_masked(s, n_real, seg)        # [HB, Np, Np] f32
    pb = p.astype(q.dtype)
    dv = jax.lax.dot_general(pb, do, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = (ds * scale).astype(q.dtype)
    dq = jax.lax.dot_general(ds, k, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _pick_hb(bh: int, requested: int) -> int:
    hb = max(1, requested)
    while bh % hb:
        hb -= 1
    return hb


def _call_fwd(q, k, v, scale, n_real, heads_per_block=8, seg=0):
    BH, Np, D = q.shape
    HB = _pick_hb(BH, heads_per_block)
    kern = functools.partial(_fwd_kernel, scale=scale, n_real=n_real,
                             seg=seg)
    spec = pl.BlockSpec((HB, Np, D), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((BH, Np, D), q.dtype),
        grid=(BH // HB,),
        in_specs=[spec] * 3,
        out_specs=spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * Np * Np * D, transcendentals=BH * Np * Np,
            bytes_accessed=4 * BH * Np * D * 2),
        interpret=INTERPRET,
    )(q, k, v)


def _call_bwd(q, k, v, do, scale, n_real, heads_per_block=2, seg=0):
    # bwd holds s/p/dp (f32 [HB, Np, Np]) live simultaneously — HB=2 keeps
    # the working set ~6 MB; HB=8 overflows the 16 MB VMEM
    BH, Np, D = q.shape
    HB = _pick_hb(BH, heads_per_block)
    kern = functools.partial(_bwd_kernel, scale=scale, n_real=n_real,
                             seg=seg)
    shapes = [jax.ShapeDtypeStruct((BH, Np, D), q.dtype)] * 3
    spec = pl.BlockSpec((HB, Np, D), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=shapes,
        grid=(BH // HB,),
        in_specs=[spec] * 4,
        out_specs=[spec] * 3,
        cost_estimate=pl.CostEstimate(
            flops=10 * BH * Np * Np * D, transcendentals=BH * Np * Np,
            bytes_accessed=7 * BH * Np * D * 2),
        interpret=INTERPRET,
    )(q, k, v, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _vmem_mha_padded(q, k, v, scale, n_real, seg=0):
    return _call_fwd(q, k, v, scale, n_real, seg=seg)


def _vmem_fwd(q, k, v, scale, n_real, seg=0):
    return _call_fwd(q, k, v, scale, n_real, seg=seg), (q, k, v)


def _vmem_bwd(scale, n_real, seg, res, do):
    q, k, v = res
    dq, dk, dv = _call_bwd(q, k, v, do, scale, n_real, seg=seg)
    return dq, dk, dv


_vmem_mha_padded.defvjp(_vmem_fwd, _vmem_bwd)


# VMEM budget: the BACKWARD kernel holds s, p, dp as f32 [HB, Np, Np]
# simultaneously (plus q/k/v/do/ds), so with HB=2 the working set is
# ~24*Np^2 bytes + O(Np*D) — Np=512 is ~10 MB (fits the 16 MB v5e VMEM),
# Np=896 would be ~19 MB and fail Mosaic allocation.  The blockwise flash
# kernel covers longer sequences.
_MAX_VMEM_N = 512


def fits_vmem(n: int) -> bool:
    return n <= _MAX_VMEM_N


def vmem_mha(q, k, v, scale: float = 1.0, segment_len: int = 0):
    """q, k, v: [B, N, H, Dh] -> [B, N, H, Dh].  Requires N <= ~512.
    `segment_len` > 0: block-diagonal attention over packed segments."""
    B, N, H, D = q.shape
    Np = _pad_n(N)

    def prep(x):
        x = x.transpose(0, 2, 1, 3).reshape(B * H, N, D)
        if Np != N:
            x = jnp.pad(x, ((0, 0), (0, Np - N), (0, 0)))
        return x

    out = _vmem_mha_padded(prep(q), prep(k), prep(v), float(scale), N,
                           int(segment_len))
    out = out[:, :N].reshape(B, H, N, D).transpose(0, 2, 1, 3)
    return out


def vmem_mha_multihead(q, k, v, scale: float = 1.0, heads_per_block: int = 8):
    """Forward-only variant with an explicit head-block size (benchmarks)."""
    B, N, H, D = q.shape
    Np = _pad_n(N)

    def prep(x):
        x = x.transpose(0, 2, 1, 3).reshape(B * H, N, D)
        if Np != N:
            x = jnp.pad(x, ((0, 0), (0, Np - N), (0, 0)))
        return x

    out = _call_fwd(prep(q), prep(k), prep(v), float(scale), N,
                    heads_per_block=heads_per_block)
    return out[:, :N].reshape(B, H, N, D).transpose(0, 2, 1, 3)
