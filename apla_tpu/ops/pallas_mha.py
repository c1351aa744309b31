"""Pallas full-VMEM multi-head attention for short (ViT) sequences.

The generic flash-attention kernel tiles the KV dimension because long
sequences don't fit on-chip; ViT sequences do (N=257 for 224px/14: the
whole [N, N] f32 score matrix is ~280 KB).  This kernel runs one (batch,
head) pair per grid step with Q/K/V and the score matrix resident in VMEM:
the scores NEVER touch HBM, in forward or backward.

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


def _pad_n(n: int, multiple: int = 128) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_real):
    q = q_ref[0].astype(jnp.float32)          # [Np, D]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    npad = s.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_real, s, NEG_INF)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                scale, n_real):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_real, s, NEG_INF)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / denom                                     # [Np, Np]
    dv = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = ds * scale
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _call_fwd(q, k, v, scale, n_real):
    BH, Np, D = q.shape
    kern = functools.partial(_fwd_kernel, scale=scale, n_real=n_real)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((BH, Np, D), q.dtype),
        grid=(BH,),
        in_specs=[pl.BlockSpec((1, Np, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((1, Np, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * Np * Np * D, transcendentals=Np * Np,
            bytes_accessed=4 * Np * D * 4),
        interpret=INTERPRET,
    )(q, k, v)


def _call_bwd(q, k, v, do, scale, n_real):
    BH, Np, D = q.shape
    kern = functools.partial(_bwd_kernel, scale=scale, n_real=n_real)
    shapes = [jax.ShapeDtypeStruct((BH, Np, D), q.dtype)] * 3
    spec = pl.BlockSpec((1, Np, D), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=shapes,
        grid=(BH,),
        in_specs=[spec] * 4,
        out_specs=[spec] * 3,
        cost_estimate=pl.CostEstimate(
            flops=10 * Np * Np * D, transcendentals=Np * Np,
            bytes_accessed=7 * Np * D * 4),
        interpret=INTERPRET,
    )(q, k, v, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _vmem_mha_padded(q, k, v, scale, n_real):
    return _call_fwd(q, k, v, scale, n_real)


def _vmem_fwd(q, k, v, scale, n_real):
    return _call_fwd(q, k, v, scale, n_real), (q, k, v)


def _vmem_bwd(scale, n_real, res, do):
    q, k, v = res
    dq, dk, dv = _call_bwd(q, k, v, do, scale, n_real)
    return dq, dk, dv


_vmem_mha_padded.defvjp(_vmem_fwd, _vmem_bwd)


# VMEM budget: q,k,v,o [Np,D] + scores/p [Np,Np] f32 (+ bwd temps)
_MAX_VMEM_N = 1024


def fits_vmem(n: int) -> bool:
    return n <= _MAX_VMEM_N


def vmem_mha(q, k, v, scale: float = 1.0):
    """q, k, v: [B, N, H, Dh] -> [B, N, H, Dh].  Requires N <= ~1024."""
    B, N, H, D = q.shape
    Np = _pad_n(N)

    def prep(x):
        x = x.transpose(0, 2, 1, 3).reshape(B * H, N, D)
        if Np != N:
            x = jnp.pad(x, ((0, 0), (0, Np - N), (0, 0)))
        return x

    out = _vmem_mha_padded(prep(q), prep(k), prep(v), float(scale), N)
    out = out[:, :N].reshape(B, H, N, D).transpose(0, 2, 1, 3)
    return out


# --------------------------------------------------------------------------- #
# multi-head-per-program variant: batches HB heads into one grid step so the
# MXU sees [HB, Np, D] batched matmuls (better pipelining than one tiny
# matmul per program)
# --------------------------------------------------------------------------- #

def _fwd_kernel_mh(q_ref, k_ref, v_ref, o_ref, *, scale, n_real):
    q = q_ref[...].astype(jnp.float32)        # [HB, Np, D]
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale   # [HB, Np, Np]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < n_real, s, NEG_INF)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def vmem_mha_multihead(q, k, v, scale: float = 1.0, heads_per_block: int = 4):
    """Forward-only multi-head-blocked variant (benchmarking/eval path)."""
    B, N, H, D = q.shape
    Np = _pad_n(N)
    HB = heads_per_block
    assert H % HB == 0

    def prep(x):
        x = x.transpose(0, 2, 1, 3).reshape(B * H, N, D)
        if Np != N:
            x = jnp.pad(x, ((0, 0), (0, Np - N), (0, 0)))
        return x

    qp, kp, vp = prep(q), prep(k), prep(v)
    import functools as ft
    kern = ft.partial(_fwd_kernel_mh, scale=float(scale), n_real=N)
    spec = pl.BlockSpec((HB, Np, D), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        grid=(B * H // HB,),
        in_specs=[spec] * 3,
        out_specs=spec,
        interpret=INTERPRET,
    )(qp, kp, vp)
    return out[:, :N].reshape(B, H, N, D).transpose(0, 2, 1, 3)
