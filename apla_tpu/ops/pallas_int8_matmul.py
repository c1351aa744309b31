"""Fused int8 quantize+matmul Pallas kernel (experimental, round-2 lever).

Motivation (BASELINE.md): raw int8 MXU throughput is 1.54x bf16 on v5e, but
the unfused W8A8 graph loses the gain to separate activation-quantization
passes.  This kernel fuses the quantization INTO the matmul's K-loop:

  for each (m, n, k) tile:
      sx   = rowmax(|x_tile|) / 127          # per-row, per-K-GROUP scale
      x_i8 = round(x_tile / sx)
      acc += (x_i8 @ w_i8_tile).f32 * sx * sw_tile

Group-wise activation scales (one per [row, K-block]) are FINER than the
per-row scales of `quant.int8_matmul`, so accuracy improves while the x
tile never makes an extra HBM round-trip.

Weights are pre-quantized per-output-channel (`quant.quantize_weight`).
Forward only for now — wiring into the model (plus the backward kernels) is
the round-2 task.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False


def _kernel(x_ref, w_ref, sw_ref, o_ref, acc_ref, *, n_k):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...].astype(jnp.float32)                     # [bm, bk]
    amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)      # [bm, 1]
    sx = jnp.maximum(amax / 127.0, 1e-12)
    x_i8 = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    part = jax.lax.dot_general(
        x_i8, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    sw = sw_ref[...].astype(jnp.float32)                   # [1, bn]
    acc_ref[...] += part * sx * sw

    @pl.when(k_idx == n_k - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def fused_int8_matmul(x, w_i8, w_scale, *, block_m=256, block_n=256,
                      block_k=256):
    """x [M, K] float; w_i8 [K, N] int8; w_scale [N] f32 -> [M, N] x.dtype.

    M, K, N must be multiples of the block sizes (pad at the caller)."""
    M, K = x.shape
    K2, N = w_i8.shape
    assert K == K2
    bm, bn, bk = min(block_m, M), min(block_n, N), min(block_k, K)
    assert M % bm == 0 and N % bn == 0 and K % bk == 0, (M, N, K)
    n_k = K // bk
    kern = functools.partial(_kernel, n_k=n_k)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        grid=(M // bm, N // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + K * N + M * N * 4,
            transcendentals=0),
        interpret=INTERPRET,
    )(x, w_i8, w_scale.reshape(1, -1))
