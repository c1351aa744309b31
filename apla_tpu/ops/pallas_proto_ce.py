"""Fused prototype cross-entropy: (linear -> online-softmax CE) in ONE
Pallas kernel for the DINOv2 65536-prototype heads.

Reference semantics (`src/self_supervised/dinov2/loss/dino_clstoken_loss.py:62-74`,
`ibot_patch_loss.py:100-120`): student logits ``s = x_s @ W_s`` and teacher
logits ``t = x_t @ W_t`` feed ``CE(softmax((t - center)/tau_t),
log_softmax(s/tau_s))`` row-wise.  The separate-ops path materialises BOTH
``[R, K]`` logit matrices in f32 HBM (K = 65536: ~0.5 GB per pass at the
iBOT buffer size) and runs three softmax chains over them; this kernel
streams the weight column blocks through VMEM and keeps every logit block
on-chip:

  forward  (grid rows x K-blocks): per row tile, accumulate online-softmax
           stats for s AND t (flash-attention style running max/sum) plus
           the rescaled cross term ``sum_k exp(t'-m_t) * s'``; the last
           K-block emits ``ce = lse_s - (sum_k p_t * s')`` per row.  HBM
           traffic = the two [D, K] weights once + tiny row tiles.
  backward (two passes, same streaming): recomputes each logit block from
           the saved row statistics and applies
           ``d ce / d s = (p_s - p_t) / tau_s`` on the fly:
           dxs accumulates over K-blocks, dWs accumulates over row tiles
           (the [R, K] soft-target matrix never exists).

Teacher inputs (x_t, W_t, center) are constants of the loss (the caller
stop-gradients them); tau_t is a traced schedule scalar and rides in SMEM.

Used via ``model_params.dinov2.fused_proto_ce: true`` (opt-in; XLA path
off-TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)

# flipped by tests to run in the Pallas interpreter off-TPU
INTERPRET = False

# block shapes: rows per tile x prototype columns per block.  BR rows of
# bf16 bottlenecks (D<=512) and two [BR, BK] f32 logit blocks live in VMEM:
# 256 x 2048 x 4 B x 2 = 4 MB + two [D, BK] weight blocks (2 MB bf16).
_BR = 256
_BK = 2048


def _pad_to(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def _row_pad(x, rp):
    if x.shape[0] != rp:
        x = jnp.pad(x, ((0, rp - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))
    return x


def _logit_blocks(xs_b, ws_b, xt_b, wt_b, c_b, inv_ts, tt):
    """One [BR, BK] block of student and teacher (tempered) logits."""
    s = jax.lax.dot_general(
        xs_b, ws_b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * inv_ts
    t = (jax.lax.dot_general(
        xt_b, wt_b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) - c_b) / tt
    return s, t


def _fwd_kernel(tt_ref, xs_ref, ws_ref, xt_ref, wt_ref, c_ref, kmask_ref,
                ce_ref, lses_ref, lset_ref,
                ms_ref, ls_ref, mt_ref, lt_ref, ats_ref,
                *, inv_ts, nk):
    k = pl.program_id(1)
    tt = tt_ref[0, 0]
    s, t = _logit_blocks(xs_ref[...], ws_ref[...], xt_ref[...], wt_ref[...],
                         c_ref[...], inv_ts, tt)
    # padded prototype columns must not contribute to any softmax
    kmask = kmask_ref[...] > 0                     # [1, BK]
    s = jnp.where(kmask, s, NEG_INF)
    t = jnp.where(kmask, t, NEG_INF)

    @pl.when(k == 0)
    def _():
        ms_ref[...] = jnp.full_like(ms_ref, NEG_INF)
        ls_ref[...] = jnp.zeros_like(ls_ref)
        mt_ref[...] = jnp.full_like(mt_ref, NEG_INF)
        lt_ref[...] = jnp.zeros_like(lt_ref)
        ats_ref[...] = jnp.zeros_like(ats_ref)

    bm_s = jnp.max(s, axis=1, keepdims=True)       # [BR, 1]
    m_s0 = ms_ref[...][:, :1]
    m_s = jnp.maximum(m_s0, bm_s)
    ls_ref[...] = jnp.broadcast_to(
        ls_ref[...][:, :1] * jnp.exp(m_s0 - m_s)
        + jnp.sum(jnp.exp(s - m_s), axis=1, keepdims=True),
        ls_ref.shape)
    ms_ref[...] = jnp.broadcast_to(m_s, ms_ref.shape)

    bm_t = jnp.max(t, axis=1, keepdims=True)
    m_t0 = mt_ref[...][:, :1]
    m_t = jnp.maximum(m_t0, bm_t)
    scale_t = jnp.exp(m_t0 - m_t)
    et = jnp.exp(t - m_t)                          # [BR, BK]
    lt_ref[...] = jnp.broadcast_to(
        lt_ref[...][:, :1] * scale_t + jnp.sum(et, axis=1, keepdims=True),
        lt_ref.shape)
    # the cross term accumulates exp(t - m_t) * s; padded columns carry
    # et == 0 but s == NEG_INF there -> force the product to 0, not NaN
    cross = jnp.sum(jnp.where(kmask, et * s, 0.0), axis=1, keepdims=True)
    ats_ref[...] = jnp.broadcast_to(
        ats_ref[...][:, :1] * scale_t + cross, ats_ref.shape)
    mt_ref[...] = jnp.broadcast_to(m_t, mt_ref.shape)

    @pl.when(k == nk - 1)
    def _():
        l_s = jnp.maximum(ls_ref[...][:, :1], 1e-30)
        l_t = jnp.maximum(lt_ref[...][:, :1], 1e-30)
        lse_s = ms_ref[...][:, :1] + jnp.log(l_s)
        lse_t = mt_ref[...][:, :1] + jnp.log(l_t)
        ce = lse_s - ats_ref[...][:, :1] / l_t
        ce_ref[...] = jnp.broadcast_to(ce, ce_ref.shape)
        lses_ref[...] = jnp.broadcast_to(lse_s, lses_ref.shape)
        lset_ref[...] = jnp.broadcast_to(lse_t, lset_ref.shape)


def _dxs_kernel(tt_ref, xs_ref, ws_ref, xt_ref, wt_ref, c_ref, kmask_ref,
                lses_ref, lset_ref, g_ref, dxs_ref, *, inv_ts, nk):
    k = pl.program_id(1)
    tt = tt_ref[0, 0]
    s, t = _logit_blocks(xs_ref[...], ws_ref[...], xt_ref[...], wt_ref[...],
                         c_ref[...], inv_ts, tt)
    kmask = kmask_ref[...] > 0
    p_s = jnp.where(kmask, jnp.exp(s - lses_ref[...][:, :1]), 0.0)
    p_t = jnp.where(kmask, jnp.exp(t - lset_ref[...][:, :1]), 0.0)
    ds = (g_ref[...][:, :1] * (p_s - p_t) * inv_ts).astype(xs_ref.dtype)

    @pl.when(k == 0)
    def _():
        dxs_ref[...] = jnp.zeros_like(dxs_ref)

    dxs_ref[...] += jax.lax.dot_general(
        ds, ws_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dxs_ref.dtype)


def _dws_kernel(tt_ref, xs_ref, ws_ref, xt_ref, wt_ref, c_ref, kmask_ref,
                lses_ref, lset_ref, g_ref, dws_ref, *, inv_ts, nr):
    r = pl.program_id(1)
    tt = tt_ref[0, 0]
    s, t = _logit_blocks(xs_ref[...], ws_ref[...], xt_ref[...], wt_ref[...],
                         c_ref[...], inv_ts, tt)
    kmask = kmask_ref[...] > 0
    p_s = jnp.where(kmask, jnp.exp(s - lses_ref[...][:, :1]), 0.0)
    p_t = jnp.where(kmask, jnp.exp(t - lset_ref[...][:, :1]), 0.0)
    ds = (g_ref[...][:, :1] * (p_s - p_t) * inv_ts).astype(xs_ref.dtype)
    dws = jax.lax.dot_general(
        xs_ref[...], ds, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # [D, BK]

    @pl.when(r == 0)
    def _():
        dws_ref[...] = dws.astype(dws_ref.dtype)

    @pl.when(r != 0)
    def _():
        dws_ref[...] += dws.astype(dws_ref.dtype)


def _common_specs(rp, dp, kp):
    br, bk = min(_BR, rp), min(_BK, kp)
    return br, bk, [
        pl.BlockSpec(memory_space=pltpu.SMEM),                    # tau_t
        pl.BlockSpec((br, dp), lambda i, k: (i, 0),
                     memory_space=pltpu.VMEM),                    # xs
        pl.BlockSpec((dp, bk), lambda i, k: (0, k),
                     memory_space=pltpu.VMEM),                    # ws
        pl.BlockSpec((br, dp), lambda i, k: (i, 0),
                     memory_space=pltpu.VMEM),                    # xt
        pl.BlockSpec((dp, bk), lambda i, k: (0, k),
                     memory_space=pltpu.VMEM),                    # wt
        pl.BlockSpec((1, bk), lambda i, k: (0, k),
                     memory_space=pltpu.VMEM),                    # center
        pl.BlockSpec((1, bk), lambda i, k: (0, k),
                     memory_space=pltpu.VMEM),                    # kmask
    ]


def _prep(xs, ws, xt, wt, center, k_real):
    """Pad rows/cols to tile multiples; build the prototype-column mask."""
    R, D = xs.shape
    K = ws.shape[1]
    rp = _pad_to(max(R, 8), 8)
    if rp > _BR:                       # grid tiles must divide the padding
        rp = _pad_to(rp, _BR)
    kp = _pad_to(K, 128)
    if kp > _BK:
        kp = _pad_to(kp, _BK)
    dp = _pad_to(D, 128)
    xs = _row_pad(xs, rp)
    xt = _row_pad(xt, rp)
    if dp != D:
        xs = jnp.pad(xs, ((0, 0), (0, dp - D)))
        xt = jnp.pad(xt, ((0, 0), (0, dp - D)))
        ws = jnp.pad(ws, ((0, dp - D), (0, 0)))
        wt = jnp.pad(wt, ((0, dp - D), (0, 0)))
    if kp != K:
        ws = jnp.pad(ws, ((0, 0), (0, kp - K)))
        wt = jnp.pad(wt, ((0, 0), (0, kp - K)))
        center = jnp.pad(center.reshape(1, -1), ((0, 0), (0, kp - K)))
    center = center.reshape(1, kp).astype(jnp.float32)
    kmask = (jnp.arange(kp, dtype=jnp.int32) < k_real).reshape(1, kp)
    return (xs.astype(jnp.bfloat16), ws.astype(jnp.bfloat16),
            xt.astype(jnp.bfloat16), wt.astype(jnp.bfloat16),
            center, kmask.astype(jnp.int32), rp, dp, kp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def proto_ce(xs, ws, xt, wt, center, teacher_temp, student_temp):
    """Per-row prototype CE [R] f32.

    ``xs``/``xt`` [R, D] are the L2-normalised head bottlenecks (student /
    teacher), ``ws``/``wt`` [D, K] the weight-normalised last layers,
    ``center`` [K] the teacher center, ``teacher_temp`` a traced scalar,
    ``student_temp`` a static float.  Differentiable in (xs, ws) only —
    the caller stop-gradients the teacher side.
    """
    ce, _ = _proto_ce_fwd(xs, ws, xt, wt, center, teacher_temp,
                          student_temp)
    return ce


def _proto_ce_fwd(xs, ws, xt, wt, center, teacher_temp, student_temp):
    R = xs.shape[0]
    K = ws.shape[1]
    xs_p, ws_p, xt_p, wt_p, c_p, kmask, rp, dp, kp = _prep(
        xs, ws, xt, wt, center, K)
    tt = jnp.asarray(teacher_temp, jnp.float32).reshape(1, 1)
    br, bk, in_specs = _common_specs(rp, dp, kp)
    nk = kp // bk
    kern = functools.partial(_fwd_kernel, inv_ts=1.0 / student_temp, nk=nk)
    stat = jax.ShapeDtypeStruct((rp, 128), jnp.float32)
    ce, lse_s, lse_t = pl.pallas_call(
        kern,
        out_shape=(stat, stat, stat),
        grid=(rp // br, nk),
        in_specs=in_specs,
        out_specs=tuple(
            pl.BlockSpec((br, 128), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM) for _ in range(3)),
        scratch_shapes=[pltpu.VMEM((br, 128), jnp.float32)
                        for _ in range(5)],
        cost_estimate=pl.CostEstimate(
            flops=2 * rp * dp * kp * 2,
            transcendentals=2 * rp * kp,
            bytes_accessed=2 * dp * kp * 2 + 4 * rp * dp * 2),
        interpret=INTERPRET,
    )(tt, xs_p, ws_p, xt_p, wt_p, c_p, kmask)
    res = (xs, ws, xt, wt, center, teacher_temp, lse_s, lse_t)
    return ce[:R, 0], res


def _proto_ce_bwd(student_temp, res, g):
    xs, ws, xt, wt, center, teacher_temp, lse_s, lse_t = res
    R, D = xs.shape
    K = ws.shape[1]
    xs_p, ws_p, xt_p, wt_p, c_p, kmask, rp, dp, kp = _prep(
        xs, ws, xt, wt, center, K)
    tt = jnp.asarray(teacher_temp, jnp.float32).reshape(1, 1)
    br, bk, in_specs = _common_specs(rp, dp, kp)
    nk, nr = kp // bk, rp // br
    # stats and the cotangent ride as 128-lane tiles (value in column 0,
    # broadcast across lanes — narrow 1-lane blocks fight the (8, 128)
    # f32 tiling)
    g_p = jnp.broadcast_to(
        _row_pad(g.reshape(R, 1).astype(jnp.float32), rp), (rp, 128))
    lse_s_p, lse_t_p = lse_s, lse_t                # [rp, 128] from fwd
    stat_spec = pl.BlockSpec((br, 128), lambda i, k: (i, 0),
                             memory_space=pltpu.VMEM)
    common = in_specs + [stat_spec, stat_spec, stat_spec]

    dxs = pl.pallas_call(
        functools.partial(_dxs_kernel, inv_ts=1.0 / student_temp, nk=nk),
        out_shape=jax.ShapeDtypeStruct((rp, dp), jnp.float32),
        grid=(nr, nk),
        in_specs=common,
        out_specs=pl.BlockSpec((br, dp), lambda i, k: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * rp * dp * kp * 3, transcendentals=2 * rp * kp,
            bytes_accessed=2 * dp * kp * 2 + 4 * rp * dp * 2),
        interpret=INTERPRET,
    )(tt, xs_p, ws_p, xt_p, wt_p, c_p, kmask, lse_s_p, lse_t_p, g_p)

    # dWs: same streaming with the grid transposed (K outer, rows inner)
    # so the [D, BK] accumulator block is revisited contiguously
    dws_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((br, dp), lambda k, i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((dp, bk), lambda k, i: (0, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((br, dp), lambda k, i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((dp, bk), lambda k, i: (0, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk), lambda k, i: (0, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk), lambda k, i: (0, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((br, 128), lambda k, i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((br, 128), lambda k, i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((br, 128), lambda k, i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    dws = pl.pallas_call(
        functools.partial(_dws_kernel, inv_ts=1.0 / student_temp, nr=nr),
        out_shape=jax.ShapeDtypeStruct((dp, kp), jnp.float32),
        grid=(nk, nr),
        in_specs=dws_specs,
        out_specs=pl.BlockSpec((dp, bk), lambda k, i: (0, k),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * rp * dp * kp * 3, transcendentals=2 * rp * kp,
            bytes_accessed=2 * dp * kp * 2 + 4 * rp * dp * 2),
        interpret=INTERPRET,
    )(tt, xs_p, ws_p, xt_p, wt_p, c_p, kmask, lse_s_p, lse_t_p, g_p)

    dxs = dxs[:R, :D].astype(xs.dtype)
    dws = dws[:D, :K].astype(ws.dtype)
    z = lambda a: jnp.zeros_like(a)  # teacher side: stop-grad at the caller
    return (dxs, dws, z(xt), z(wt), z(center),
            jnp.zeros_like(jnp.asarray(teacher_temp)))


proto_ce.defvjp(_proto_ce_fwd, _proto_ce_bwd)


def proto_ce_available() -> bool:
    from .flash_attention import _on_tpu
    return INTERPRET or _on_tpu()
