"""Long-sequence fused APLA attention (VERDICT r4 item 7): the @518 regime
(N=1370) where the monolithic kernel's [Np, Np] score matrix cannot live in
VMEM (`fused_fits` declines), but a whole image's PACKED qkv still can
(ViT-B @518: 1408 x 2304 bf16 = 6.2 MB).

Reference semantics: identical to `pallas_apla_attn.fused_apla_attention`
(src/apla/appla_attn.py:50-83 — attention + partial-trainable output
projection); only the schedule differs:

  forward   grid (B, nQ): the image's qkv is VMEM-resident across the
            inner q-block sweep; per head, a [Bq, Np] score strip is
            softmaxed IN ONE PASS (full rows available — no online
            rescaling) and o = p v accumulates into the [Bq, C] strip that
            feeds the in-kernel APLA projection.  Row logsumexp stats are
            emitted for backward.
  backward  dO = g W^T is a plain XLA matmul (full MXU rate, shared by
            both kernels), then
            kernel A, grid (B, nQ):  recompute p from (qkv, lse); emit
              dq strips and accumulate dW_t = o^T g_t across the grid —
              the frozen [C, C] gradient never exists (APLA).  Also emits
              delta_i = sum_c dO_ic o_ic (the flash-backward row term).
            kernel B, grid (B, nKV): recompute p^T column strips from the
              same stats; dk_j = ds^T q, dv_j = p^T dO.

Padding: N pads to a multiple of the q-block (1370 -> 1408 at Bq=128,
+2.8%); padded COLUMNS are masked out of every softmax, padded ROWS carry
zero cotangents (g is zero-padded) so their garbage p rows contribute
nothing to dv/dk/dW_t.

Used automatically by `ops/attention.apla_attention` when
`use_fused_apla` is on and the sequence is beyond the monolithic
kernel's VMEM envelope (`long_fused_ok`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_apla_attn import (NEG_INF, _assemble, _pad_to, _vmem_budget,
                               in_accum_scan)

# flipped by tests to run in the Pallas interpreter off-TPU (kept in sync
# with pallas_apla_attn.INTERPRET by the shared test fixture)
INTERPRET = False

# q/kv strip depth: 128 rows keeps padding low (1370 -> 1408, +2.8%) and
# the per-head [Bq, Np] f32 score strip at 0.7 MB
_BQ = 128


def _bq() -> int:
    import os
    return int(os.environ.get("APLA_FUSED_LONG_BQ", _BQ))


def _fwd_bytes(bq: int, np_: int, c: int) -> int:
    # whole-image qkv + W + 2 live f32 score strips + o_cat f32 + out strip
    return np_ * 3 * c * 2 + c * c * 2 + 2 * bq * np_ * 4 \
        + bq * c * 4 + bq * c * 2


def _bwda_bytes(bq: int, np_: int, c: int, kp: int) -> int:
    # qkv + dO strip + g_t strip + 4 live score strips + dwt + o_cat + dq
    return np_ * 3 * c * 2 + bq * c * 2 + bq * kp * 2 \
        + 4 * bq * np_ * 4 + c * kp * 4 + bq * c * 4 + bq * c * 2


def _bwdb_bytes(bk: int, np_: int, c: int) -> int:
    # qkv + whole dO + 4 live transposed score strips + dkv strip + stats
    return np_ * 3 * c * 2 + np_ * c * 2 + 4 * bk * np_ * 4 \
        + bk * 2 * c * 2 + 2 * np_ * 4


def long_fused_ok(n: int, c: int, k: int = 128, b: int | None = None) -> bool:
    """Geometry admission: every phase's working set fits the VMEM budget
    at the configured strip depth.  APLA_FUSED_LONG=0 disables (the
    measurement control).

    Inside an accum microbatch scan (`accum_scan_trace`), micro-batches
    beyond the hardware-validated bound fall back to XLA: @518 ViT-B the
    kernel compiles monolithic b8 and accum micro-b4 but accum micro-b8
    aborts the remote compiler (r5_long_fused.jsonl long_b16a2) — the
    scoped-VMEM staging pathology, which must never be reachable from a
    training job."""
    import os
    if os.environ.get("APLA_FUSED_LONG", "1") == "0":
        return False
    if b is not None and in_accum_scan():
        bmax = int(os.environ.get("APLA_FUSED_LONG_ACCUM_BMAX", 4))
        if b > bmax:
            return False
    bq = _bq()
    np_ = _pad_to(n, bq)
    kp = _pad_to(min(k, c), 128)
    budget = _vmem_budget()
    return (_fwd_bytes(bq, np_, c) <= budget
            and _bwda_bytes(bq, np_, c, kp) <= budget
            and _bwdb_bytes(bq, np_, c) <= budget)


def _q_strip(qkv_ref, i, bq, h, Dh, C):
    return qkv_ref[0, pl.ds(i * bq, bq), h * Dh:(h + 1) * Dh]


def _fwd_kernel(qkv_ref, w_ref, o_ref, lse_ref, *, H, Dh, scale, n_real,
                bq):
    C = H * Dh
    i = pl.program_id(1)
    np_ = qkv_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, np_), 1)
    valid = col < n_real
    outs = []
    for h in range(H):
        q = _q_strip(qkv_ref, i, bq, h, Dh, C)
        k = qkv_ref[0, :, C + h * Dh:C + (h + 1) * Dh]
        v = qkv_ref[0, :, 2 * C + h * Dh:2 * C + (h + 1) * Dh]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale     # [Bq, Np]
        s = jnp.where(valid, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        lse_ref[0, h] = (m + jnp.log(l))[:, 0]
        p = (e / l).astype(qkv_ref.dtype)
        outs.append(jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    o_cat = jnp.concatenate(outs, axis=1).astype(qkv_ref.dtype)  # [Bq, C]
    proj = jax.lax.dot_general(
        o_cat, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = proj.astype(o_ref.dtype)


def _bwda_kernel(qkv_ref, do_ref, gt_ref, lse_ref, dq_ref, dwt_ref,
                 delta_ref, *, H, Dh, scale, n_real, bq):
    C = H * Dh
    i = pl.program_id(1)
    np_ = qkv_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, np_), 1)
    valid = col < n_real
    dO_cat = do_ref[0]                                      # [Bq, C] bf16
    os_, dqs = [], []
    for h in range(H):
        q = _q_strip(qkv_ref, i, bq, h, Dh, C)
        k = qkv_ref[0, :, C + h * Dh:C + (h + 1) * Dh]
        v = qkv_ref[0, :, 2 * C + h * Dh:2 * C + (h + 1) * Dh]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = jnp.where(valid, s, NEG_INF)
        p = jnp.exp(s - lse_ref[0, h][:, None])             # [Bq, Np] f32
        pb = p.astype(qkv_ref.dtype)
        dO = dO_cat[:, h * Dh:(h + 1) * Dh]
        o = jax.lax.dot_general(pb, v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        os_.append(o.astype(qkv_ref.dtype))
        dp = jax.lax.dot_general(dO, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        delta = jnp.sum(dO.astype(jnp.float32) * o, axis=-1,
                        keepdims=True)                       # [Bq, 1]
        delta_ref[0, h] = delta[:, 0]
        ds = (p * (dp - delta) * scale).astype(qkv_ref.dtype)
        dqs.append(jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    dq_ref[0] = jnp.concatenate(
        [a.astype(dq_ref.dtype) for a in dqs], axis=1)
    o_cat = jnp.concatenate(os_, axis=1)                     # [Bq, C] bf16
    dwt = jax.lax.dot_general(
        o_cat, gt_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [C, Kp]

    first = jnp.logical_and(pl.program_id(0) == 0, i == 0)

    @pl.when(first)
    def _():
        dwt_ref[...] = dwt

    @pl.when(jnp.logical_not(first))
    def _():
        dwt_ref[...] += dwt


def _bwdb_kernel(qkv_ref, do_ref, lse_ref, delta_ref, dkv_ref, *,
                 H, Dh, scale, n_real, bk):
    C = H * Dh
    j = pl.program_id(1)
    dO_all = do_ref[0]                                      # [Np, C] bf16
    dks, dvs = [], []
    for h in range(H):
        q = qkv_ref[0, :, h * Dh:(h + 1) * Dh]              # [Np, Dh]
        k = qkv_ref[0, pl.ds(j * bk, bk), C + h * Dh:C + (h + 1) * Dh]
        v = qkv_ref[0, pl.ds(j * bk, bk), 2 * C + h * Dh:2 * C + (h + 1) * Dh]
        sT = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # [Bk, Np]
        # kv rows beyond n_real produce garbage strips that are sliced off
        # on unpad; q columns are all real rows (padded rows have dO = 0)
        pT = jnp.exp(sT - lse_ref[0, h][None, :])
        pTb = pT.astype(qkv_ref.dtype)
        dO = dO_all[:, h * Dh:(h + 1) * Dh]                  # [Np, Dh]
        dvs.append(jax.lax.dot_general(
            pTb, dO, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        dpT = jax.lax.dot_general(v, dO, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dsT = (pT * (dpT - delta_ref[0, h][None, :]) * scale)
        dks.append(jax.lax.dot_general(
            dsT.astype(qkv_ref.dtype), q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    dkv_ref[0] = jnp.concatenate(
        [a.astype(dkv_ref.dtype) for a in dks + dvs], axis=1)


def _grid_specs_stats(np_, H, strip, minor):
    return pl.BlockSpec((1, H, strip) if minor else (1, H, np_),
                        (lambda b, i: (b, 0, i)) if minor else
                        (lambda b, i: (b, 0, 0)),
                        memory_space=pltpu.VMEM)


def _call_fwd(qkv, w, H, Dh, scale, n_real):
    B, Np, C3 = qkv.shape
    C = C3 // 3
    bq = _bq()
    kern = functools.partial(_fwd_kernel, H=H, Dh=Dh, scale=scale,
                             n_real=n_real, bq=bq)
    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((B, Np, C), qkv.dtype),
            jax.ShapeDtypeStruct((B, H, Np), jnp.float32),
        ),
        grid=(B, Np // bq),
        in_specs=[
            pl.BlockSpec((1, Np, C3), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            _grid_specs_stats(Np, H, bq, True),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * Np * C * 2 + 2 * B * Np * C * C,
            transcendentals=B * H * Np * Np,
            bytes_accessed=(B * Np * C3 + B * Np * C + C * C) * 2),
        interpret=INTERPRET,
    )(qkv, w)


def _call_bwda(qkv, dO, g_t, lse, H, Dh, scale, n_real):
    B, Np, C3 = qkv.shape
    C = C3 // 3
    Kp = g_t.shape[-1]
    bq = _bq()
    kern = functools.partial(_bwda_kernel, H=H, Dh=Dh, scale=scale,
                             n_real=n_real, bq=bq)
    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((B, Np, C), qkv.dtype),
            jax.ShapeDtypeStruct((C, Kp), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Np), jnp.float32),
        ),
        grid=(B, Np // bq),
        in_specs=[
            pl.BlockSpec((1, Np, C3), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, Kp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            _grid_specs_stats(Np, H, bq, True),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Kp), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            _grid_specs_stats(Np, H, bq, True),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * Np * C * 3 + 2 * B * Np * C * Kp,
            transcendentals=B * H * Np * Np,
            bytes_accessed=(B * Np * C3 * 2 + C * Kp) * 2),
        interpret=INTERPRET,
    )(qkv, dO, g_t, lse)


def _call_bwdb(qkv, dO, lse, delta, H, Dh, scale, n_real):
    B, Np, C3 = qkv.shape
    C = C3 // 3
    bk = _bq()
    kern = functools.partial(_bwdb_kernel, H=H, Dh=Dh, scale=scale,
                             n_real=n_real, bk=bk)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, Np, 2 * C), qkv.dtype),
        grid=(B, Np // bk),
        in_specs=[
            pl.BlockSpec((1, Np, C3), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np, C), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            _grid_specs_stats(Np, H, bk, False),
            _grid_specs_stats(Np, H, bk, False),
        ],
        out_specs=pl.BlockSpec((1, bk, 2 * C), lambda b, j: (b, j, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * Np * C * 3,
            transcendentals=B * H * Np * Np,
            bytes_accessed=(B * Np * C3 * 2) * 2),
        interpret=INTERPRET,
    )(qkv, dO, lse, delta)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_apla_attention_long(qkv, w_t, b_t, w_frozen, b_frozen, inds,
                              num_heads, scale):
    """Same contract as `fused_apla_attention` (qkv [B, N, 3C] ->
    [B, N, C]; differentiable in qkv/w_t/b_t) for sequences beyond the
    monolithic kernel's VMEM envelope."""
    out, _ = _long_fwd(qkv, w_t, b_t, w_frozen, b_frozen, inds,
                       num_heads, scale)
    return out


def _long_fwd(qkv, w_t, b_t, w_frozen, b_frozen, inds, num_heads, scale):
    B, N, C3 = qkv.shape
    C = C3 // 3
    Dh = C // num_heads
    Np = _pad_to(N, _bq())
    w, b = _assemble(w_t, b_t, w_frozen, b_frozen, inds)
    qkv_p = jnp.pad(qkv, ((0, 0), (0, Np - N), (0, 0))) if Np != N else qkv
    out, lse = _call_fwd(qkv_p, w.astype(qkv.dtype), num_heads, Dh,
                         float(scale), N)
    out = out[:, :N] + b.astype(out.dtype)
    return out, (qkv_p, w, lse, inds, w_t, b_t)


def _long_bwd(num_heads, scale, res, g):
    qkv_p, w, lse, inds, w_t_tpl, b_t_tpl = res
    k, bt_dtype, wt_dtype = w_t_tpl.shape[-1], b_t_tpl.dtype, w_t_tpl.dtype
    B, Np, C3 = qkv_p.shape
    C = C3 // 3
    Dh = C // num_heads
    N = g.shape[1]
    g_p = jnp.pad(g, ((0, 0), (0, Np - N), (0, 0))) if Np != N else g
    # dO at full MXU rate in XLA, shared by both kernels (same operand
    # precision as the in-kernel path: the activation dtype)
    dO = jnp.dot(g_p.astype(qkv_p.dtype), w.T.astype(qkv_p.dtype),
                 preferred_element_type=jnp.float32).astype(qkv_p.dtype)
    g_t = jnp.take(g_p, inds, axis=-1)
    Kp = _pad_to(k, 128)
    if Kp != k:
        g_t = jnp.pad(g_t, ((0, 0), (0, 0), (0, Kp - k)))
    dq, dwt, delta = _call_bwda(qkv_p, dO, g_t.astype(qkv_p.dtype), lse,
                                num_heads, Dh, float(scale), N)
    dkv = _call_bwdb(qkv_p, dO, lse, delta, num_heads, Dh, float(scale), N)
    dqkv = jnp.concatenate([dq, dkv], axis=-1)[:, :N]
    dw_t = dwt[:, :k].astype(wt_dtype)
    db_t = jnp.sum(jnp.take(g, inds, axis=-1).astype(jnp.float32),
                   axis=(0, 1)).astype(bt_dtype)
    return dqkv, dw_t, db_t, None, None, None


fused_apla_attention_long.defvjp(_long_fwd, _long_bwd)
