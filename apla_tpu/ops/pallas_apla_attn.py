"""Fused APLA attention: softmax(QK^T)V + partial-trainable out-projection
in ONE Pallas kernel (the BASELINE.json "north-star" kernel).

Reference semantics: `src/apla/appla_attn.py:50-83` — attention followed by
an output projection whose `partial_size` output-channels are trainable.
The separate-ops path (`ops/attention.py` + `ops/apla_proj.py`) materialises
the [B, N, C] attention output in HBM between the two; this kernel keeps it
in VMEM:

  forward  (grid over B): per head h — s = q_h k_h^T, p = softmax(s),
            o_h = p v_h — all resident in VMEM; the concatenated [N, C]
            attention output feeds the assembled projection kernel W
            ([C, C], trainable columns scattered in) WITHOUT leaving the
            chip.  Only the projected [N, C] result is written to HBM.
  backward (grid over B): recomputes s/p per head (flash-style), computes
            dO = g W^T once, per-head dq/dk/dv, and ACCUMULATES
            dW_t = o^T g[:, inds] across the batch grid — the frozen
            [C, C] weight gradient never exists, and the trainable-slice
            gradient costs O(N·C·k) instead of O(N·C²).

Layout: the kernel consumes the packed qkv activation [B, N, 3C] exactly as
the (frozen) qkv matmul produces it — no [B,N,H,D] -> [B*H,N,D] transposes
on the hot path (the round-2 kernel's integrated tax, BASELINE.md).  N is
padded to the bf16 sublane multiple (16): 257 -> 272, not 384.

Used via `ViTConfig(use_fused_apla=True)`.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)

# flipped by tests to run in the Pallas interpreter off-TPU
INTERPRET = False

# Trace-scoped marker: the gradient-accumulation builders wrap their
# microbatch scan bodies in `accum_scan_trace()` so kernel admission can
# tell an accum micro-step apart from a monolithic step of the same batch
# size.  The distinction is load-bearing for the scoped-VMEM staging
# pathology (round 3: XLA stages remat-saved qkv in scoped VMEM adjacent
# to the kernel inside a scan): @518 the long kernel compiles monolithic
# b8 but CRASHES the compiler at accum micro-b8 (r5_long_fused.jsonl
# long_b16a2), while accum micro-b4 is fine — batch size alone cannot
# separate the two.
import contextlib as _contextlib
import contextvars as _contextvars

_ACCUM_SCAN = _contextvars.ContextVar("apla_accum_scan", default=False)


@_contextlib.contextmanager
def accum_scan_trace():
    """Mark the enclosed trace as running inside an accum microbatch scan."""
    tok = _ACCUM_SCAN.set(True)
    try:
        yield
    finally:
        _ACCUM_SCAN.reset(tok)


def in_accum_scan() -> bool:
    return _ACCUM_SCAN.get()


def _pad_to(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def _masked_softmax(s, n_real, seg=0):
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 1)
    valid = col < n_real
    if seg:
        # block-diagonal: packed crops attend only within their segment
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 2)
        valid &= (col // seg) == (row // seg)
    s = jnp.where(valid, s, NEG_INF)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _heads(qkv_b, h, C, Dh):
    """Slice head h's q, k, v ([BB, Np, Dh] each) out of the packed
    [BB, Np, 3C] activation (static lane slices at Dh granularity)."""
    q = qkv_b[:, :, h * Dh:(h + 1) * Dh]
    k = qkv_b[:, :, C + h * Dh:C + (h + 1) * Dh]
    v = qkv_b[:, :, 2 * C + h * Dh:2 * C + (h + 1) * Dh]
    return q, k, v


# batched dims: operand batch on axis 0, contraction per the comment
_B_NT = (((2,), (2,)), ((0,), (0,)))   # [BB,N,D] x [BB,M,D] -> [BB,N,M]
_B_NN = (((2,), (1,)), ((0,), (0,)))   # [BB,N,M] x [BB,M,D] -> [BB,N,D]
_B_TN = (((1,), (1,)), ((0,), (0,)))   # [BB,M,N]^T-style contraction


def _fwd_kernel(qkv_ref, w_ref, o_ref, *, H, Dh, scale, n_real, seg,
                bias_ref=None, mask_ref=None):
    """Shared forward body.  bias_ref/mask_ref (the Swin variant) are
    STATIC kwargs — when None the generated kernel is bit-identical to the
    plain hardware-validated one (no extra refs, no dead adds)."""
    C = H * Dh
    qkv_b = qkv_ref[...]                     # [BB, Np, 3C] bf16
    mask = mask_ref[...] if mask_ref is not None else None  # [BB, Np, Np]
    outs = []
    for h in range(H):
        q, k, v = _heads(qkv_b, h, C, Dh)
        s = jax.lax.dot_general(
            q, k, _B_NT,
            preferred_element_type=jnp.float32) * scale  # [BB, Np, Np] f32
        if bias_ref is not None:
            s = s + bias_ref[h][None] + mask
        p = _masked_softmax(s, n_real, seg).astype(qkv_b.dtype)
        outs.append(jax.lax.dot_general(
            p, v, _B_NN, preferred_element_type=jnp.float32))
    o_cat = jnp.concatenate(outs, axis=2).astype(qkv_b.dtype)  # [BB, Np, C]
    proj = jax.lax.dot_general(
        o_cat, w_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                    # [BB, Np, C]
    o_ref[...] = proj.astype(o_ref.dtype)


def _bwd_kernel(qkv_ref, w_ref, g_ref, gt_ref, dqkv_ref, dwt_ref, *,
                H, Dh, scale, n_real, seg, bias_ref=None, mask_ref=None):
    C = H * Dh
    qkv_b = qkv_ref[...]                     # [BB, Np, 3C] bf16
    g = g_ref[...]                           # [BB, Np, C]  bf16
    g_t = gt_ref[...]                        # [BB, Np, Kp] bf16
    mask = mask_ref[...] if mask_ref is not None else None
    # dO for every head at once: [BB, Np, C] = g @ W^T
    dO_cat = jax.lax.dot_general(
        g, w_ref[...], (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(qkv_b.dtype)

    dqs, dks, dvs, os_ = [], [], [], []
    for h in range(H):
        q, k, v = _heads(qkv_b, h, C, Dh)
        dO = dO_cat[:, :, h * Dh:(h + 1) * Dh]
        s = jax.lax.dot_general(
            q, k, _B_NT,
            preferred_element_type=jnp.float32) * scale
        if bias_ref is not None:
            s = s + bias_ref[h][None] + mask
        p = _masked_softmax(s, n_real, seg)              # [BB, Np, Np] f32
        pb = p.astype(qkv_b.dtype)
        o = jax.lax.dot_general(pb, v, _B_NN,
                                preferred_element_type=jnp.float32)
        os_.append(o.astype(qkv_b.dtype))
        dv = jax.lax.dot_general(pb, dO, _B_TN,
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(dO, v, _B_NT,
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = (ds * scale).astype(qkv_b.dtype)
        dqs.append(jax.lax.dot_general(
            ds, k, _B_NN, preferred_element_type=jnp.float32))
        dks.append(jax.lax.dot_general(
            ds, q, _B_TN, preferred_element_type=jnp.float32))
        dvs.append(dv)
    dqkv = jnp.concatenate(
        [a.astype(dqkv_ref.dtype) for a in dqs + dks + dvs], axis=2)
    dqkv_ref[...] = dqkv                                 # [BB, Np, 3C]

    o_cat = jnp.concatenate(os_, axis=2)                 # [BB, Np, C] bf16
    # Mosaic matmul takes a single contraction dim: flatten (BB, Np) first
    o2 = o_cat.reshape(-1, C)
    g2 = g_t.reshape(-1, g_t.shape[-1])
    dwt = jax.lax.dot_general(
        o2, g2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [C, Kp]

    @pl.when(pl.program_id(0) == 0)
    def _():
        dwt_ref[...] = dwt

    @pl.when(pl.program_id(0) != 0)
    def _():
        dwt_ref[...] += dwt


# ---- biased variant (Swin windows): per-head relative-position bias
# [H, Np, Np] + per-window additive shift mask sliced from [M, Np, Np]
# (M = lcm(n_windows, BB) tiles of the classic Swin region mask; both are
# FROZEN under APLA — apla_swin_transformer.py:25-39 trains only attn.proj
# — so neither needs a cotangent).  Thin ref-reordering wrappers over the
# shared kernel bodies above: the softmax-backward math lives in exactly
# one place. ------------------------------------------------------------ #

def _fwd_kernel_bias(qkv_ref, w_ref, bias_ref, mask_ref, o_ref, *,
                     H, Dh, scale, n_real):
    _fwd_kernel(qkv_ref, w_ref, o_ref, H=H, Dh=Dh, scale=scale,
                n_real=n_real, seg=0, bias_ref=bias_ref, mask_ref=mask_ref)


def _bwd_kernel_bias(qkv_ref, w_ref, bias_ref, mask_ref, g_ref, gt_ref,
                     dqkv_ref, dwt_ref, *, H, Dh, scale, n_real):
    _bwd_kernel(qkv_ref, w_ref, g_ref, gt_ref, dqkv_ref, dwt_ref,
                H=H, Dh=Dh, scale=scale, n_real=n_real, seg=0,
                bias_ref=bias_ref, mask_ref=mask_ref)


def _pick_bb(b: int, requested: int) -> int:
    bb = max(1, requested)
    while b % bb:
        bb -= 1
    return bb


def _env_bb(name: str, default: int) -> int:
    import os
    return int(os.environ.get(name, default))


# VMEM working-set models (bytes; bf16 data, f32 score chain).  The budget
# leaves headroom under the 16 MB/core VMEM for Mosaic's own buffers.
# APLA_FUSED_VMEM_MB overrides (ViT-giant's bwd model is ~13.4 MB — only
# ~12% over the default budget; the override lets hardware arbitrate).
_VMEM_BUDGET = 12 * 2 ** 20


def _vmem_budget() -> int:
    import os
    mb = os.environ.get("APLA_FUSED_VMEM_MB")
    return int(float(mb) * 2 ** 20) if mb else _VMEM_BUDGET


def _fwd_bytes(bb: int, np_: int, c: int) -> int:
    # qkv block + o_cat/out + one live f32 score matrix + proj weight
    return bb * (np_ * 3 * c * 2 + 2 * np_ * c * 4 + 2 * np_ * np_ * 4) \
        + c * c * 2


def _bwd_bytes(bb: int, np_: int, c: int, kp: int) -> int:
    # qkv + dqkv + g + dO + g_t + up to 4 live f32 score-shaped buffers
    # (p, dp, ds and a cast temp) + weights/dwt
    return bb * (2 * np_ * 3 * c * 2 + 2 * np_ * c * 2 + np_ * kp * 2
                 + 4 * np_ * np_ * 4) + c * c * 2 + c * kp * 4


# Empirical v5e regime rule (r3_fused_attn.jsonl): at batch >= 16 XLA
# stages the whole remat-saved qkv operand in scoped VMEM next to the
# kernel ("scoped allocation 20-22M > 16M" compile failures at micro-b16+
# and monolithic b32+ with BB>=2), so large batches must run conservative
# block sizes.  micro-b8 with fwd BB 2 / bwd BB 2 is the measured champion
# (937.5 img/s, +9% over XLA).
_STAGING_SAFE_B = 8

# Below this padded sequence length the N=272 envelope above does not
# apply: per-image VMEM blocks are ~18x smaller, so MANY images must share
# one grid step or per-step work is too small to amortise Pallas overhead
# (the round-3 20x loss at the DINOv2 50-token local crops ran BB<=2).
# The small-N policy folds crops x images into the batch-grid dimension
# (VERDICT r3 item 7) and is VMEM-capped, not envelope-capped.
_SMALL_NP = 128


def _cap_bb(bb: int, b: int, bytes_fn) -> int:
    bb = _pick_bb(b, bb)
    while bb > 1 and bytes_fn(bb) > _vmem_budget():
        bb = _pick_bb(b, bb - 1)
    return bb


# Largest TOTAL folded batch ever Mosaic-compiled in the small-N regime
# (r4_smalln_attn: DINOv2 b8/b16 locals arrive as B=64/128).  The scoped-
# VMEM staging failure (see _STAGING_SAFE_B) scales with the remat-saved
# qkv operand = the total batch, so an unvalidated larger batch must fall
# back to XLA instead of risking a compile abort mid-training (ADVICE r4).
# Raise via APLA_FUSED_SMALLN_BMAX only with hardware compile evidence.
_SMALL_B_MAX = 128


def _small_b_max() -> int:
    import os
    return int(os.environ.get("APLA_FUSED_SMALLN_BMAX", _SMALL_B_MAX))


# Fold depths ever compiled+measured on hardware in the small-N regime
# (r4_smalln_attn.jsonl ran 4 and 8; 1 and 2 are round 3's slow-but-valid
# dispatch).  Odd depths like 5/6/7 — reachable via divisibility for e.g.
# b=20 — were NEVER Mosaic-compiled; an unvalidated block shape must not
# be selectable, or a compile failure aborts the training job instead of
# falling back to XLA.
_SMALL_BB_LADDER = (8, 4, 2, 1)


def _cap_bb_small(bb: int, b: int, bytes_fn) -> int:
    for cand in _SMALL_BB_LADDER:
        if cand <= bb and b % cand == 0 and bytes_fn(cand) <= _vmem_budget():
            return cand
    return 1


def effective_bb_fwd(b: int, np_: int, c: int) -> int:
    """Images per FORWARD grid step — the single source of truth (the
    experiment harnesses log this instead of re-deriving the policy).
    At recipe N (272): only BB in {1, 2} has ever compiled on hardware;
    BB=3 shapes (batches divisible by 3) were never validated, so the
    ceiling is 2.  At small N (local crops): VMEM-capped, large BB from
    the validated ladder."""
    if np_ <= _SMALL_NP:
        return _cap_bb_small(_env_bb("APLA_FUSED_BB_FWD_SMALL", 8), b,
                             lambda bb: _fwd_bytes(bb, np_, c))
    return _cap_bb(min(_env_bb("APLA_FUSED_BB_FWD", 2), 2), b,
                   lambda bb: _fwd_bytes(bb, np_, c))


def effective_bb_bwd(b: int, np_: int, c: int, kp: int) -> int:
    if np_ <= _SMALL_NP:
        if b > _small_b_max():
            # deep folds above the validated total batch were never
            # compiled; BB=1 here makes small_n_fused_ok decline the
            # shape, so it runs XLA instead of risking a staging abort
            return 1
        return _cap_bb_small(_env_bb("APLA_FUSED_BB_BWD_SMALL", 8), b,
                             lambda bb: _bwd_bytes(bb, np_, c, kp))
    req = _env_bb("APLA_FUSED_BB_BWD", 2)
    if b != _STAGING_SAFE_B:
        # bwd BB=2 compiles only in the measured micro-b8 envelope; both
        # larger batches (a2/a4/monolithic) AND micro-b4 (accum 16) hit
        # the scoped-VMEM staging failure with BB=2 (see _STAGING_SAFE_B)
        req = 1
    return _cap_bb(req, b, lambda bb: _bwd_bytes(bb, np_, c, kp))


# Below this many tokens the kernel needs the small-N BB fold (many images
# per grid step) to amortise Pallas overhead — round 3's BB<=2 dispatch at
# the DINOv2 50-token local crops measured 7.1 img/s fused vs 141.2 XLA
# (r3_pack_dinov2.jsonl).  Static gate: sequence length is a Python int
# under jit.  Sequences below the gate are ADMITTED when the fold is deep
# enough (`small_n_fused_ok`); APLA_FUSED_MIN_N=0 force-admits everything.
FUSED_MIN_N = 128


def fused_min_n() -> int:
    import os
    return int(os.environ.get("APLA_FUSED_MIN_N", FUSED_MIN_N))


# Step-level wins were measured at BB>=4 only (r4_smalln_attn.jsonl: the
# full DINOv2 b8 step runs 159.1 img/s at BB=4 and 162.4 at BB=8 vs 150.4
# with locals on XLA); shallower folds were never step-validated, so they
# fall back to XLA.
_SMALL_BB_MIN = 4


def small_n_fused_ok(b: int, n: int, c: int, k: int = 128) -> bool:
    """Small-N admission: below FUSED_MIN_N the kernel wins only when the
    batch dimension folds >= _SMALL_BB_MIN images into each grid step in
    BOTH directions (DINOv2 local crops arrive as batch x n_crops images,
    so the fold is deep in the regime that matters).
    APLA_FUSED_SMALLN=0 disables the fold entirely (the round-3 gate
    behaviour — small sequences always fall back to XLA); used by the
    experiment harnesses as the measurement control."""
    import os
    if os.environ.get("APLA_FUSED_SMALLN", "1") == "0":
        return False
    np_ = _pad_to(n, 16)
    kp = _pad_to(min(k, c), 128)
    return (effective_bb_fwd(b, np_, c) >= _SMALL_BB_MIN
            and effective_bb_bwd(b, np_, c, kp) >= _SMALL_BB_MIN)


def fused_admitted(b: int, n: int, c: int, k: int = 128) -> bool:
    """The single fused-kernel admission predicate (ADVICE r4 #2): any
    sequence whose PADDED length lands in the small-N regime goes through
    the fold admission — even when ``n >= FUSED_MIN_N`` (N in 113..128 pads
    to 128 and routes to the small-N BB ladder, where a shallow fold is the
    round-3 20x dispatch).  ``APLA_FUSED_MIN_N=0`` force-admits everything
    (experiment harnesses pick BBs explicitly)."""
    if fused_min_n() == 0:
        return True
    if _pad_to(n, 16) <= _SMALL_NP:
        return small_n_fused_ok(b, n, c, k)
    return n >= fused_min_n()


def fused_available() -> bool:
    """The compiled kernel needs a TPU backend; interpret mode (tests)
    works anywhere.  Lets configs ship `use_fused_apla: true` without
    breaking CPU smoke runs (graceful fallback to the XLA path)."""
    from .flash_attention import _on_tpu
    return INTERPRET or _on_tpu()


def fused_dtype_ok(dtype) -> bool:
    """Every VMEM byte model and hardware compile ladder in this file (and
    the Swin/long variants) was calibrated with bf16 activations — every
    r3-r5 study ran bf16.  f32 doubles the real working set past the
    bisected Mosaic abort points (the Swin stage-3 bwd aborts at 26.16M >
    16M scoped VMEM at what the bf16 model scores ~13M), so an f32 request
    falls back to XLA instead of risking a mid-run compile abort.
    Interpret mode (tests) has no VMEM; APLA_FUSED_ALLOW_F32=1 lets
    compile-ladder experiments override."""
    import os
    if INTERPRET or os.environ.get("APLA_FUSED_ALLOW_F32") == "1":
        return True
    return jnp.dtype(dtype) == jnp.bfloat16


_WARNED_FALLBACKS: set[str] = set()


def warn_fused_fallback(reason: str) -> None:
    """One-line, once-per-reason notice when a `use_fused` request falls
    back to XLA (admission/dtype/VMEM decline).  Silent fallback cost a
    round-5 review finding: a user benchmarking `--use_fused` must not
    unknowingly measure the XLA path."""
    if reason not in _WARNED_FALLBACKS:
        _WARNED_FALLBACKS.add(reason)
        import sys
        print(f"[apla-fused] falling back to XLA attention: {reason}",
              file=sys.stderr)


def fused_fits(n: int, c: int, k: int = 128) -> bool:
    """Whether the fused kernel's BACKWARD fits VMEM at BB=1 for this
    geometry (its footprint is several times pallas_mha's per-head blocks —
    a ViT-B at N~512 would need ~20 MB; don't reuse fits_vmem here)."""
    np_ = _pad_to(n, 16)
    kp = _pad_to(min(k, c), 128)
    return _bwd_bytes(1, np_, c, kp) <= _vmem_budget()


def _call_fwd(qkv, w, H, Dh, scale, n_real, seg=0):
    B, Np, C3 = qkv.shape
    C = C3 // 3
    BB = effective_bb_fwd(B, Np, C)
    kern = functools.partial(_fwd_kernel, H=H, Dh=Dh, scale=scale,
                             n_real=n_real, seg=seg)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, Np, C), qkv.dtype),
        grid=(B // BB,),
        in_specs=[
            pl.BlockSpec((BB, Np, C3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BB, Np, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * Np * C * 2 + 2 * B * Np * C * C,
            transcendentals=B * H * Np * Np,
            bytes_accessed=(B * Np * C3 + B * Np * C + C * C) * 2),
        interpret=INTERPRET,
    )(qkv, w)


def _call_bwd(qkv, w, g, g_t, H, Dh, scale, n_real, seg=0):
    B, Np, C3 = qkv.shape
    C = C3 // 3
    Kp = g_t.shape[-1]
    BB = effective_bb_bwd(B, Np, C, Kp)
    kern = functools.partial(_bwd_kernel, H=H, Dh=Dh, scale=scale,
                             n_real=n_real, seg=seg)
    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((B, Np, C3), qkv.dtype),
            jax.ShapeDtypeStruct((C, Kp), jnp.float32),
        ),
        grid=(B // BB,),
        in_specs=[
            pl.BlockSpec((BB, Np, C3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, Np, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, Np, Kp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BB, Np, C3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * Np * C * 5 + 2 * B * Np * C * (C + Kp),
            transcendentals=B * H * Np * Np,
            bytes_accessed=(B * Np * C3 * 2 + B * Np * C + C * C) * 2),
        interpret=INTERPRET,
    )(qkv, w, g, g_t)


# --------------------------------------------------------------------------- #
# custom-VJP wrapper
# --------------------------------------------------------------------------- #

def _assemble(w_t, b_t, w_frozen, b_frozen, inds):
    w = w_frozen.at[:, inds].set(w_t.astype(w_frozen.dtype))
    b = b_frozen.at[inds].set(b_t.astype(b_frozen.dtype))
    return w, b


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_apla_attention(qkv, w_t, b_t, w_frozen, b_frozen, inds,
                         num_heads, scale, segment_len=0):
    """qkv: [B, N, 3C] packed activations -> [B, N, C] projected output.

    Differentiable in (qkv, w_t, b_t); the frozen kernel/bias and inds get
    no cotangent.  `w_t` [C, k] / `b_t` [k] follow apla_proj's convention.
    """
    out, _ = _fused_fwd(qkv, w_t, b_t, w_frozen, b_frozen, inds,
                        num_heads, scale, segment_len)
    return out


def _prep(qkv, n_pad):
    B, N, C3 = qkv.shape
    if n_pad != N:
        qkv = jnp.pad(qkv, ((0, 0), (0, n_pad - N), (0, 0)))
    return qkv


def _fused_fwd(qkv, w_t, b_t, w_frozen, b_frozen, inds, num_heads, scale,
               segment_len=0):
    B, N, C3 = qkv.shape
    C = C3 // 3
    Dh = C // num_heads
    Np = _pad_to(N, 16)
    w, b = _assemble(w_t, b_t, w_frozen, b_frozen, inds)
    qkv_p = _prep(qkv, Np)
    out = _call_fwd(qkv_p, w.astype(qkv.dtype), num_heads, Dh,
                    float(scale), N, seg=int(segment_len))
    out = out[:, :N] + b.astype(out.dtype)
    # w_t/b_t ride along only for their shape/dtype (tiny arrays)
    return out, (qkv_p, w, inds, w_t, b_t)


def _fused_bwd(num_heads, scale, segment_len, res, g):
    qkv_p, w, inds, w_t_tpl, b_t_tpl = res
    k, bt_dtype, wt_dtype = w_t_tpl.shape[-1], b_t_tpl.dtype, w_t_tpl.dtype
    B, Np, C3 = qkv_p.shape
    C = C3 // 3
    Dh = C // num_heads
    N = g.shape[1]
    g_p = jnp.pad(g, ((0, 0), (0, Np - N), (0, 0))) if Np != N else g
    g_t = jnp.take(g_p, inds, axis=-1)                   # [B, Np, k]
    Kp = _pad_to(k, 128)
    if Kp != k:
        g_t = jnp.pad(g_t, ((0, 0), (0, 0), (0, Kp - k)))
    dqkv, dwt = _call_bwd(qkv_p, w.astype(g.dtype), g_p.astype(qkv_p.dtype),
                          g_t.astype(qkv_p.dtype), num_heads, Dh,
                          float(scale), N, seg=int(segment_len))
    dqkv = dqkv[:, :N]
    dw_t = dwt[:, :k].astype(wt_dtype)
    db_t = jnp.sum(jnp.take(g, inds, axis=-1).astype(jnp.float32),
                   axis=(0, 1)).astype(bt_dtype)
    return dqkv, dw_t, db_t, None, None, None


fused_apla_attention.defvjp(_fused_fwd, _fused_bwd)


# --------------------------------------------------------------------------- #
# Swin window-attention variant (VERDICT r4 item 3): attention over folded
# batch x windows sequences (N = window² = 49 -> pad 64) with the frozen
# relative-position bias and shift mask added pre-softmax, and the FULL
# output projection (Swin-APLA trains the whole attn.proj,
# apla_swin_transformer.py:25-39) applied in-kernel with dW accumulated
# across the batch grid.
# --------------------------------------------------------------------------- #

def _swin_fwd_bytes(bb: int, np_: int, c: int, h: int) -> int:
    return _fwd_bytes(bb, np_, c) + bb * np_ * np_ * 4 + h * np_ * np_ * 4


def _swin_bwd_bytes(bb: int, np_: int, c: int, kp: int, h: int) -> int:
    # Beyond _bwd_bytes: bias + mask blocks, PLUS the per-head gradient
    # strips (dqs/dks/dvs f32 + os_ bf16) the kernel holds live until the
    # final concat — at Swin's tiny Np=64 these dominate the score chain
    # and Mosaic does not reuse their buffers.  Calibrated against the
    # r5_swin_bisect hardware ladder: C=768 BB=8 aborts the compiler
    # (scoped 26.16M > 16M) while BB=4 and every C<=384 BB=8 point
    # compiles; this model declines exactly the failing point.  The ViT
    # _bwd_bytes model is left alone — its N=272 BB=2 envelope is
    # hardware-validated and a shared live-strip term would falsely
    # decline it.
    return _bwd_bytes(bb, np_, c, kp) + bb * np_ * np_ * 4 \
        + h * np_ * np_ * 4 + 3 * bb * np_ * c * 4 + bb * np_ * c * 2


# Largest folded batch x windows the Swin variant has been Mosaic-compiled
# at on hardware (validated this round at the det recipe's stage-1 fold;
# see r5_swin_fused.jsonl).  Unlike the ViT small-N path there is no remat
# around the det step, so the scoped-VMEM staging pathology does not apply
# — the bound still exists so untested folds fall back to XLA.
_SWIN_B_MAX = 1024


def _swin_b_max() -> int:
    import os
    return int(os.environ.get("APLA_FUSED_SWIN_BMAX", _SWIN_B_MAX))


def swin_effective_bb(b: int, np_: int, c: int, h: int,
                      kp: int | None = None) -> int:
    """Fold depth for the Swin window kernel (validated ladder only)."""
    if kp is None:
        bytes_fn = lambda bb: _swin_fwd_bytes(bb, np_, c, h)  # noqa: E731
        req = _env_bb("APLA_FUSED_BB_FWD_SMALL", 8)
    else:
        bytes_fn = lambda bb: _swin_bwd_bytes(bb, np_, c, kp, h)  # noqa: E731
        req = _env_bb("APLA_FUSED_BB_BWD_SMALL", 8)
    return _cap_bb_small(req, b, bytes_fn)


def swin_fused_ok(b: int, n: int, c: int, h: int) -> bool:
    """Admission for the Swin window kernel: deep fold both directions
    within the hardware-validated batch bound; APLA_FUSED_SMALLN=0 is the
    same measurement control as the ViT small-N fold."""
    import os
    if os.environ.get("APLA_FUSED_SMALLN", "1") == "0":
        return False
    if b > _swin_b_max():
        return False
    np_ = _pad_to(n, 16)
    kp = _pad_to(c, 128)
    return (swin_effective_bb(b, np_, c, h) >= _SMALL_BB_MIN
            and swin_effective_bb(b, np_, c, h, kp) >= _SMALL_BB_MIN)


def _tile_mask(mask_p, bb):
    """[M0, Np, Np] -> [lcm(M0, bb), Np, Np] so every bb-deep grid block
    slices one full period of the per-window pattern."""
    m0 = mask_p.shape[0]
    m = math.lcm(m0, bb)
    if m != m0:
        mask_p = jnp.tile(mask_p, (m // m0, 1, 1))
    return mask_p, m


def _call_fwd_swin(qkv, w, bias, mask_p, H, Dh, scale, n_real):
    B, Np, C3 = qkv.shape
    C = C3 // 3
    BB = swin_effective_bb(B, Np, C, H)
    mask_t, M = _tile_mask(mask_p, BB)
    nblk = M // BB
    kern = functools.partial(_fwd_kernel_bias, H=H, Dh=Dh, scale=scale,
                             n_real=n_real)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, Np, C), qkv.dtype),
        grid=(B // BB,),
        in_specs=[
            pl.BlockSpec((BB, Np, C3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, Np, Np), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, Np, Np), lambda i: (i % nblk, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BB, Np, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * Np * C * 2 + 2 * B * Np * C * C,
            transcendentals=B * H * Np * Np,
            bytes_accessed=(B * Np * C3 + B * Np * C + C * C) * 2),
        interpret=INTERPRET,
    )(qkv, w, bias, mask_t)


def _call_bwd_swin(qkv, w, bias, mask_p, g, g_t, H, Dh, scale, n_real):
    B, Np, C3 = qkv.shape
    C = C3 // 3
    Kp = g_t.shape[-1]
    BB = swin_effective_bb(B, Np, C, H, Kp)
    mask_t, M = _tile_mask(mask_p, BB)
    nblk = M // BB
    kern = functools.partial(_bwd_kernel_bias, H=H, Dh=Dh, scale=scale,
                             n_real=n_real)
    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((B, Np, C3), qkv.dtype),
            jax.ShapeDtypeStruct((C, Kp), jnp.float32),
        ),
        grid=(B // BB,),
        in_specs=[
            pl.BlockSpec((BB, Np, C3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, Np, Np), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, Np, Np), lambda i: (i % nblk, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, Np, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, Np, Kp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BB, Np, C3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * Np * C * 5 + 2 * B * Np * C * (C + Kp),
            transcendentals=B * H * Np * Np,
            bytes_accessed=(B * Np * C3 * 2 + B * Np * C + C * C) * 2),
        interpret=INTERPRET,
    )(qkv, w, bias, mask_t, g, g_t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_swin_attention(qkv, w, b, bias, wmask, num_heads, scale):
    """Swin window attention + FULL trainable projection in one kernel.

    qkv [B, N, 3C] (B = images x windows), w [C, C] / b [C] the trainable
    proj, bias [H, N, N] relative-position bias (frozen), wmask
    [nW, N, N] additive shift mask (frozen; pass zeros [1, N, N] for
    unshifted blocks).  Returns [B, N, C].  Differentiable in (qkv, w, b).
    """
    out, _ = _fused_swin_fwd(qkv, w, b, bias, wmask, num_heads, scale)
    return out


def _pad_bias(x, n_pad):
    n = x.shape[-1]
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, n_pad - n)))
    return x.astype(jnp.float32)


def _fused_swin_fwd(qkv, w, b, bias, wmask, num_heads, scale):
    B, N, C3 = qkv.shape
    C = C3 // 3
    Dh = C // num_heads
    Np = _pad_to(N, 16)
    qkv_p = _prep(qkv, Np)
    bias_p = _pad_bias(bias, Np)
    mask_p = _pad_bias(wmask, Np)
    out = _call_fwd_swin(qkv_p, w.astype(qkv.dtype), bias_p, mask_p,
                         num_heads, Dh, float(scale), N)
    out = out[:, :N] + b.astype(out.dtype)
    return out, (qkv_p, w, b, bias_p, mask_p)


def _fused_swin_bwd(num_heads, scale, res, g):
    qkv_p, w, b, bias_p, mask_p = res
    B, Np, C3 = qkv_p.shape
    C = C3 // 3
    Dh = C // num_heads
    N = g.shape[1]
    g_p = jnp.pad(g, ((0, 0), (0, Np - N), (0, 0))) if Np != N else g
    Kp = _pad_to(C, 128)
    g_t = g_p if Kp == C else jnp.pad(g_p, ((0, 0), (0, 0), (0, Kp - C)))
    dqkv, dw_full = _call_bwd_swin(
        qkv_p, w.astype(g.dtype), bias_p, mask_p,
        g_p.astype(qkv_p.dtype), g_t.astype(qkv_p.dtype),
        num_heads, Dh, float(scale), N)
    dqkv = dqkv[:, :N]
    dw = dw_full[:, :C].astype(w.dtype)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1)).astype(b.dtype)
    return dqkv, dw, db, jnp.zeros_like(bias_p[:, :N, :N]), \
        jnp.zeros_like(mask_p[:, :N, :N])


fused_swin_attention.defvjp(_fused_swin_fwd, _fused_swin_bwd)
