"""Memory-efficient attention for TPU (the reference's xformers
`memory_efficient_attention` analogue, `appla_attn_mem_eff.py:42`).

Uses the Pallas flash-attention kernel (blockwise online-softmax; the
(N, N) score matrix never hits HBM) with fwd+bwd custom VJPs.  ViT sequences
are short but not lane-aligned (224px/14 -> 257 tokens; 518px/14 -> 1370),
so inputs are padded to a block-size-friendly length (the largest 128..512
block whose padding overhead stays under ~15% — see flash_mha) and padding
is masked out via segment ids (pad tokens get a different segment id ->
their attention weight is exactly 0 for real queries).

Falls back to the jnp softmax path off-TPU (CPU tests / interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BLOCK = 128


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _jnp_mha(q, k, v, scale, segment_len: int = 0):
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    if segment_len:
        n = q.shape[2]
        seg = jnp.arange(n) // segment_len
        cross = seg[:, None] != seg[None, :]
        logits = jnp.where(cross[None, None], jnp.float32(-1e9), logits)
    attn = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                      preferred_element_type=q.dtype)


def flash_mha(q, k, v, scale: float = 1.0, segment_len: int = 0):
    """q, k, v: [B, N, H, Dh] -> out [B, N, H, Dh].

    Dispatch: short sequences -> full-VMEM Pallas kernel (pallas_mha.py, no
    HBM score traffic); long sequences -> blockwise flash kernel; off-TPU ->
    jnp reference.

    `segment_len` > 0: block-diagonal attention over packed equal-length
    segments (DINOv2 local-crop packing — the xformers BlockDiagonalMask
    analogue, reference dinov2/layers/block.py:243-298)."""
    B, N, H, Dh = q.shape
    if _on_tpu():
        from .pallas_mha import fits_vmem, vmem_mha
        if fits_vmem(N):
            return vmem_mha(q, k, v, scale=scale, segment_len=segment_len)

    qt = q.transpose(0, 2, 1, 3)  # [B, H, N, Dh]
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    if not _on_tpu():
        out = _jnp_mha(qt, kt, vt, scale, segment_len=segment_len)
        return out.transpose(0, 2, 1, 3)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    # Block-size choice drives everything at long N: padding to the next
    # 128-multiple forces 128-wide blocks when the padded length has no
    # larger divisor (1370 -> 1408: only 128 divides), which is the round-1
    # 2.6x regression.  Padding further to a 512-multiple (1370 -> 1536,
    # +12%) admits 512-wide blocks.  Policy: the LARGEST block whose pad
    # overhead stays under ~15% (so N just past a block boundary — e.g.
    # 577 -> 1024 would be 77% pad — falls back to smaller blocks instead
    # of quadrupling the score work).  APLA_FLASH_BLOCK overrides (perf
    # studies); values are rounded to a 128-multiple.
    import os
    env_blk = os.environ.get("APLA_FLASH_BLOCK")
    if env_blk:
        want_blk = max(_BLOCK, (int(env_blk) // _BLOCK) * _BLOCK)
    else:
        want_blk = _BLOCK
        for cand in (512, 384, 256):
            n_cand = ((N + cand - 1) // cand) * cand
            if (n_cand - N) / N <= 0.15:
                want_blk = cand
                break
    n_pad = max(((N + want_blk - 1) // want_blk) * want_blk, _BLOCK)
    pad = n_pad - N
    if pad:
        cfg = [(0, 0), (0, 0), (0, pad), (0, 0)]
        qt = jnp.pad(qt, cfg)
        kt = jnp.pad(kt, cfg)
        vt = jnp.pad(vt, cfg)
    if pad or segment_len:
        if segment_len:
            # packed crops: segment = crop index + 1; padding: segment 0
            seg = jnp.where(jnp.arange(n_pad) < N,
                            jnp.arange(n_pad) // segment_len + 1, 0)
        else:
            # real tokens: segment 1; padding: segment 0 -> masked both ways
            seg = (jnp.arange(n_pad) < N).astype(jnp.int32)
        seg = jnp.broadcast_to(seg[None, :].astype(jnp.int32), (B, n_pad))
        segment_ids = SegmentIds(q=seg, kv=seg)
    else:
        segment_ids = None

    # largest block (<=512) that divides the padded length (n_pad is a
    # want_blk multiple and want_blk is a 128-multiple, so 128 always hits)
    blk = next(b for b in (512, 384, 256, 128) if n_pad % b == 0)
    block_sizes = BlockSizes(
        block_q=blk, block_k_major=blk,
        block_k=min(_BLOCK, n_pad), block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk,
        block_k_dkv=min(_BLOCK, n_pad), block_q_dkv=blk,
        block_k_major_dq=blk, block_k_dq=min(_BLOCK, n_pad),
        block_q_dq=blk,
    )
    out = flash_attention(qt, kt, vt, segment_ids=segment_ids, causal=False,
                          sm_scale=scale, block_sizes=block_sizes)
    if pad:
        out = out[:, :, :N, :]
    return out.transpose(0, 2, 1, 3)
