"""Swin Transformer backbone with APLA partitioning (detection side-car).

Reference: `src/segmentation_and_detection/detection/apla_swin_transformer.py`
— the reference drops a Swin into mmdet with everything frozen except each
block's `attn.proj` (lines 25-39).  Here the backbone itself is in-repo:
windowed attention with shifted windows, relative position bias, patch
merging, 4 stages (Swin-T defaults: embed 96, depths 2/2/6/2, heads
3/6/12/24, window 7), returning the multi-scale feature pyramid detection
heads consume.

TPU notes: window partitioning is pure reshape/transpose (free for XLA);
shifted windows use jnp.roll + a precomputed additive attention mask
(static); all shapes static per input resolution.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .vit import layer_norm, trunc_normal
from ..ops.attention import _dropout


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    img_size: int = 224
    patch_size: int = 4
    in_chans: int = 3
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    norm_eps: float = 1e-5
    # LayerNorm after the patch-embed projection (official Swin PatchEmbed
    # has it; HF SwinModel embeddings.norm).  Kept ON by default for
    # checkpoint-import faithfulness.
    patch_norm: bool = True
    compute_dtype: object = jnp.bfloat16
    # run window attention + the (fully trainable) APLA proj as ONE Pallas
    # kernel (ops/pallas_apla_attn.fused_swin_attention): windows are
    # 49-token sequences folded batch x windows deep — the small-N fold
    # regime (VERDICT r4 item 3).  Off-TPU / unadmitted shapes fall back
    # to the XLA path automatically.
    use_fused_apla: bool = False


def _init_linear(key, d_in, d_out, bias=True):
    p = {"kernel": trunc_normal(key, (d_in, d_out), std=0.02)}
    if bias:
        p["bias"] = jnp.zeros((d_out,))
    return p


def _init_swin_block(key, dim, num_heads, window, mlp_hidden):
    ks = jax.random.split(key, 5)
    n_rel = (2 * window - 1) ** 2
    return {
        "norm1": {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
        "attn": {
            "qkv": _init_linear(ks[0], dim, 3 * dim),
            "proj": _init_linear(ks[1], dim, dim),
            "rel_bias": trunc_normal(ks[2], (n_rel, num_heads), std=0.02),
        },
        "norm2": {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
        "mlp": {
            "fc1": _init_linear(ks[3], dim, mlp_hidden),
            "fc2": _init_linear(ks[4], mlp_hidden, dim),
        },
    }


def init_swin_params(key, cfg: SwinConfig) -> dict:
    keys = jax.random.split(key, len(cfg.depths) + 2)
    d = cfg.embed_dim
    params = {
        "patch_embed": {
            "kernel": trunc_normal(
                keys[0], (cfg.patch_size, cfg.patch_size, cfg.in_chans, d)),
            "bias": jnp.zeros((d,)),
        },
        "stages": [],
        "norms": [],  # per-stage output norm (detection feature pyramid)
    }
    if cfg.patch_norm:
        params["patch_norm"] = {"scale": jnp.ones((d,)),
                                "bias": jnp.zeros((d,))}
    for s, depth in enumerate(cfg.depths):
        dim = d * (2 ** s)
        hid = int(dim * cfg.mlp_ratio)
        skeys = jax.random.split(keys[s + 1], depth + 1)
        blocks = [_init_swin_block(skeys[i], dim, cfg.num_heads[s],
                                   cfg.window_size, hid)
                  for i in range(depth)]
        stage = {"blocks": blocks}
        if s < len(cfg.depths) - 1:  # patch merging downsamples between stages
            stage["downsample"] = {
                "reduction": _init_linear(skeys[-1], 4 * dim, 2 * dim,
                                          bias=False),
                "norm": {"scale": jnp.ones((4 * dim,)),
                         "bias": jnp.zeros((4 * dim,))},
            }
        params["stages"].append(stage)
        params["norms"].append({"scale": jnp.ones((dim,)),
                                "bias": jnp.zeros((dim,))})
    return params


def _rel_pos_index(window: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))  # [2, w, w]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]       # [2, n, n]
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return (rel[..., 0] * (2 * window - 1) + rel[..., 1]).astype(np.int32)


def _window_partition(x, window):
    B, H, W, C = x.shape
    x = x.reshape(B, H // window, window, W // window, window, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, C)


def _window_reverse(wins, window, B, H, W):
    C = wins.shape[-1]
    x = wins.reshape(B, H // window, W // window, window, window, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


def _shift_mask(H, W, window, shift) -> np.ndarray:
    """Additive attention mask for shifted windows: tokens from different
    original regions must not attend (classic Swin mask)."""
    img = np.zeros((1, H, W, 1))
    cnt = 0
    for h in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for w in (slice(0, -window), slice(-window, -shift),
                  slice(-shift, None)):
            img[:, h, w, :] = cnt
            cnt += 1
    # pure numpy (host-side constant): routing through jnp would produce
    # tracers when the trunk is jitted and break np.asarray below
    wins = img.reshape(1, H // window, window, W // window, window, 1)
    wins = wins.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window)
    mask = wins[:, None, :] - wins[:, :, None]
    return np.where(mask != 0, -1e9, 0.0).astype(np.float32)


def _swin_attention(x_windows, p, num_heads, window, mask, cfg, rng,
                    deterministic):
    """x_windows: [nW*B, n, C] with n = window²."""
    nWB, n, C = x_windows.shape
    head_dim = C // num_heads
    scale = head_dim ** -0.5
    dt = x_windows.dtype
    from ..ops.quant import maybe_quantized_dot
    qkv = maybe_quantized_dot(x_windows, p["qkv"]["kernel"],
                              p["qkv"]["bias"])
    qkv = qkv.reshape(nWB, n, 3, num_heads, head_dim)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = logits + _gathered_rel_bias(p, window, n, num_heads)[None]
    if mask is not None:
        nW = mask.shape[0]
        logits = logits.reshape(-1, nW, num_heads, n, n) \
            + mask[None, :, None].astype(jnp.float32)
        logits = logits.reshape(nWB, num_heads, n, n)
    attn = jax.nn.softmax(logits, axis=-1).astype(dt)
    attn = _dropout(attn, cfg.attn_drop_rate, rng, deterministic)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                     preferred_element_type=dt).reshape(nWB, n, C)
    return out


def _gathered_rel_bias(p_attn, window, n, num_heads):
    """Relative-position bias table gathered to [H, n, n] f32 — the ONE
    place the indexing convention lives (XLA and fused paths must agree
    or parity breaks)."""
    rel_idx = jnp.asarray(_rel_pos_index(window).reshape(-1))
    bias = p_attn["rel_bias"][rel_idx].reshape(n, n, num_heads)
    return bias.transpose(2, 0, 1).astype(jnp.float32)


def _swin_fused_admitted(cfg, wins_shape, dtype, num_heads,
                         deterministic) -> bool:
    """Route this block's windows through the fused kernel?  Needs the knob
    on, a usable backend, bf16 activations (the only hardware-calibrated
    dtype — the r5 bisect ladder's abort point leaves no f32 headroom), no
    attention dropout (train-time drop rate 0 or eval), and the folded
    batch x windows shape admitted by the validated small-N policy
    (ops/pallas_apla_attn.swin_fused_ok)."""
    if not cfg.use_fused_apla:
        return False
    if cfg.attn_drop_rate > 0.0 and not deterministic:
        return False
    from ..ops.pallas_apla_attn import (fused_available, fused_dtype_ok,
                                        swin_fused_ok, warn_fused_fallback)
    if not fused_available():
        return False
    if not fused_dtype_ok(dtype):
        warn_fused_fallback(
            f"Swin compute dtype {jnp.dtype(dtype).name} (the window "
            "kernel's VMEM ladder is bf16-calibrated; pass --bf16)")
        return False
    nWB, n, C = wins_shape
    return swin_fused_ok(nWB, n, C, num_heads)


def _swin_block(x, H, W, p, p_train, num_heads, window, shift, cfg, rng,
                deterministic):
    """x: [B, H*W, C].  `p_train` overrides the attn proj (APLA)."""
    B = x.shape[0]
    C = x.shape[-1]
    dt = x.dtype
    shortcut = x
    x = layer_norm(x, p["norm1"]["scale"], p["norm1"]["bias"], cfg.norm_eps)
    x = x.reshape(B, H, W, C)
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        mask = jnp.asarray(_shift_mask(H, W, window, shift))
    else:
        mask = None
    wins = _window_partition(x, window)
    proj = p_train["proj"] if p_train is not None else p["attn"]["proj"]
    if _swin_fused_admitted(cfg, wins.shape, wins.dtype, num_heads,
                            deterministic):
        from ..ops.pallas_apla_attn import fused_swin_attention
        from ..ops.quant import maybe_quantized_dot
        nWB, n, _ = wins.shape
        qkv = maybe_quantized_dot(wins, p["attn"]["qkv"]["kernel"],
                                  p["attn"]["qkv"]["bias"])
        bias = _gathered_rel_bias(p["attn"], window, n, num_heads)
        wmask = (mask if mask is not None
                 else jnp.zeros((1, n, n), jnp.float32))
        wins = fused_swin_attention(
            qkv, proj["kernel"], proj["bias"], bias, wmask, num_heads,
            (C // num_heads) ** -0.5).astype(dt)
    else:
        wins = _swin_attention(wins, p["attn"], num_heads, window, mask,
                               cfg, rng, deterministic)
        wins = jnp.dot(wins, proj["kernel"].astype(dt),
                       preferred_element_type=dt) + proj["bias"].astype(dt)
    x = _window_reverse(wins, window, B, H, W)
    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    x = shortcut + x.reshape(B, H * W, C)

    from ..ops.quant import maybe_quantized_dot
    y = layer_norm(x, p["norm2"]["scale"], p["norm2"]["bias"], cfg.norm_eps)
    y = maybe_quantized_dot(y, p["mlp"]["fc1"]["kernel"],
                            p["mlp"]["fc1"]["bias"])
    y = jax.nn.gelu(y, approximate=False)
    y = maybe_quantized_dot(y, p["mlp"]["fc2"]["kernel"],
                            p["mlp"]["fc2"]["bias"])
    return x + y


def swin_features(params, x, cfg: SwinConfig, trainable=None, rng=None,
                  deterministic=True):
    """x: [B, H, W, C] -> list of per-stage feature maps [B, Hs, Ws, Cs]
    (the mmdet-style pyramid)."""
    dt = cfg.compute_dtype
    x = jax.lax.conv_general_dilated(
        x.astype(dt), params["patch_embed"]["kernel"].astype(dt),
        (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dt)
    x = x + params["patch_embed"]["bias"].astype(dt)
    B, H, W, C = x.shape
    x = x.reshape(B, H * W, C)
    if "patch_norm" in params:
        x = layer_norm(x, params["patch_norm"]["scale"],
                       params["patch_norm"]["bias"], cfg.norm_eps)

    outs = []
    for s, stage in enumerate(params["stages"]):
        win = min(cfg.window_size, H, W)
        for i, blk in enumerate(stage["blocks"]):
            # odd blocks shift by window//2 unless one window covers the map
            shift = win // 2 if (i % 2 == 1 and min(H, W) > win) else 0
            p_train = None
            if trainable is not None:
                p_train = trainable["stages"][s]["blocks"][i]
            blk_rng = (jax.random.fold_in(rng, s * 100 + i)
                       if rng is not None else None)
            x = _swin_block(x, H, W, blk, p_train, cfg.num_heads[s], win,
                            shift, cfg, blk_rng, deterministic)
        n = params["norms"][s]
        outs.append(layer_norm(x, n["scale"], n["bias"],
                               cfg.norm_eps).reshape(B, H, W, -1))
        if "downsample" in stage:
            # patch merging: 2x2 neighbourhood concat -> norm -> linear
            xm = x.reshape(B, H, W, -1)
            x0 = xm[:, 0::2, 0::2]
            x1 = xm[:, 1::2, 0::2]
            x2 = xm[:, 0::2, 1::2]
            x3 = xm[:, 1::2, 1::2]
            xm = jnp.concatenate([x0, x1, x2, x3], axis=-1)
            H, W = H // 2, W // 2
            xm = xm.reshape(B, H * W, -1)
            dsp = stage["downsample"]
            xm = layer_norm(xm, dsp["norm"]["scale"], dsp["norm"]["bias"],
                            cfg.norm_eps)
            x = jnp.dot(xm, dsp["reduction"]["kernel"].astype(dt),
                        preferred_element_type=dt)
    return outs


def build_apla_swin(params: dict):
    """Split Swin params: each block's `attn.proj` trainable, everything else
    frozen (reference apla_swin_transformer.py:25-39)."""
    trainable = {"stages": []}
    frozen = jax.tree.map(lambda x: x, params)
    for s, stage in enumerate(frozen["stages"]):
        t_stage = {"blocks": []}
        for blk in stage["blocks"]:
            t_stage["blocks"].append({"proj": blk["attn"].pop("proj")})
        trainable["stages"].append(t_stage)
    return trainable, frozen
