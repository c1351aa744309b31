"""Functional Vision Transformer for TPU.

Capability parity with the reference backbone (`src/utils/transformers/vit.py`):
PatchEmbed conv, cls token, bicubic pos-embed interpolation, pre-norm blocks
with optional LayerScale, MLP or SwiGLU FFN, stochastic depth with a linear
decay rule, builders vit_tiny..vit_giant (`vit.py:511-596`).

Design departures (TPU-first, not a port):
- Pure functions over a pytree of params; no module objects.
- Block params are STACKED along a leading layer axis and the transformer
  trunk runs as a single `lax.scan` — one compiled block body regardless of
  depth, fast compiles, and per-layer outputs fall out of scan's ys.
- Mixed precision: params live in float32; compute dtype (bf16 on TPU) is a
  config knob, softmax/layernorm accumulate in float32.
- APLA is structural: each block's attention projection splits into frozen
  leaves (full kernel) + trainable leaves (`proj_wt` [d, k], `proj_bt` [k]);
  see `apla_tpu/apla/core.py`.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..ops.attention import apla_attention, multi_head_attention, _dropout


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    use_swiglu: bool = False
    has_layerscale: bool = False
    layerscale_init: float = 1e-5
    norm_eps: float = 1e-6
    num_register_tokens: int = 0  # DINOv2-style registers
    compute_dtype: Any = jnp.bfloat16
    use_flash: bool = False   # Pallas flash-attention path
    # Fused APLA attention+projection Pallas kernel (pallas_apla_attn.py):
    # the attention output stays in VMEM through the partial projection and
    # dW_t is computed in-kernel.  Applies to APLA-k blocks with N <= 512.
    use_fused_apla: bool = False
    # Block-diagonal attention for sequences that PACK several independent
    # crops (DINOv2 local crops): tokens attend only within their own
    # `attn_segment_len`-sized segment.  The TPU-native equivalent of
    # xformers' BlockDiagonalMask over crop lists (reference
    # dinov2/layers/block.py:243-298).  0 = ordinary full attention.
    attn_segment_len: int = 0
    # Attention logits buffer dtype.  bf16 (default) halves the softmax
    # chain's HBM traffic — measured +19% train throughput on v5e for
    # ViT-B/14 @224 — and is numerically safe (max-subtracted exp; softmax
    # itself still accumulates in f32).  Set True for bit-conservative runs.
    attn_logits_f32: bool = False
    # lax.scan unroll factor for the block trunk (1 = rolled loop; depth =
    # fully unrolled, letting XLA fuse across layer boundaries).
    scan_unroll: int = 1
    # Rematerialisation policy for the block body under autodiff:
    # 'dots' saves matmul outputs and recomputes elementwise chains in the
    # backward pass — measured +10% train throughput on v5e (HBM-traffic
    # bound); 'dots_attn' additionally saves the softmaxed attention
    # weights (batched einsums are not covered by the dots policy, so
    # backward otherwise recomputes QK^T + softmax); 'full' recomputes
    # everything; None stores all residuals.
    remat: Any = "dots"
    # Tanh-approximate GELU (the flax default).  The exact erf GELU costs
    # 15.4 ms of the 128.5 ms ViT-B b64 train step on v5e (measured,
    # experiments/r2_step_ablations.jsonl) — transcendental-bound on the
    # VPU in both forward and dgelu.  Reference parity (torch nn.GELU) is
    # exact erf: set False for bit-conservative runs/import validation.
    gelu_tanh: bool = False

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def scale(self) -> float:
        return self.qk_scale if self.qk_scale is not None else self.head_dim ** -0.5

    @property
    def mlp_hidden(self) -> int:
        h = int(self.embed_dim * self.mlp_ratio)
        if self.use_swiglu:
            # SwiGLUFFNFused hidden sizing (reference vit.py:131-151)
            h = (int(h * 2 / 3) + 7) // 8 * 8
        return h


def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    """Truncated normal init on [-2, 2] std, matching the reference
    `trunc_normal_` (vit.py:35-71)."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def _init_linear(key, d_in, d_out, bias=True, std=0.02):
    kkey, _ = jax.random.split(key)
    p = {"kernel": trunc_normal(kkey, (d_in, d_out), std=std)}
    if bias:
        p["bias"] = jnp.zeros((d_out,), jnp.float32)
    return p


def _init_block(key, cfg: ViTConfig):
    """One transformer block's params (unstacked)."""
    keys = jax.random.split(key, 8)
    d, h = cfg.embed_dim, cfg.mlp_hidden
    p = {
        "norm1": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "attn": {
            "qkv": _init_linear(keys[0], d, 3 * d, bias=cfg.qkv_bias),
            "proj": _init_linear(keys[1], d, d, bias=True),
        },
        "norm2": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
    }
    if cfg.use_swiglu:
        p["mlp"] = {
            "w12": _init_linear(keys[2], d, 2 * h, bias=True),
            "w3": _init_linear(keys[3], h, d, bias=True),
        }
    else:
        p["mlp"] = {
            "fc1": _init_linear(keys[2], d, h, bias=True),
            "fc2": _init_linear(keys[3], h, d, bias=True),
        }
    if cfg.has_layerscale:
        p["ls1"] = {"gamma": cfg.layerscale_init * jnp.ones((d,))}
        p["ls2"] = {"gamma": cfg.layerscale_init * jnp.ones((d,))}
    return p


def init_vit_params(key, cfg: ViTConfig) -> dict:
    """Initialise the full ViT param pytree.  Block params are stacked on a
    leading [depth] axis (for `lax.scan`)."""
    k_patch, k_pos, k_cls, k_reg, k_blocks = jax.random.split(key, 5)
    d = cfg.embed_dim
    params = {
        "patch_embed": {
            "kernel": trunc_normal(
                k_patch, (cfg.patch_size, cfg.patch_size, cfg.in_chans, d)),
            "bias": jnp.zeros((d,)),
        },
        "cls_token": trunc_normal(k_cls, (1, 1, d)),
        "pos_embed": trunc_normal(k_pos, (1, cfg.num_patches + 1, d)),
        "norm": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
    }
    if cfg.num_register_tokens:
        params["register_tokens"] = trunc_normal(
            k_reg, (1, cfg.num_register_tokens, d))
    block_keys = jax.random.split(k_blocks, cfg.depth)
    blocks = [_init_block(bk, cfg) for bk in block_keys]
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return params


def layer_norm(x, scale, bias, eps=1e-6):
    """LayerNorm with float32 statistics regardless of compute dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _mlp(x, p, cfg: ViTConfig, rng, deterministic):
    from ..ops.quant import maybe_quantized_dot
    if cfg.use_swiglu:
        x12 = maybe_quantized_dot(x, p["w12"]["kernel"], p["w12"]["bias"])
        x1, x2 = jnp.split(x12, 2, axis=-1)
        hidden = jax.nn.silu(x1) * x2
        return maybe_quantized_dot(hidden, p["w3"]["kernel"], p["w3"]["bias"])
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    h = maybe_quantized_dot(x, p["fc1"]["kernel"], p["fc1"]["bias"])
    h = jax.nn.gelu(h, approximate=cfg.gelu_tanh)
    h = _dropout(h, cfg.drop_rate, r1, deterministic)
    h = maybe_quantized_dot(h, p["fc2"]["kernel"], p["fc2"]["bias"])
    return _dropout(h, cfg.drop_rate, r2, deterministic)


def _drop_path(x, rate, rng, deterministic, segment_len=0):
    """Stochastic depth on the residual branch (reference vit.py:75-95).

    `segment_len` > 0 (packed crops): each PACKED SEGMENT draws its own
    keep decision, preserving the per-crop semantics of the unpacked path
    (one sample = one crop there)."""
    if deterministic or rng is None:
        return x
    keep = 1.0 - rate
    if segment_len:
        n_seg = x.shape[1] // segment_len
        mask = jax.random.bernoulli(rng, p=keep, shape=(x.shape[0], n_seg))
        mask = jnp.repeat(mask, segment_len, axis=1)[..., None]
    else:
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, p=keep, shape=shape)
    return jnp.where(mask, x / jnp.asarray(keep, x.dtype),
                     jnp.zeros((), x.dtype))


def _block_forward(x, block_params, trainable_block, dp_rate, cfg: ViTConfig,
                   rng, deterministic):
    """Pre-norm transformer block.  `trainable_block` is the APLA trainable
    sub-pytree for this layer (or None for a plain ViT)."""
    if rng is not None:
        r_attn, r_dp1, r_mlp, r_dp2 = jax.random.split(rng, 4)
    else:
        r_attn = r_dp1 = r_mlp = r_dp2 = None
    if cfg.drop_path_rate == 0.0:  # statically skip stochastic depth
        r_dp1 = r_dp2 = None

    y = layer_norm(x, block_params["norm1"]["scale"],
                   block_params["norm1"]["bias"], cfg.norm_eps)
    if trainable_block is not None and "proj_wt" in trainable_block:
        y = apla_attention(
            y, block_params["attn"], trainable_block, cfg.num_heads,
            scale=cfg.scale, attn_drop=cfg.attn_drop_rate,
            proj_drop=cfg.drop_rate, rng=r_attn, deterministic=deterministic,
            use_flash=cfg.use_flash, logits_f32=cfg.attn_logits_f32,
            use_fused=cfg.use_fused_apla,
            segment_len=cfg.attn_segment_len)
    else:
        attn_params = dict(block_params["attn"])
        if trainable_block is not None and "attn" in trainable_block:
            # full-proj adaptation: trainable proj overrides the frozen one
            attn_params["proj"] = trainable_block["attn"]["proj"]
        y = multi_head_attention(
            y, attn_params, cfg.num_heads, scale=cfg.scale,
            attn_drop=cfg.attn_drop_rate, proj_drop=cfg.drop_rate, rng=r_attn,
            deterministic=deterministic, use_flash=cfg.use_flash,
            logits_f32=cfg.attn_logits_f32,
            segment_len=cfg.attn_segment_len)
    if "ls1" in block_params:
        y = y * block_params["ls1"]["gamma"].astype(y.dtype)
    x = x + _drop_path(y, dp_rate, r_dp1, deterministic,
                       segment_len=cfg.attn_segment_len)

    y = layer_norm(x, block_params["norm2"]["scale"],
                   block_params["norm2"]["bias"], cfg.norm_eps)
    y = _mlp(y, block_params["mlp"], cfg, r_mlp, deterministic)
    if "ls2" in block_params:
        y = y * block_params["ls2"]["gamma"].astype(y.dtype)
    x = x + _drop_path(y, dp_rate, r_dp2, deterministic,
                       segment_len=cfg.attn_segment_len)
    return x


def interpolate_pos_embed(pos_embed, npatch: int, num_prefix: int = 1):
    """Bicubic pos-embed interpolation (reference vit.py:421-437).

    `pos_embed`: [1, N_orig + num_prefix, d].  Returns [1, npatch + num_prefix, d].
    Static-shape friendly: `npatch` must be a Python int (grid sizes are static
    under jit, set by image resolution).
    """
    n_orig = pos_embed.shape[1] - num_prefix
    if npatch == n_orig:
        return pos_embed
    prefix = pos_embed[:, :num_prefix]
    patch_pos = pos_embed[:, num_prefix:]
    dim = pos_embed.shape[-1]
    gs_old = int(math.sqrt(n_orig))
    gs_new = int(math.sqrt(npatch))
    grid = patch_pos.reshape(gs_old, gs_old, dim).astype(jnp.float32)
    # antialias=False: torch F.interpolate(mode="bicubic") does not
    # antialias, and the 518->224 dinov2 import is a DOWNSCALE where
    # jax's default antialias filter would perturb every position
    resized = jax.image.resize(grid, (gs_new, gs_new, dim),
                               method="bicubic", antialias=False)
    resized = resized.reshape(1, gs_new * gs_new, dim).astype(pos_embed.dtype)
    return jnp.concatenate([prefix, resized], axis=1)


def _prepare_tokens(params, x, cfg: ViTConfig, rng, deterministic,
                    masks=None):
    """Patchify, prepend cls (+ register) tokens, add (interpolated) pos
    embed.  `masks` [B, npatch] bool replaces masked patch embeddings with
    the learned mask token (iBOT; reference
    dinov2_vits.py `prepare_tokens_with_masks`)."""
    dt = cfg.compute_dtype
    B = x.shape[0]
    x = x.astype(dt)
    # Conv patch-embed as a strided conv: maps straight onto the MXU.
    x = jax.lax.conv_general_dilated(
        x, params["patch_embed"]["kernel"].astype(dt),
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dt)
    x = x + params["patch_embed"]["bias"].astype(dt)
    B, H, W, D = x.shape
    npatch = H * W
    x = x.reshape(B, npatch, D)

    if masks is not None:
        mask_token = params.get("mask_token",
                                jnp.zeros((1, 1, D), jnp.float32))
        x = jnp.where(masks[..., None], mask_token.astype(dt), x)

    cls = jnp.broadcast_to(params["cls_token"].astype(dt), (B, 1, D))
    x = jnp.concatenate([cls, x], axis=1)
    pos = interpolate_pos_embed(params["pos_embed"], npatch, num_prefix=1)
    x = x + pos.astype(dt)

    if cfg.num_register_tokens and "register_tokens" in params:
        reg = jnp.broadcast_to(params["register_tokens"].astype(dt),
                               (B, cfg.num_register_tokens, D))
        x = jnp.concatenate([x[:, :1], reg, x[:, 1:]], axis=1)

    return _dropout(x, cfg.drop_rate, rng, deterministic)


def vit_features(params, x, cfg: ViTConfig, trainable=None, rng=None,
                 deterministic=True, return_all_tokens=False,
                 return_layers=False, masks=None, pack_segments=0,
                 pipeline=None, token_sharding=None):
    """Run the ViT trunk.  `x`: [B, H, W, C] (NHWC).

    Returns the final-norm cls token [B, d] by default (reference
    `forward_features`, vit.py:387-419); `return_all_tokens` gives [B, N, d];
    `return_layers` additionally returns every block's output (scan ys).

    `pack_segments` = s > 1: `x` is s crops stacked crop-major on the batch
    axis ([s*B, h, w, C]); after token prep the s crops of each image are
    PACKED into one [B, s*T] sequence with block-diagonal attention, so the
    tiny per-crop attention/LN/MLP ops run at s× the width (the DINOv2
    local-crop trick — xformers BlockDiagonalMask analogue, reference
    dinov2/layers/block.py:243-298).  Outputs are unpacked back to [s*B, ...]
    (return_layers is unsupported while packed).

    `pipeline`: a `parallel.pipeline.PipelineSpec` — run the block trunk
    as a collective pipeline over the mesh 'model' axis (stage-sharded
    stacked blocks, ppermute microbatch rotation) instead of the local
    scan.  Token prep and the final norm stay outside (GSPMD-placed).

    `token_sharding`: a `NamedSharding` for the [B, N, D] token stream
    (sequence parallelism — `system_params.sequence_parallel`): the
    constraint is re-applied on every block's output so LN / MLP /
    projections run token-sharded over the mesh model axis and XLA
    gathers only around attention (Megatron SP, composes with TP).
    """
    if rng is not None:
        rng, r_tok = jax.random.split(rng)
        block_rngs = jax.random.split(rng, cfg.depth)
    else:
        r_tok = None
        block_rngs = None

    x = _prepare_tokens(params, x, cfg, r_tok, deterministic, masks=masks)
    if token_sharding is not None:
        assert pipeline is None, "sequence parallel + pipeline unsupported"
        x = jax.lax.with_sharding_constraint(x, token_sharding)

    if pack_segments > 1:
        assert not return_layers, "return_layers unsupported with packing"
        sB, T, D = x.shape
        assert sB % pack_segments == 0, (sB, pack_segments)
        Bb = sB // pack_segments
        x = x.reshape(pack_segments, Bb, T, D).transpose(1, 0, 2, 3) \
             .reshape(Bb, pack_segments * T, D)
        cfg = dataclasses.replace(cfg, attn_segment_len=T)

    # stochastic-depth linear decay (reference vit.py:338)
    dp_rates = jnp.linspace(0.0, cfg.drop_path_rate, cfg.depth)

    trainable_blocks = None
    if trainable is not None and "blocks" in trainable:
        trainable_blocks = trainable["blocks"]

    block_fn = _block_forward
    if cfg.remat == "dots":
        # dots + the flash-attention kernel output ('attn_out', a
        # pallas_call — not a dot, so the dots policy alone would re-run
        # the whole kernel in backward); no-op when use_flash is off
        block_fn = jax.checkpoint(
            _block_forward, static_argnums=(4, 6),
            policy=jax.checkpoint_policies.save_from_both_policies(
                jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
                jax.checkpoint_policies.save_only_these_names("attn_out")))
    elif cfg.remat == "dots_attn":
        block_fn = jax.checkpoint(
            _block_forward, static_argnums=(4, 6),
            policy=jax.checkpoint_policies.save_from_both_policies(
                jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
                jax.checkpoint_policies.save_only_these_names(
                    "attn_weights")))
    elif cfg.remat == "dots_batch":
        block_fn = jax.checkpoint(
            _block_forward, static_argnums=(4, 6),
            policy=jax.checkpoint_policies.checkpoint_dots)
    elif cfg.remat == "full":
        block_fn = jax.checkpoint(_block_forward, static_argnums=(4, 6))

    def body(carry, scanned):
        h = carry
        if trainable_blocks is not None:
            bp, tb, dp, br = scanned
        else:
            bp, dp, br = scanned
            tb = None
        h = block_fn(h, bp, tb, dp, cfg,
                     br if block_rngs is not None else None,
                     deterministic)
        if token_sharding is not None:
            # re-assert sequence sharding each layer: LN/MLP/projections
            # stay token-parallel; XLA gathers only around attention
            h = jax.lax.with_sharding_constraint(h, token_sharding)
        return h, (h if return_layers else None)

    if pipeline is not None and pipeline.n_stages > 1:
        assert not return_layers, "return_layers unsupported with pipeline"
        assert pack_segments <= 1, "crop packing + pipeline unsupported"
        from ..parallel.pipeline import pipeline_blocks
        x = pipeline_blocks(x, params["blocks"], trainable_blocks,
                            dp_rates, block_rngs, block_fn, cfg,
                            deterministic, pipeline)
        layer_outs = None
    else:
        rngs_in = (block_rngs if block_rngs is not None
                   else jnp.zeros((cfg.depth, 2), jnp.uint32))
        if trainable_blocks is not None:
            scanned = (params["blocks"], trainable_blocks, dp_rates, rngs_in)
        else:
            scanned = (params["blocks"], dp_rates, rngs_in)
        x, layer_outs = jax.lax.scan(body, x, scanned,
                                     unroll=cfg.scan_unroll)

    x = layer_norm(x, params["norm"]["scale"], params["norm"]["bias"],
                   cfg.norm_eps)
    if pack_segments > 1:
        Bb, _, D = x.shape
        T = x.shape[1] // pack_segments
        x = x.reshape(Bb, pack_segments, T, D).transpose(1, 0, 2, 3) \
             .reshape(Bb * pack_segments, T, D)
    if return_layers:
        return x, layer_outs
    if return_all_tokens:
        return x
    return x[:, 0]


def vit_forward(params, x, cfg: ViTConfig, trainable=None, rng=None,
                deterministic=True, **kw):
    """Alias for `vit_features` — the reference's `forward` also handles
    multi-resolution crop lists; in this framework multi-crop batching is done
    by the SSL pipeline with one fixed-shape forward per resolution
    (XLA-static shapes; cf. reference vit.py:371-385 non-xformers path)."""
    return vit_features(params, x, cfg, trainable=trainable, rng=rng,
                        deterministic=deterministic, **kw)


def vit_intermediate_layers(params, x, cfg: ViTConfig, n: int = 1,
                            trainable=None, return_patch_avgpool=False):
    """Cls tokens of the last `n` blocks (+ optional mean patch token),
    concatenated — reference `forward_return_n_last_blocks`
    (vit.py:480-501) / dinov2 `get_intermediate_layers`.  Uses the scan ys,
    so all layers come from one trunk pass."""
    final, layer_outs = vit_features(params, x, cfg, trainable=trainable,
                                     return_all_tokens=True,
                                     return_layers=True)
    outs = []
    for i in range(cfg.depth - n, cfg.depth):
        tokens = layer_outs[i]
        tokens = layer_norm(tokens, params["norm"]["scale"],
                            params["norm"]["bias"], cfg.norm_eps)
        outs.append(tokens[:, 0])
    if return_patch_avgpool:
        outs.append(jnp.mean(final[:, 1 + cfg.num_register_tokens:], axis=1))
    return jnp.concatenate(outs, axis=-1)


def _builder(embed_dim, depth, num_heads, use_swiglu=False):
    def build(**kw):
        kw.setdefault("qkv_bias", True)
        kw.setdefault("use_swiglu", use_swiglu)
        return ViTConfig(embed_dim=embed_dim, depth=depth,
                         num_heads=num_heads, **kw)
    return build


# Reference builders vit.py:511-596
VIT_BUILDERS = {
    "vit_tiny": _builder(192, 12, 3),
    "vit_small": _builder(384, 12, 6),
    "vit_base": _builder(768, 12, 12),
    "vit_large": _builder(1024, 24, 16),
    "vit_giant": _builder(1536, 40, 24, use_swiglu=True),
}
