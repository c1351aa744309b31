"""Int8 quantization for FROZEN weights (W8A8 dense path).

APLA freezes almost the whole backbone — those weights never receive
gradients, so they can be quantized ONCE at build time with zero optimizer
interaction; only the APLA slices / heads stay in bf16/f32.  (The reference
cannot express this: torch autograd needs the frozen weights in the autodiff
graph dtype.)  Measured on v5e: int8xint8 matmul = 199.6 TFLOP/s vs 129.4
bf16 — a ~1.5x dense-path speedup.

Scheme: symmetric per-output-channel weight scales, dynamic symmetric
per-row (per-token) activation scales.  The custom VJP keeps the backward
exact w.r.t. the QUANTIZED forward weights: dx = g @ dequant(W)^T (bf16
matmul; optionally also int8 — see `int8_matmul(..., quantized_bwd=True)`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w, axis=0):
    """w [d_in, d_out] float -> (w_int8, scale [d_out] f32), symmetric
    per-output-channel."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = (amax / 127.0).clip(1e-12)
    w_i8 = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return w_i8, scale.reshape(-1)


def dequantize_weight(w_i8, scale):
    return w_i8.astype(jnp.float32) * scale[None, :]


def _quantize_rows(x):
    """x [..., d] float -> (x_int8, row_scale [..., 1] f32)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = (amax / 127.0).clip(1e-12)
    x_i8 = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return x_i8, scale


def _int8_forward(x, w_i8, w_scale, out_dtype):
    x_i8, x_scale = _quantize_rows(x)
    y = jax.lax.dot_general(
        x_i8, w_i8, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * x_scale * w_scale[None, :]
    return y.astype(out_dtype)


@jax.custom_vjp
def int8_matmul(x, w_i8, w_scale):
    """y = dequant_quant(x) @ dequant(w).  x [..., d_in]; w_i8 [d_in, d_out];
    w_scale [d_out].  Gradient flows to x only (w is frozen by construction)."""
    return _int8_forward(x, w_i8, w_scale, x.dtype)


def _int8_fwd(x, w_i8, w_scale):
    # dtype token (dtypes aren't valid residual leaves)
    tok = jnp.zeros((0,), x.dtype)
    return _int8_forward(x, w_i8, w_scale, x.dtype), (tok, w_i8, w_scale)


def _int8_bwd(res, g):
    tok, w_i8, w_scale = res
    x_dtype = tok.dtype
    # dx = g @ W^T with W dequantized — exact w.r.t. the forward's weights
    w = (w_i8.astype(g.dtype) * w_scale[None, :].astype(g.dtype))
    dx = jnp.dot(g, w.T, preferred_element_type=g.dtype).astype(x_dtype)
    return (dx, None, None)


int8_matmul.defvjp(_int8_fwd, _int8_bwd)


def maybe_quantized_dot(x, kernel_or_quant, bias=None):
    """Dense helper: `kernel_or_quant` is either a plain kernel array or a
    quant dict {'w_int8', 'scale'}.  Bias applied in x.dtype."""
    if isinstance(kernel_or_quant, dict) and "w_int8" in kernel_or_quant:
        y = int8_matmul(x, kernel_or_quant["w_int8"],
                        kernel_or_quant["scale"])
    else:
        y = jnp.dot(x, kernel_or_quant.astype(x.dtype),
                    preferred_element_type=x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def is_quantized(frozen: dict) -> bool:
    """True if any quantizable kernel in a ViT or Swin frozen tree is
    already a {'w_int8','scale'} dict — the single source of truth for
    the tree layouts `quantize_frozen_backbone` touches (callers use
    this to avoid double-quantization)."""
    bb = frozen.get("backbone", frozen)
    blocks = bb.get("blocks") or {}
    candidates = [blocks.get("attn", {}).get("qkv", {})] + [
        blocks.get("mlp", {}).get(name, {})
        for name in ("fc1", "fc2", "w12", "w3")]
    stages = bb.get("stages") or []
    if stages:
        blk0 = stages[0]["blocks"][0]
        candidates += [blk0.get("attn", {}).get("qkv", {}),
                       blk0.get("mlp", {}).get("fc1", {}),
                       blk0.get("mlp", {}).get("fc2", {})]
    return any(isinstance(c.get("kernel"), dict) for c in candidates)


def quantize_frozen_backbone(frozen: dict, which=("qkv", "fc1", "fc2",
                                                  "w12", "w3")) -> dict:
    """Quantize the large frozen kernels of a ViT backbone pytree in place
    (returns a new tree): qkv / mlp kernels -> {'w_int8','scale'}.  The
    frozen full proj kernel stays bf16/f32 — the APLA scatter writes
    trainable bf16 columns into it.  LayerNorms/biases/embeddings stay float.

    `which` selects the kernels to quantize by name — per-shape int8 wins
    depend on K (see experiments/r2_perf_study.jsonl), so callers can
    quantize only where the MXU actually gains.
    """
    import jax as _jax

    frozen = _jax.tree.map(lambda x: x, frozen)  # structural copy
    bb = frozen.get("backbone", frozen)
    which = set(which)
    blocks = bb.get("blocks")

    if blocks is None:
        # Swin backbone (models/swin.py): per-block dicts under stages;
        # frozen qkv/fc kernels quantize per layer (attn.proj is the APLA
        # trainable there and stays float)
        stages = bb.get("stages")
        if not stages:
            return frozen
        for stage in stages:
            for blk in stage["blocks"]:
                if "qkv" in which:
                    w_i8, scale = quantize_weight(
                        blk["attn"]["qkv"]["kernel"])
                    blk["attn"]["qkv"]["kernel"] = {"w_int8": w_i8,
                                                    "scale": scale}
                for name in ("fc1", "fc2"):
                    if name in which:
                        w_i8, scale = quantize_weight(
                            blk["mlp"][name]["kernel"])
                        blk["mlp"][name]["kernel"] = {"w_int8": w_i8,
                                                      "scale": scale}
        return frozen

    def quant_stack(kernel):  # [L, d_in, d_out]
        w_i8, scales = _jax.vmap(lambda w: quantize_weight(w))(kernel)
        return {"w_int8": w_i8, "scale": scales}

    if "qkv" in which:
        blocks["attn"]["qkv"]["kernel"] = quant_stack(
            blocks["attn"]["qkv"]["kernel"])
    mlp = blocks["mlp"]
    for name in ("fc1", "fc2", "w12", "w3"):
        if name in mlp and name in which:
            mlp[name]["kernel"] = quant_stack(mlp[name]["kernel"])
    return frozen
