"""Int8 frozen-weight quantization tests (W8A8 dense path)."""

import jax
import jax.numpy as jnp
import numpy as np

from apla_tpu.apla.core import AplaConfig, build_apla
from apla_tpu.models.vit import ViTConfig, init_vit_params, vit_features
from apla_tpu.ops.quant import (
    dequantize_weight, int8_matmul, quantize_frozen_backbone, quantize_weight)

CFG = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=4,
                compute_dtype=jnp.float32)


def test_weight_quant_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 128)) * 0.05
    w_i8, scale = quantize_weight(w)
    back = dequantize_weight(w_i8, scale)
    # per-channel symmetric int8: relative error bounded by scale/2
    err = np.abs(np.asarray(back - w))
    assert err.max() <= float(scale.max()) * 0.51 + 1e-7


def test_int8_matmul_accuracy_and_grads():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k1, (32, 64))
    w = jax.random.normal(k2, (64, 96)) * 0.05
    w_i8, scale = quantize_weight(w)
    y_q = int8_matmul(x, w_i8, scale)
    y = x @ w
    cos = np.sum(np.asarray(y_q) * np.asarray(y)) / (
        np.linalg.norm(y_q) * np.linalg.norm(y))
    assert cos > 0.999

    # gradient flows to x and matches the dequantized-weight reference
    g = jax.grad(lambda x: jnp.sum(int8_matmul(x, w_i8, scale) ** 2))(x)
    w_dq = dequantize_weight(w_i8, scale)
    g_ref = jax.grad(lambda x: jnp.sum((x @ w_dq) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=2e-2, atol=2e-2)


def test_quantized_backbone_forward_close():
    params = init_vit_params(jax.random.PRNGKey(0), CFG)
    trainable, frozen = build_apla(params, CFG, AplaConfig(partial_size=8))
    frozen_q = quantize_frozen_backbone({"backbone": frozen})["backbone"]
    assert "w_int8" in frozen_q["blocks"]["attn"]["qkv"]["kernel"]
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    ref = vit_features(frozen, x, CFG, trainable=trainable)
    out = vit_features(frozen_q, x, CFG, trainable=trainable)
    ref_n = np.asarray(ref)
    out_n = np.asarray(out)
    cos = np.sum(ref_n * out_n) / (np.linalg.norm(ref_n)
                                   * np.linalg.norm(out_n))
    assert cos > 0.99, cos


def test_quantized_training_step_learns():
    """APLA slices still train with the quantized frozen path."""
    import optax
    params = init_vit_params(jax.random.PRNGKey(0), CFG)
    trainable, frozen = build_apla(params, CFG, AplaConfig(partial_size=8))
    frozen_q = quantize_frozen_backbone({"backbone": frozen})["backbone"]
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    target = jax.random.normal(jax.random.PRNGKey(2), (8, 64))
    tx = optax.adam(1e-2)
    opt_state = tx.init(trainable)

    @jax.jit
    def step(trainable, opt_state):
        def loss_fn(t):
            out = vit_features(frozen_q, x, CFG, trainable=t)
            return jnp.mean((out - target) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(trainable, updates), opt_state, loss

    losses = []
    for _ in range(10):
        trainable, opt_state, loss = step(trainable, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_quantized_swin_backbone_forward_close():
    """quantize_frozen_backbone handles Swin trees (per-block qkv/fc
    kernels; the trainable attn.proj stays float) and the pyramid
    features stay cosine-close to the float path."""
    from apla_tpu.models.swin import (SwinConfig, build_apla_swin,
                                      init_swin_params, swin_features)

    cfg = SwinConfig(img_size=56, patch_size=4, embed_dim=32,
                     depths=(2, 2), num_heads=(2, 4), window_size=7,
                     compute_dtype=jnp.float32)
    bb_t, bb_f = build_apla_swin(init_swin_params(jax.random.PRNGKey(0),
                                                  cfg))
    bb_fq = quantize_frozen_backbone(bb_f)
    blk0 = bb_fq["stages"][0]["blocks"][0]
    assert "w_int8" in blk0["attn"]["qkv"]["kernel"]
    assert "w_int8" in blk0["mlp"]["fc1"]["kernel"]
    # proj must stay float even when PRESENT (an unsplit tree, where
    # build_apla_swin has not popped the APLA-trainable leaf yet)
    full_q = quantize_frozen_backbone(
        init_swin_params(jax.random.PRNGKey(3), cfg))
    fblk0 = full_q["stages"][0]["blocks"][0]
    assert "proj" in fblk0["attn"]
    assert not isinstance(fblk0["attn"]["proj"]["kernel"], dict)
    assert "w_int8" in fblk0["attn"]["qkv"]["kernel"]
    from apla_tpu.ops.quant import is_quantized
    assert is_quantized(bb_fq) and not is_quantized(bb_f)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    ref = swin_features(bb_f, x, cfg, trainable=bb_t)
    got = swin_features(bb_fq, x, cfg, trainable=bb_t)
    for a, b in zip(ref, got):
        a, b = np.asarray(a), np.asarray(b)
        cos = np.sum(a * b) / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.99, cos
