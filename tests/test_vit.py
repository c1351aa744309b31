import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apla_tpu.apla.core import AplaConfig, build_apla, count_params, merge_apla_params
from apla_tpu.models.vit import (
    VIT_BUILDERS, ViTConfig, init_vit_params, interpolate_pos_embed, vit_features,
)

TINY = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=3, num_heads=4,
                 compute_dtype=jnp.float32)


def test_vit_forward_shapes():
    params = init_vit_params(jax.random.PRNGKey(0), TINY)
    x = jnp.ones((2, 32, 32, 3))
    feats = vit_features(params, x, TINY)
    assert feats.shape == (2, 64)
    tokens = vit_features(params, x, TINY, return_all_tokens=True)
    assert tokens.shape == (2, 17, 64)  # 16 patches + cls


def test_vit_layerscale_and_swiglu():
    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2,
                    num_heads=4, has_layerscale=True, layerscale_init=1.0,
                    use_swiglu=True, compute_dtype=jnp.float32)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    assert "ls1" in params["blocks"]
    assert "w12" in params["blocks"]["mlp"]
    out = vit_features(params, jnp.ones((1, 32, 32, 3)), cfg)
    assert out.shape == (1, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_pos_embed_interpolation():
    cfg = TINY
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    # run at a different resolution: 48x48 -> 36 patches
    out = vit_features(params, jnp.ones((1, 48, 48, 3)), cfg)
    assert out.shape == (1, 64)
    pos = interpolate_pos_embed(params["pos_embed"], 36)
    assert pos.shape == (1, 37, 64)
    # same-resolution call is the identity
    same = interpolate_pos_embed(params["pos_embed"], cfg.num_patches)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(params["pos_embed"]))


def test_builders():
    cfg = VIT_BUILDERS["vit_small"](img_size=224, patch_size=14)
    assert cfg.embed_dim == 384 and cfg.depth == 12 and cfg.num_heads == 6
    assert VIT_BUILDERS["vit_giant"]().use_swiglu


def test_apla_partition_and_grads():
    cfg = TINY
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    apla = AplaConfig(partial_size=8, seed=0)
    trainable, frozen = build_apla(params, cfg, apla)

    # trainable tree holds only the APLA slices: L*(d*k + k) params
    assert count_params(trainable) == cfg.depth * (cfg.embed_dim * 8 + 8)
    assert trainable["blocks"]["proj_wt"].shape == (cfg.depth, cfg.embed_dim, 8)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))

    def loss(trainable):
        out = vit_features(frozen, x, cfg, trainable=trainable)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(trainable)
    gw = np.asarray(g["blocks"]["proj_wt"])
    assert np.isfinite(gw).all()
    assert np.abs(gw).max() > 0  # gradients actually flow


def test_apla_forward_consistent_with_dense():
    """APLA forward == plain ViT forward when trainable slices equal the
    original projection columns (build_apla copies them, so outputs match)."""
    cfg = TINY
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    trainable, frozen = build_apla(params, cfg, AplaConfig(partial_size=8))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    out_plain = vit_features(params, x, cfg)
    out_apla = vit_features(frozen, x, cfg, trainable=trainable)
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_apla),
                               rtol=1e-5, atol=1e-5)


def test_apla_full_mode():
    cfg = TINY
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    trainable, frozen = build_apla(params, cfg, AplaConfig(partial_size="full"))
    assert "proj" not in frozen["blocks"]["attn"]
    x = jnp.ones((1, 32, 32, 3))
    out = vit_features(frozen, x, cfg, trainable=trainable)
    ref = vit_features(params, x, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_merge_roundtrip():
    cfg = TINY
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    trainable, frozen = build_apla(params, cfg, AplaConfig(partial_size=8))
    merged = merge_apla_params(trainable, frozen)
    np.testing.assert_allclose(
        np.asarray(merged["blocks"]["attn"]["proj"]["kernel"]),
        np.asarray(params["blocks"]["attn"]["proj"]["kernel"]), rtol=1e-6)
    assert "inds" not in merged["blocks"]["attn"]


def test_inds_path_compat(tmp_path):
    """Reference inds-*.json format round-trips (apla_vit.py:20-27)."""
    from apla_tpu.apla.core import load_indices, sample_indices, save_indices
    inds = sample_indices(0, 3, 64, 8)
    p = tmp_path / "inds.json"
    save_indices(inds, str(p))
    loaded = load_indices(str(p), 3, 64)
    np.testing.assert_array_equal(inds, loaded)

    cfg = TINY
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    trainable, frozen = build_apla(
        params, cfg, AplaConfig(partial_size=8, inds_path=str(p)))
    np.testing.assert_array_equal(
        np.asarray(frozen["blocks"]["attn"]["inds"]), inds)


def test_intermediate_layers():
    from apla_tpu.models.vit import vit_intermediate_layers
    params = init_vit_params(jax.random.PRNGKey(0), TINY)
    x = jnp.ones((2, 32, 32, 3))
    out = vit_intermediate_layers(params, x, TINY, n=2)
    assert out.shape == (2, 2 * TINY.embed_dim)
    out2 = vit_intermediate_layers(params, x, TINY, n=1,
                                   return_patch_avgpool=True)
    assert out2.shape == (2, 2 * TINY.embed_dim)
    # last-block cls must match the standard feature path
    feats = vit_features(params, x, TINY)
    np.testing.assert_allclose(
        np.asarray(out2[:, :TINY.embed_dim]), np.asarray(feats),
        rtol=1e-5, atol=1e-5)
