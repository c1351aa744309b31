"""Swin backbone tests (detection side-car parity:
`apla_swin_transformer.py` — freeze all but attn.proj)."""

import jax
import jax.numpy as jnp
import numpy as np

from apla_tpu.models.swin import (
    SwinConfig, build_apla_swin, init_swin_params, swin_features)

CFG = SwinConfig(img_size=56, patch_size=4, embed_dim=32,
                 depths=(2, 2), num_heads=(2, 4), window_size=7,
                 compute_dtype=jnp.float32)


def test_swin_pyramid_shapes():
    params = init_swin_params(jax.random.PRNGKey(0), CFG)
    x = jnp.ones((2, 56, 56, 3))
    outs = swin_features(params, x, CFG)
    assert len(outs) == 2
    assert outs[0].shape == (2, 14, 14, 32)   # 56/4 = 14
    assert outs[1].shape == (2, 7, 7, 64)     # merged
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_apla_swin_partition_and_grads():
    params = init_swin_params(jax.random.PRNGKey(0), CFG)
    trainable, frozen = build_apla_swin(params)
    # trainable = only the attention projections
    leaves = jax.tree.leaves(trainable)
    total_t = sum(int(np.prod(l.shape)) for l in leaves)
    expected = sum((32 * 2 ** s) ** 2 + 32 * 2 ** s
                   for s in range(2) for _ in range(2))
    assert total_t == expected
    assert "proj" not in frozen["stages"][0]["blocks"][0]["attn"]

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 56, 56, 3))

    def loss(trainable):
        outs = swin_features(frozen, x, CFG, trainable=trainable)
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

    g = jax.grad(loss)(trainable)
    gk = np.asarray(g["stages"][0]["blocks"][0]["proj"]["kernel"])
    assert np.isfinite(gk).all() and np.abs(gk).max() > 0


def test_shifted_window_changes_output():
    """Second block (shifted) must mix information across window borders."""
    params = init_swin_params(jax.random.PRNGKey(0), CFG)
    x = jnp.zeros((1, 56, 56, 3)).at[:, 0, 0, :].set(10.0)
    outs = swin_features(params, x, CFG)
    # the far corner receives nonzero signal only via merging/shifts
    assert np.abs(np.asarray(outs[-1])).sum() > 0
