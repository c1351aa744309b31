"""Fused Swin window-attention kernel parity (interpret mode on CPU).

Oracle: the separate-ops math `models/swin._swin_attention` implements —
per-head logits + relative-position bias + per-window shift mask, softmax,
value matmul, then the (fully trainable under Swin-APLA) output projection.
Checks forward, cotangents (d_qkv, dW, db), frozen bias/mask cotangent
absence, the fold/mask-tiling geometry, and the in-model
`SwinConfig.use_fused_apla` path end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apla_tpu.ops import pallas_apla_attn
from apla_tpu.ops.pallas_apla_attn import (fused_swin_attention,
                                           swin_effective_bb, swin_fused_ok,
                                           _pad_to)


@pytest.fixture(autouse=True)
def interpret_mode():
    pallas_apla_attn.INTERPRET = True
    yield
    pallas_apla_attn.INTERPRET = False


def _oracle(qkv, w, b, bias, wmask, num_heads, scale):
    B, N, C3 = qkv.shape
    C = C3 // 3
    Dh = C // num_heads
    qkv_r = qkv.reshape(B, N, 3, num_heads, Dh)
    q, k, v = qkv_r[:, :, 0], qkv_r[:, :, 1], qkv_r[:, :, 2]
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = logits + bias[None]
    nW = wmask.shape[0]
    logits = logits + wmask[jnp.arange(B) % nW][:, None]
    attn = jax.nn.softmax(logits, axis=-1).astype(qkv.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                     preferred_element_type=jnp.float32)
    out = out.reshape(B, N, C)
    return jnp.dot(out, w, preferred_element_type=jnp.float32) + b


def _make(B=8, N=9, H=2, Dh=16, nW=4, seed=0, shift=True):
    C = H * Dh
    keys = jax.random.split(jax.random.PRNGKey(seed), 6)
    qkv = jax.random.normal(keys[0], (B, N, 3 * C), jnp.float32)
    w = jax.random.normal(keys[1], (C, C)) * 0.1
    b = jax.random.normal(keys[2], (C,)) * 0.1
    bias = jax.random.normal(keys[3], (H, N, N)) * 0.5
    if shift:
        # a block pattern per window (classic Swin region mask shape)
        blk = (jax.random.uniform(keys[4], (nW, N, N)) > 0.6)
        blk = blk & jnp.swapaxes(blk, 1, 2)  # symmetric, diag stays open
        blk = blk & ~jnp.eye(N, dtype=bool)[None]
        wmask = jnp.where(blk, -1e9, 0.0).astype(jnp.float32)
    else:
        wmask = jnp.zeros((1, N, N), jnp.float32)
    return qkv, w, b, bias, wmask, H, Dh ** -0.5


@pytest.mark.parametrize("shift", [False, True])
def test_fused_swin_forward_matches_oracle(shift):
    qkv, w, b, bias, wmask, H, scale = _make(shift=shift)
    out = fused_swin_attention(qkv, w, b, bias, wmask, H, scale)
    ref = _oracle(qkv, w, b, bias, wmask, H, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_fused_swin_mask_tiling_covers_fold_mismatch():
    """nW=4 windows but a fold of 8 per grid step: the mask operand must be
    tiled to lcm(nW, BB) so every block slices one full period."""
    qkv, w, b, bias, wmask, H, scale = _make(B=16, nW=4)
    np_, C = _pad_to(9, 16), w.shape[0]
    assert swin_effective_bb(16, np_, C, H) == 8
    out = fused_swin_attention(qkv, w, b, bias, wmask, H, scale)
    ref = _oracle(qkv, w, b, bias, wmask, H, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_fused_swin_grads_match_oracle():
    qkv, w, b, bias, wmask, H, scale = _make()

    def loss_fused(qkv, w, b):
        return jnp.sum(fused_swin_attention(qkv, w, b, bias, wmask,
                                            H, scale) ** 2)

    def loss_ref(qkv, w, b):
        return jnp.sum(_oracle(qkv, w, b, bias, wmask, H, scale) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(qkv, w, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(qkv, w, b)
    for a, r, name in zip(gf, gr, ("dqkv", "dw", "db")):
        a, r = np.asarray(a), np.asarray(r)
        denom = max(np.abs(r).max(), 1e-4)
        assert np.abs(a - r).max() / denom < 5e-3, name


def test_bias_and_mask_get_no_gradient():
    qkv, w, b, bias, wmask, H, scale = _make()

    def loss(bias, wmask):
        return jnp.sum(fused_swin_attention(qkv, w, b, bias, wmask,
                                            H, scale))

    g = jax.grad(loss, argnums=(0, 1))(bias, wmask)
    for a in g:
        assert float(jnp.abs(a).max()) == 0.0


def test_swin_admission_policy():
    """Deep folds within the validated bound are admitted; shallow folds,
    the APLA_FUSED_SMALLN=0 control, and beyond-bound batches decline."""
    assert swin_fused_ok(64, 49, 96, 3)
    assert swin_fused_ok(1024, 49, 96, 3)       # det b16 stage-1 fold
    assert not swin_fused_ok(2, 49, 96, 3)      # shallow
    assert not swin_fused_ok(3, 49, 96, 3)      # non-folding
    assert not swin_fused_ok(2048, 49, 96, 3)   # beyond validated bound
    import os
    os.environ["APLA_FUSED_SMALLN"] = "0"
    try:
        assert not swin_fused_ok(64, 49, 96, 3)
    finally:
        del os.environ["APLA_FUSED_SMALLN"]


def test_swin_features_fused_path_matches_xla():
    """End to end through swin_features (shifted block included) with
    gradients to the APLA-trainable projs."""
    import dataclasses

    from apla_tpu.models.swin import (SwinConfig, build_apla_swin,
                                      init_swin_params, swin_features)

    cfg = SwinConfig(img_size=16, patch_size=2, embed_dim=32, depths=(2,),
                     num_heads=(2,), window_size=4,
                     compute_dtype=jnp.float32)
    params = init_swin_params(jax.random.PRNGKey(0), cfg)
    trainable, frozen = build_apla_swin(params)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3), jnp.float32)
    # H=W=8, win 4 -> nW=4, nWB=8: fold 8 both directions -> admitted
    assert swin_fused_ok(8, 16, 32, 2)

    cfg_f = dataclasses.replace(cfg, use_fused_apla=True)

    def feats_sum(t, cfg):
        return sum(jnp.sum(f ** 2) for f in
                   swin_features(frozen, x, cfg, trainable=t))

    ref, gr = jax.value_and_grad(feats_sum)(trainable, cfg)
    out, gf = jax.value_and_grad(feats_sum)(trainable, cfg_f)
    np.testing.assert_allclose(float(out), float(ref), rtol=2e-3)
    for a, r in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        denom = max(float(jnp.abs(r).max()), 1e-4)
        assert float(jnp.abs(a - r).max()) / denom < 5e-3
