"""Fused APLA attention+projection kernel parity (interpret mode on CPU).

The oracle is the separate-ops path: `qkv_and_attend` (jnp attention) +
`apla_proj` (custom-VJP partial projection) — itself parity-tested against
the reference's APLA_Attention in test_reference_apla_losses.py.  Checks
forward, all three cotangents (d_qkv, dW_t, db_t), frozen-gradient absence,
and the in-model `use_fused_apla` path end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apla_tpu.ops import pallas_apla_attn
from apla_tpu.ops.apla_proj import apla_proj
from apla_tpu.ops.pallas_apla_attn import fused_apla_attention


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    pallas_apla_attn.INTERPRET = True
    # the tiny-N test geometries sit below the production min-seq gate
    monkeypatch.setenv("APLA_FUSED_MIN_N", "0")
    yield
    pallas_apla_attn.INTERPRET = False


def test_min_seq_gate_falls_back_to_xla(monkeypatch):
    """Below FUSED_MIN_N tokens, apla_attention must not call the kernel
    (the DINOv2 50-token local crops measured 20x slower through it)."""
    import apla_tpu.ops.attention as attention_mod
    from apla_tpu.ops.attention import apla_attention

    monkeypatch.delenv("APLA_FUSED_MIN_N", raising=False)
    qkv, w_t, b_t, w_frozen, b_frozen, inds, H, scale = _make(N=17)
    calls = []
    real = pallas_apla_attn.fused_apla_attention

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(pallas_apla_attn, "fused_apla_attention", spy)
    C = w_frozen.shape[0]
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 17, C))
    frozen = {"qkv": {"kernel": jax.random.normal(
        jax.random.PRNGKey(10), (C, 3 * C)) * 0.05},
        "proj": {"kernel": w_frozen, "bias": b_frozen}, "inds": inds}
    trainable = {"proj_wt": w_t, "proj_bt": b_t}
    out_gated = apla_attention(x, frozen, trainable, H, scale=scale,
                               use_fused=True)
    assert not calls, "fused kernel ran below the min-seq gate"
    # and with the gate lifted the kernel path produces the same output
    monkeypatch.setenv("APLA_FUSED_MIN_N", "0")
    out_fused = apla_attention(x, frozen, trainable, H, scale=scale,
                               use_fused=True)
    assert calls, "fused kernel did not run with the gate lifted"
    np.testing.assert_allclose(np.asarray(out_gated), np.asarray(out_fused),
                               rtol=2e-3, atol=2e-3)


def _make(B=2, N=17, H=2, Dh=16, k=8, seed=0):
    C = H * Dh
    keys = jax.random.split(jax.random.PRNGKey(seed), 6)
    qkv = jax.random.normal(keys[0], (B, N, 3 * C), jnp.float32)
    w_frozen = jax.random.normal(keys[1], (C, C)) * 0.1
    b_frozen = jax.random.normal(keys[2], (C,)) * 0.1
    inds = jax.random.permutation(keys[3], C)[:k].astype(jnp.int32)
    w_t = jax.random.normal(keys[4], (C, k)) * 0.1
    b_t = jax.random.normal(keys[5], (k,)) * 0.1
    return qkv, w_t, b_t, w_frozen, b_frozen, inds, H, Dh ** -0.5


def _ref_forward(qkv, w_t, b_t, w_frozen, b_frozen, inds, H, scale):
    """Separate-ops oracle: jnp attention over the packed qkv + apla_proj."""
    B, N, C3 = qkv.shape
    C = C3 // 3
    Dh = C // H
    q, k, v = [a.reshape(B, N, H, Dh)
               for a in jnp.split(qkv, 3, axis=-1)]
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
    return apla_proj(out, w_t, b_t, w_frozen, b_frozen, inds)


@pytest.mark.parametrize("n", [17, 16, 33])
def test_fused_forward_parity(n):
    args = _make(N=n)
    out = fused_apla_attention(*args)
    ref = _ref_forward(*args)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_fused_backward_parity():
    qkv, w_t, b_t, w_frozen, b_frozen, inds, H, scale = _make(N=17)

    def loss_fused(qkv, w_t, b_t):
        o = fused_apla_attention(qkv, w_t, b_t, w_frozen, b_frozen, inds,
                                 H, scale)
        return jnp.sum(o ** 2)

    def loss_ref(qkv, w_t, b_t):
        o = _ref_forward(qkv, w_t, b_t, w_frozen, b_frozen, inds, H, scale)
        return jnp.sum(o ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(qkv, w_t, b_t)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(qkv, w_t, b_t)
    for a, b, name in zip(g1, g2, ("d_qkv", "dW_t", "db_t")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3, err_msg=name)


def test_small_n_bb_fold_parity():
    """The small-N policy folds 8 images per grid step (DINOv2 local-crop
    regime); B=16 runs a 2-step grid so the cross-grid dW_t accumulation is
    exercised.  Forward and all cotangents must match the separate-ops
    oracle."""
    qkv, w_t, b_t, w_frozen, b_frozen, inds, H, scale = _make(B=16, N=50)
    from apla_tpu.ops.pallas_apla_attn import effective_bb_fwd
    assert effective_bb_fwd(16, 64, qkv.shape[-1] // 3) == 8

    def loss_fused(qkv, w_t, b_t):
        o = fused_apla_attention(qkv, w_t, b_t, w_frozen, b_frozen, inds,
                                 H, scale)
        return jnp.sum(o ** 2)

    def loss_ref(qkv, w_t, b_t):
        o = _ref_forward(qkv, w_t, b_t, w_frozen, b_frozen, inds, H, scale)
        return jnp.sum(o ** 2)

    out = fused_apla_attention(qkv, w_t, b_t, w_frozen, b_frozen, inds,
                               H, scale)
    ref = _ref_forward(qkv, w_t, b_t, w_frozen, b_frozen, inds, H, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(qkv, w_t, b_t)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(qkv, w_t, b_t)
    for a, b, name in zip(g1, g2, ("d_qkv", "dW_t", "db_t")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3, err_msg=name)


def test_small_n_admission_routes_to_kernel(monkeypatch):
    """With the default gate in place (no env override), a deep-folding
    small-N batch must route THROUGH apla_attention to the fused kernel —
    the r4 DINOv2 local-crop win depends on this admission."""
    from apla_tpu.ops.attention import apla_attention

    monkeypatch.delenv("APLA_FUSED_MIN_N", raising=False)
    qkv, w_t, b_t, w_frozen, b_frozen, inds, H, scale = _make(B=16, N=50)
    calls = []
    real = pallas_apla_attn.fused_apla_attention

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(pallas_apla_attn, "fused_apla_attention", spy)
    C = w_frozen.shape[0]
    x = jax.random.normal(jax.random.PRNGKey(11), (16, 50, C))
    frozen = {"qkv": {"kernel": jax.random.normal(
        jax.random.PRNGKey(12), (C, 3 * C)) * 0.05},
        "proj": {"kernel": w_frozen, "bias": b_frozen}, "inds": inds}
    trainable = {"proj_wt": w_t, "proj_bt": b_t}
    apla_attention(x, frozen, trainable, H, scale=scale, use_fused=True)
    assert calls, "deep-folding small-N batch did not route to the kernel"


def test_frozen_receives_no_gradient():
    qkv, w_t, b_t, w_frozen, b_frozen, inds, H, scale = _make()

    def loss(w_frozen, b_frozen):
        o = fused_apla_attention(qkv, w_t, b_t, w_frozen, b_frozen, inds,
                                 H, scale)
        return jnp.sum(o ** 2)

    dwf, dbf = jax.grad(loss, argnums=(0, 1))(w_frozen, b_frozen)
    # custom_vjp returns None -> symbolic zero for the frozen leaves
    assert float(jnp.abs(dwf).max()) == 0.0
    assert float(jnp.abs(dbf).max()) == 0.0


def test_full_rank_mode():
    """partial_size == 'full' maps to k == C (every column trainable)."""
    C = 32
    qkv, w_t, b_t, w_frozen, b_frozen, inds, H, scale = _make(
        H=2, Dh=16, k=C)
    out = fused_apla_attention(qkv, w_t, b_t, w_frozen, b_frozen, inds,
                               H, scale)
    ref = _ref_forward(qkv, w_t, b_t, w_frozen, b_frozen, inds, H, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_model_path_use_fused_apla():
    """ViTConfig(use_fused_apla=True) end to end: same logits and same
    trainable grads as the separate-ops model."""
    from apla_tpu.apla.core import AplaConfig
    from apla_tpu.models.classifier import classifier_forward, init_classifier
    from apla_tpu.models.vit import ViTConfig

    kw = dict(img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=2,
              compute_dtype=jnp.float32)
    cfg_ref = ViTConfig(**kw)
    cfg_fused = ViTConfig(**kw, use_fused_apla=True)
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg_ref, n_classes=5,
        apla_cfg=AplaConfig(partial_size=8))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))

    def loss(trainable, cfg):
        logits = classifier_forward(trainable, frozen, x, cfg)
        return jnp.sum(logits ** 2), logits

    (l_ref, logit_ref), g_ref = jax.value_and_grad(
        loss, has_aux=True)(trainable, cfg_ref)
    (l_fused, logit_fused), g_fused = jax.value_and_grad(
        loss, has_aux=True)(trainable, cfg_fused)
    np.testing.assert_allclose(np.asarray(logit_fused),
                               np.asarray(logit_ref), rtol=2e-3, atol=2e-3)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_fused)
    for (path_r, a), (_, b) in zip(flat_r, flat_f):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=5e-3,
            err_msg=jax.tree_util.keystr(path_r))


def test_fused_segment_mask():
    """Fused kernel with a block-diagonal segment mask == per-segment
    separate-ops oracle (packed DINOv2 local crops through the fused
    path)."""
    s, T = 2, 8
    qkv, w_t, b_t, w_frozen, b_frozen, inds, H, scale = _make(N=s * T)

    # oracle: run each segment independently through the separate-ops path
    refs = []
    for i in range(s):
        seg_qkv = qkv[:, i * T:(i + 1) * T]
        refs.append(_ref_forward(seg_qkv, w_t, b_t, w_frozen, b_frozen,
                                 inds, H, scale))
    ref = jnp.concatenate(refs, axis=1)

    out = fused_apla_attention(qkv, w_t, b_t, w_frozen, b_frozen, inds,
                               H, scale, T)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)

    def loss_fused(qkv, w_t, b_t):
        return jnp.sum(fused_apla_attention(
            qkv, w_t, b_t, w_frozen, b_frozen, inds, H, scale, T) ** 2)

    def loss_ref(qkv, w_t, b_t):
        parts = [_ref_forward(qkv[:, i * T:(i + 1) * T], w_t, b_t,
                              w_frozen, b_frozen, inds, H, scale)
                 for i in range(s)]
        return jnp.sum(jnp.concatenate(parts, axis=1) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(qkv, w_t, b_t)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(qkv, w_t, b_t)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_fused_under_data_parallel_mesh():
    """The fused kernel inside a train step over an 8-device data-sharded
    mesh computes the same loss as the XLA path (multi-chip correctness;
    single-chip perf is benched on hardware — r3_bench_final2.json)."""
    from apla_tpu.apla.core import AplaConfig
    from apla_tpu.models.classifier import init_classifier
    from apla_tpu.models.vit import ViTConfig
    from apla_tpu.parallel.mesh import (make_mesh, replicated_sharding,
                                        shard_batch, shard_params)
    from apla_tpu.train.losses import cross_entropy
    from apla_tpu.train.optim import build_optimizer
    from apla_tpu.train.steps import make_train_step
    from apla_tpu.train.train_state import TrainState

    mesh = make_mesh(n_data=8)
    losses = {}
    for fused in (False, True):
        cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2,
                        num_heads=4, compute_dtype=jnp.float32,
                        use_fused_apla=fused)
        trainable, frozen = init_classifier(
            jax.random.PRNGKey(0), cfg, n_classes=10,
            apla_cfg=AplaConfig(partial_size=8))
        tx = build_optimizer("AdamW", {"lr": 1e-3}, trainable,
                             grad_clip=1.0)
        state = jax.device_put(TrainState.create(trainable, tx),
                               replicated_sharding(mesh))
        fz = shard_params(frozen, mesh)
        rng = np.random.default_rng(0)
        batch = shard_batch(
            {"image": rng.standard_normal((16, 32, 32, 3)).astype(
                np.float32),
             "label": (np.arange(16) % 10).astype(np.int32)}, mesh)
        step = make_train_step(cfg, tx, cross_entropy)
        state, m = step(state, fz, batch, 1e-3, jax.random.PRNGKey(1))
        losses[fused] = float(m["loss"])
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)
