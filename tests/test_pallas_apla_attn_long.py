"""Long-sequence fused APLA attention (ops/pallas_apla_attn_long.py) vs
the jnp separate-ops oracle — interpret mode (CPU).

The long kernel must be bit-compatible in CONTRACT with the monolithic
fused kernel (same custom-VJP signature); these tests pin forward, all
three cotangents, frozen-gradient absence, padding behaviour (N not a
multiple of the q strip), and the in-model dispatch (a sequence beyond
the monolithic VMEM envelope routes to the long kernel).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apla_tpu.ops import pallas_apla_attn, pallas_apla_attn_long
from apla_tpu.ops.apla_proj import apla_proj
from apla_tpu.ops.attention import qkv_and_attend
from apla_tpu.ops.pallas_apla_attn_long import (fused_apla_attention_long,
                                                long_fused_ok)


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    pallas_apla_attn.INTERPRET = True
    pallas_apla_attn_long.INTERPRET = True
    # small strips so toy N spans several grid blocks
    monkeypatch.setenv("APLA_FUSED_LONG_BQ", "64")
    yield
    pallas_apla_attn.INTERPRET = False
    pallas_apla_attn_long.INTERPRET = False


def _make(B=2, N=150, H=2, Dh=16, k=8, seed=0):
    C = H * Dh
    keys = jax.random.split(jax.random.PRNGKey(seed), 6)
    qkv = jax.random.normal(keys[0], (B, N, 3 * C), jnp.float32)
    w_frozen = jax.random.normal(keys[1], (C, C)) * 0.1
    b_frozen = jax.random.normal(keys[2], (C,)) * 0.1
    inds = jax.random.permutation(keys[3], C)[:k].astype(jnp.int32)
    w_t = jax.random.normal(keys[4], (C, k)) * 0.1
    b_t = jax.random.normal(keys[5], (k,)) * 0.1
    return qkv, w_t, b_t, w_frozen, b_frozen, inds, H, Dh ** -0.5


def _oracle(qkv, w_t, b_t, w_frozen, b_frozen, inds, H, scale):
    B, N, C3 = qkv.shape
    C = C3 // 3
    Dh = C // H
    q, k, v = (qkv.reshape(B, N, 3, H, Dh)[:, :, i] for i in range(3))
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(logits, axis=-1).astype(qkv.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                     preferred_element_type=jnp.float32)
    out = out.reshape(B, N, C).astype(qkv.dtype)
    return apla_proj(out, w_t, b_t, w_frozen, b_frozen, inds)


@pytest.mark.parametrize("N", [128, 150, 192])  # exact / ragged / exact pad
def test_long_forward_matches_oracle(N):
    args = _make(N=N)
    out = fused_apla_attention_long(*args)
    ref = _oracle(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_long_grads_match_oracle():
    qkv, w_t, b_t, w_frozen, b_frozen, inds, H, scale = _make(N=150)

    def loss(fn, qkv, w_t, b_t):
        return jnp.sum(fn(qkv, w_t, b_t, w_frozen, b_frozen, inds,
                          H, scale) ** 2)

    gf = jax.grad(lambda *a: loss(fused_apla_attention_long, *a),
                  argnums=(0, 1, 2))(qkv, w_t, b_t)
    gr = jax.grad(lambda *a: loss(_oracle, *a),
                  argnums=(0, 1, 2))(qkv, w_t, b_t)
    for a, r, name in zip(gf, gr, ("dqkv", "dw_t", "db_t")):
        a, r = np.asarray(a), np.asarray(r)
        denom = max(np.abs(r).max(), 1e-4)
        assert np.abs(a - r).max() / denom < 5e-3, name


def test_long_frozen_gets_no_gradient():
    qkv, w_t, b_t, w_frozen, b_frozen, inds, H, scale = _make(N=100)

    def loss(w_frozen, b_frozen):
        return jnp.sum(fused_apla_attention_long(
            qkv, w_t, b_t, w_frozen, b_frozen, inds, H, scale))

    g = jax.grad(loss, argnums=(0, 1))(w_frozen, b_frozen)
    for a in g:
        assert float(jnp.abs(a).max()) == 0.0


def test_long_matches_monolithic_kernel(monkeypatch):
    """Same inputs through both fused kernels must agree (they share the
    custom-VJP contract; only the schedule differs)."""
    monkeypatch.setenv("APLA_FUSED_MIN_N", "0")
    args = _make(N=96)
    out_long = fused_apla_attention_long(*args)
    out_mono = pallas_apla_attn.fused_apla_attention(*args)
    np.testing.assert_allclose(np.asarray(out_long), np.asarray(out_mono),
                               rtol=1e-3, atol=1e-3)


def test_long_admission_geometry():
    """ViT-B @518 (N=1370, C=768) must be admitted at the production strip
    depth; ViT-L/H widths that blow the whole-image VMEM budget decline."""
    import os
    old = os.environ.pop("APLA_FUSED_LONG_BQ", None)
    try:
        assert not pallas_apla_attn.fused_fits(1370, 768)  # mono declines
        assert long_fused_ok(1370, 768)                    # long takes it
        assert not long_fused_ok(1370, 1536)               # ViT-g too wide
        os.environ["APLA_FUSED_LONG"] = "0"
        assert not long_fused_ok(1370, 768)                # control knob
    finally:
        del os.environ["APLA_FUSED_LONG"]
        if old is not None:
            os.environ["APLA_FUSED_LONG_BQ"] = old


def test_apla_attention_dispatches_long_kernel(monkeypatch):
    """apla_attention routes beyond-envelope sequences to the long kernel
    (spy) and the output matches the XLA path."""
    import apla_tpu.ops.attention as attention_mod  # noqa: F401
    from apla_tpu.ops.attention import apla_attention

    qkv, w_t, b_t, w_frozen, b_frozen, inds, H, scale = _make(N=150)
    C = w_frozen.shape[0]
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 150, C)) * 0.2
    frozen = {"qkv": {"kernel": jax.random.normal(
        jax.random.PRNGKey(10), (C, 3 * C)) * 0.05},
        "proj": {"kernel": w_frozen, "bias": b_frozen}, "inds": inds}
    trainable = {"proj_wt": w_t, "proj_bt": b_t}

    out_xla = apla_attention(x, frozen, trainable, H, scale=scale,
                             use_fused=False)

    calls = []
    real = pallas_apla_attn_long.fused_apla_attention_long

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(pallas_apla_attn_long, "fused_apla_attention_long",
                        spy)
    # make N=150 "beyond the monolithic envelope" by shrinking the budget
    # below its bwd bytes but above the long kernel's strip working set
    monkeypatch.setenv("APLA_FUSED_MIN_N", "1")
    monkeypatch.setenv("APLA_FUSED_VMEM_MB", "0.4")
    assert not pallas_apla_attn.fused_fits(150, C)
    assert long_fused_ok(150, C)
    out = apla_attention(x, frozen, trainable, H, scale=scale,
                         use_fused=True)
    assert calls, "long kernel did not dispatch"
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_xla),
                               rtol=2e-3, atol=2e-3)


def test_long_accum_scan_gate(monkeypatch):
    """Inside an accum microbatch scan the long kernel declines
    micro-batches beyond the hardware-validated bound (r5_long_fused:
    monolithic b8 + accum micro-b4 compile, accum micro-b8 aborts the
    compiler) — never reachable from a training job."""
    from apla_tpu.ops.pallas_apla_attn import accum_scan_trace, in_accum_scan

    assert not in_accum_scan()
    assert long_fused_ok(1370, 768, b=8)          # monolithic b8 ok
    with accum_scan_trace():
        assert in_accum_scan()
        assert long_fused_ok(1370, 768, b=4)      # validated accum micro
        assert not long_fused_ok(1370, 768, b=8)  # the crash config
        monkeypatch.setenv("APLA_FUSED_LONG_ACCUM_BMAX", "8")
        assert long_fused_ok(1370, 768, b=8)      # explicit override
    assert not in_accum_scan()
    monkeypatch.delenv("APLA_FUSED_LONG_ACCUM_BMAX")
    assert long_fused_ok(1370, 768, b=8)


def test_accum_builders_mark_the_scan_trace():
    """The supervised accum body runs its microbatch trace inside
    accum_scan_trace() so kernel admission can see it (probed via the
    criterion, which executes at trace time inside the body)."""
    import optax

    from apla_tpu.apla.core import AplaConfig
    from apla_tpu.models.classifier import init_classifier
    from apla_tpu.models.vit import ViTConfig
    from apla_tpu.ops.pallas_apla_attn import in_accum_scan
    from apla_tpu.train.optim import build_optimizer
    from apla_tpu.train.steps import make_train_step
    from apla_tpu.train.train_state import TrainState

    cfg = ViTConfig(img_size=28, patch_size=14, embed_dim=32, depth=1,
                    num_heads=2, compute_dtype=jnp.float32)
    seen = []

    def probe_criterion(logits, labels):
        seen.append(in_accum_scan())
        return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            logits, labels))

    batch = {"image": jnp.zeros((4, 28, 28, 3), jnp.float32),
             "label": jnp.zeros((4,), jnp.int32)}
    for accum, expect in ((1, False), (2, True)):
        seen.clear()
        # fresh params per variant: the step donates its state buffers
        trainable, frozen = init_classifier(
            jax.random.PRNGKey(0), cfg, n_classes=3,
            apla_cfg=AplaConfig(partial_size=4))
        tx = build_optimizer("AdamW", {"lr": 1e-3}, trainable)
        step = make_train_step(cfg, tx, probe_criterion, accum_steps=accum)
        state = TrainState.create(trainable, tx)
        state, m = step(state, frozen, batch, 1e-3, jax.random.PRNGKey(1))
        assert float(m["loss"]) > 0
        assert seen and all(s is expect for s in seen), (accum, seen)
