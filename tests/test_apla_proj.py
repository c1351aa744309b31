"""Numeric tests of the APLA projection custom_vjp against a naive reference.

Mirrors the reference semantics check from SURVEY.md §4(b): forward parity
with a dense two-matmul+scatter implementation, grads only on trainable
columns, frozen-weight gradients never produced.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apla_tpu.ops.apla_proj import apla_proj


def naive_apla(x, w_t, b_t, w_frozen, b_frozen, inds):
    """Direct port of the reference maths (appla_attn.py:64-79) in jnp:
    trainable channels get x @ w_t, frozen channels keep the frozen kernel."""
    w = w_frozen.at[:, inds].set(w_t)
    b = b_frozen.at[inds].set(b_t)
    return x @ w + b


@pytest.fixture
def setup():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    d, k, B, N = 64, 8, 2, 5
    x = jax.random.normal(ks[0], (B, N, d))
    w_frozen = jax.random.normal(ks[1], (d, d)) * 0.02
    b_frozen = jax.random.normal(ks[2], (d,)) * 0.02
    inds = jnp.asarray(np.random.default_rng(0).permutation(d)[:k])
    w_t = jax.random.normal(ks[3], (d, k)) * 0.02
    b_t = jax.random.normal(ks[4], (k,)) * 0.02
    return x, w_t, b_t, w_frozen, b_frozen, inds


def test_forward_matches_naive(setup):
    out = apla_proj(*setup)
    ref = naive_apla(*setup)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_grads_match_naive(setup):
    x, w_t, b_t, w_frozen, b_frozen, inds = setup

    def loss_ours(x, w_t, b_t):
        return jnp.sum(apla_proj(x, w_t, b_t, w_frozen, b_frozen, inds) ** 2)

    def loss_ref(x, w_t, b_t):
        return jnp.sum(naive_apla(x, w_t, b_t, w_frozen, b_frozen, inds) ** 2)

    g_ours = jax.grad(loss_ours, argnums=(0, 1, 2))(x, w_t, b_t)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w_t, b_t)
    for a, b in zip(g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_frozen_receives_no_grad(setup):
    """grad w.r.t. frozen kernel is a symbolic zero — the custom VJP returns
    None, so differentiating w.r.t. it must raise or yield zeros."""
    x, w_t, b_t, w_frozen, b_frozen, inds = setup

    def loss(w_frozen):
        return jnp.sum(apla_proj(x, w_t, b_t, w_frozen, b_frozen, inds))

    g = jax.grad(loss)(w_frozen)
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_shadowed_frozen_columns_ignored(setup):
    """Values stored in the frozen kernel at trainable columns must not
    affect the output (they are shadowed by the scatter)."""
    x, w_t, b_t, w_frozen, b_frozen, inds = setup
    w_poisoned = w_frozen.at[:, inds].set(999.0)
    b_poisoned = b_frozen.at[inds].set(999.0)
    out1 = apla_proj(x, w_t, b_t, w_frozen, b_frozen, inds)
    out2 = apla_proj(x, w_t, b_t, w_poisoned, b_poisoned, inds)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


def test_full_rank_equals_dense(setup):
    x, _, _, w_frozen, b_frozen, _ = setup
    d = x.shape[-1]
    inds_full = jnp.arange(d)
    w = jax.random.normal(jax.random.PRNGKey(9), (d, d)) * 0.02
    b = jnp.zeros((d,))
    out = apla_proj(x, w, b, jnp.zeros_like(w_frozen), jnp.zeros_like(b_frozen), inds_full)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x @ w + b), rtol=1e-5)
