"""Fused prototype-CE kernel (ops/pallas_proto_ce.py) vs a dense oracle —
interpret mode (CPU).  The oracle is the separate-ops math the DINOv2 step
uses today: materialised student/teacher logits, teacher softmax with
centering, student log-softmax, row-wise CE.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apla_tpu.ops import pallas_proto_ce as ppc
from apla_tpu.ops.pallas_proto_ce import proto_ce


@pytest.fixture(autouse=True)
def _interpret():
    old = ppc.INTERPRET
    ppc.INTERPRET = True
    yield
    ppc.INTERPRET = old


def dense_ce(xs, ws, xt, wt, center, teacher_temp, student_temp):
    s = jnp.dot(xs.astype(jnp.float32), ws.astype(jnp.float32))
    t = jnp.dot(xt.astype(jnp.float32), wt.astype(jnp.float32))
    p_t = jax.nn.softmax((t - center.reshape(1, -1)) / teacher_temp, axis=-1)
    lsm = jax.nn.log_softmax(s / student_temp, axis=-1)
    return -jnp.sum(jax.lax.stop_gradient(p_t) * lsm, axis=-1)


def make_inputs(key, R, D, K):
    ks = jax.random.split(key, 5)
    xs = jax.random.normal(ks[0], (R, D), jnp.float32)
    xs = xs / jnp.linalg.norm(xs, axis=-1, keepdims=True)
    xt = jax.random.normal(ks[1], (R, D), jnp.float32)
    xt = xt / jnp.linalg.norm(xt, axis=-1, keepdims=True)
    ws = jax.random.normal(ks[2], (D, K), jnp.float32)
    ws = ws / jnp.linalg.norm(ws, axis=0, keepdims=True)
    wt = jax.random.normal(ks[3], (D, K), jnp.float32)
    wt = wt / jnp.linalg.norm(wt, axis=0, keepdims=True)
    center = 0.1 * jax.random.normal(ks[4], (K,), jnp.float32)
    return xs, ws, xt, wt, center


@pytest.mark.parametrize("R,D,K", [
    (10, 16, 300),       # single block, padding in every dim
    (24, 256, 512),      # recipe bottleneck width
])
def test_forward_matches_dense(R, D, K):
    xs, ws, xt, wt, center = make_inputs(jax.random.PRNGKey(0), R, D, K)
    tt = jnp.float32(0.07)
    out = proto_ce(xs, ws, xt, wt, center, tt, 0.1)
    ref = dense_ce(xs, ws, xt, wt, center, tt, 0.1)
    assert out.shape == (R,)
    # bf16 matmul inputs vs the oracle's f32: logits agree to ~1e-2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)


def test_multi_block_grid():
    """Rows and prototypes spanning several tiles (forces the online
    rescaling and both accumulator revisit patterns)."""
    ppc_br, ppc_bk = ppc._BR, ppc._BK
    try:
        ppc._BR, ppc._BK = 16, 256
        R, D, K = 50, 32, 900        # 4 row tiles x 4 K blocks (padded)
        xs, ws, xt, wt, center = make_inputs(jax.random.PRNGKey(1), R, D, K)
        tt = jnp.float32(0.04)
        out = proto_ce(xs, ws, xt, wt, center, tt, 0.1)
        ref = dense_ce(xs, ws, xt, wt, center, tt, 0.1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=3e-2, atol=3e-2)
    finally:
        ppc._BR, ppc._BK = ppc_br, ppc_bk


def test_gradients_match_dense():
    R, D, K = 20, 64, 700
    xs, ws, xt, wt, center = make_inputs(jax.random.PRNGKey(2), R, D, K)
    tt = jnp.float32(0.07)
    w_rows = jax.random.uniform(jax.random.PRNGKey(3), (R,))

    def loss_fused(xs, ws):
        return jnp.sum(w_rows * proto_ce(xs, ws, xt, wt, center, tt, 0.1))

    def loss_dense(xs, ws):
        return jnp.sum(w_rows * dense_ce(xs, ws, xt, wt, center, tt, 0.1))

    lf = loss_fused(xs, ws)
    ld = loss_dense(xs, ws)
    np.testing.assert_allclose(float(lf), float(ld), rtol=2e-2)
    gf = jax.grad(loss_fused, argnums=(0, 1))(xs, ws)
    gd = jax.grad(loss_dense, argnums=(0, 1))(xs, ws)
    for a, b, name in zip(gf, gd, ("dxs", "dws")):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        denom = max(np.abs(b).max(), 1e-4)
        assert np.abs(a - b).max() / denom < 5e-2, name


def test_teacher_side_gets_no_gradient():
    R, D, K = 8, 16, 256
    xs, ws, xt, wt, center = make_inputs(jax.random.PRNGKey(4), R, D, K)
    tt = jnp.float32(0.07)

    def loss(xt, wt, center, tt):
        return jnp.sum(proto_ce(xs, ws, xt, wt, center, tt, 0.1))

    g = jax.grad(loss, argnums=(0, 1, 2, 3))(xt, wt, center, tt)
    for a in g:
        assert float(jnp.abs(a).max()) == 0.0


def test_under_jit_and_traced_teacher_temp():
    """teacher_temp is a traced schedule value in the real step."""
    R, D, K = 12, 32, 300
    xs, ws, xt, wt, center = make_inputs(jax.random.PRNGKey(5), R, D, K)

    @jax.jit
    def f(tt):
        return jnp.sum(proto_ce(xs, ws, xt, wt, center, tt, 0.1))

    a, b = float(f(jnp.float32(0.04))), float(f(jnp.float32(0.07)))
    assert np.isfinite(a) and np.isfinite(b) and a != b


def _build_trainer(fused, accum=1):
    import os
    from apla_tpu.ssl.dinov2 import Dinov2Trainer, DINOv2Wrapper
    from apla_tpu.utils.config import load_merged_params
    params = load_merged_params(os.path.join(
        os.path.dirname(__file__), "..", "params", "synthetic", "vit_tiny",
        "dinov2.yml"))
    params.dataset_params.synthetic_size = 16
    for ld in ("trainloader", "valloader", "testloader"):
        params.dataloader_params[ld].batch_size = 4
    params.training_params.is_dry = True
    params.training_params.accum_steps = accum
    params.model_params.dinov2.fused_proto_ce = fused
    w = DINOv2Wrapper(params)
    w.instantiate()
    return w, Dinov2Trainer(w)


@pytest.mark.parametrize(
    "accum,mode", [(1, True), (1, "ibot"),
                   pytest.param(2, True, marks=pytest.mark.slow)])
def test_full_dinov2_step_parity_fused_vs_xla(accum, mode):
    """fused_proto_ce through the REAL wrapper/trainer: one full DINOv2
    train step (losses, trainable update, BOTH center recurrences) must
    match the XLA path — monolithic AND under gradient accumulation (the
    teacher bottlenecks ride the same micro-sliced channels the softmaxed
    targets use).  mode "ibot" fuses only the iBOT call site (the r5
    hardware winner); dino sites keep the dense math."""
    w1, t1 = _build_trainer(False, accum)
    loader = w1.dataloaders.trainloader
    loader.set_epoch(0)
    batch = next(iter(loader))
    db = t1._device_batch(batch)
    st1, m1 = t1._get_step(False)(t1.state, t1.frozen, db,
                                  1e-4, 0.04, 0.994, 0.07, t1.rng)

    _, t2 = _build_trainer(mode, accum)
    st2, m2 = t2._get_step(False)(t2.state, t2.frozen, db,
                                  1e-4, 0.04, 0.994, 0.07, t2.rng)

    for k in m1:
        np.testing.assert_allclose(float(m2[k]), float(m1[k]),
                                   rtol=5e-3, atol=5e-3, err_msg=k)
    deltas = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        st1.trainable, st2.trainable))
    assert max(deltas) < 2e-3
    assert float(jnp.abs(st1.dino_center - st2.dino_center).max()) < 1e-6
    assert float(jnp.abs(st1.ibot_center - st2.ibot_center).max()) < 1e-6


def test_fused_mode_typo_rejected():
    """A config typo ('iBOT', quoted 'true', 'dino', ...) must raise, not
    silently run the dense math (the shipped 179.2 img/s record depends on
    the exact string 'ibot')."""
    from apla_tpu.ssl.dinov2 import make_dinov2_train_step
    from apla_tpu.utils.config import EDict

    def cfg_with(mode):
        return EDict({
            "dino": {"loss_weight": 1.0, "koleo_loss_weight": 0.1},
            "ibot": {"loss_weight": 1.0},
            "fused_proto_ce": mode,
        })

    for bad in ("iBOT", "true", "dino"):
        with pytest.raises(ValueError, match="fused_proto_ce"):
            make_dinov2_train_step(None, None, cfg_with(bad),
                                   n_global=2, n_local=8,
                                   freeze_last_layer=False)
    # YAML `fused_proto_ce: 1` is a truthy alias for true (1 == True) and
    # must keep working
    make_dinov2_train_step(None, None, cfg_with(1), n_global=2, n_local=8,
                           freeze_last_layer=False)
