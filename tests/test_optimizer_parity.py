"""Optimizer-update parity vs torch.optim on synthetic gradient sequences.

The trajectory test (test_trajectory_parity.py) pins AdamW end to end; this
file isolates the OPTIMIZER semantics for the other accepted types
(reference wrappers.py:198-201 instantiates any torch.optim name over the
DINO param groups): identical params, identical 20-step gradient sequences
with a varying lr, weight decay applied only to the >=2-D group, global
grad clipping first — final params must match torch to f32 tolerance.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from apla_tpu.train.optim import build_optimizer, set_lr  # noqa: E402

WD, CLIP, STEPS = 0.1, 0.5, 20


def _run_pair(opt_type, torch_factory, opt_params):
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((4, 3)).astype(np.float32) * 0.5  # decayed
    b0 = rng.standard_normal((3,)).astype(np.float32) * 0.5    # no-WD
    grads = [
        (rng.standard_normal((4, 3)).astype(np.float32),
         rng.standard_normal((3,)).astype(np.float32))
        for _ in range(STEPS)
    ]
    lrs = np.linspace(1e-2, 1e-3, STEPS)

    # ---- torch ----
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    bt = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    opt = torch_factory([
        {"params": [wt], "weight_decay": WD},
        {"params": [bt], "weight_decay": 0.0},
    ])
    for (gw, gb), lr in zip(grads, lrs):
        for group in opt.param_groups:
            group["lr"] = float(lr)
        opt.zero_grad()
        wt.grad = torch.from_numpy(gw.copy())
        bt.grad = torch.from_numpy(gb.copy())
        torch.nn.utils.clip_grad_norm_([wt, bt], CLIP)
        opt.step()

    # ---- ours ----
    params = {"kernel": jnp.asarray(w0), "bias": jnp.asarray(b0)}
    tx = build_optimizer(opt_type, dict(opt_params), params, grad_clip=CLIP)
    state = tx.init(params)
    for (gw, gb), lr in zip(grads, lrs):
        state = set_lr(state, float(lr))
        g = {"kernel": jnp.asarray(gw), "bias": jnp.asarray(gb)}
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["kernel"]),
                               wt.detach().numpy(), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(params["bias"]),
                               bt.detach().numpy(), rtol=2e-5, atol=2e-6)


def test_adamw_parity():
    _run_pair(
        "AdamW",
        lambda groups: torch.optim.AdamW(groups, lr=1e-2, weight_decay=WD),
        {"lr": 1e-2, "weight_decay": WD})


def test_adam_parity():
    # plain Adam couples weight decay INTO the gradient (L2), unlike AdamW
    _run_pair(
        "Adam",
        lambda groups: torch.optim.Adam(groups, lr=1e-2, weight_decay=WD),
        {"lr": 1e-2, "weight_decay": WD})


def test_sgd_momentum_parity():
    _run_pair(
        "SGD",
        lambda groups: torch.optim.SGD(groups, lr=1e-2, momentum=0.9),
        {"lr": 1e-2, "weight_decay": WD, "momentum": 0.9})


def test_sgd_plain_parity():
    # no momentum configured -> torch default (0)
    _run_pair(
        "SGD",
        lambda groups: torch.optim.SGD(groups, lr=1e-2),
        {"lr": 1e-2, "weight_decay": WD})


def test_rmsprop_parity():
    # torch RMSprop: alpha 0.99, eps OUTSIDE the sqrt, coupled decay
    _run_pair(
        "RMSprop",
        lambda groups: torch.optim.RMSprop(groups, lr=1e-2),
        {"lr": 1e-2, "weight_decay": WD})


def test_rmsprop_momentum_parity():
    _run_pair(
        "RMSprop",
        lambda groups: torch.optim.RMSprop(groups, lr=1e-2, momentum=0.9,
                                           alpha=0.95),
        {"lr": 1e-2, "weight_decay": WD, "momentum": 0.9, "alpha": 0.95})
