"""Scheduler parity tests (reference MixedLRScheduler semantics,
`_utils.py:369-415` + wrappers.py construction rules)."""

import numpy as np
import pytest

from apla_tpu.train.schedules import LRScheduler, cosine_with_warmup_table


def test_linear_warmup_then_cosine():
    sched = LRScheduler(
        ["LinearWarmup", "CosineAnnealingLR"],
        {"LinearWarmup": {"warmup_iters": 10},
         "CosineAnnealingLR": {"eta_min": 1e-6}},
        max_lr=1e-3, steps_per_epoch=10, epochs=10)
    # ramps up during warmup
    assert sched.lr(0) < sched.lr(5) < sched.lr(9)
    assert sched.lr(9) == pytest.approx(1e-3, rel=1e-6)
    # cosine decays after warmup down to eta_min at the end
    assert sched.lr(10) > sched.lr(50) > sched.lr(99)
    assert sched.lr(99) == pytest.approx(1e-6, abs=5e-7)
    assert sched.lr(100) == pytest.approx(1e-6, rel=1e-6)  # full decay


def test_warmup_epochs_takes_precedence():
    sched = LRScheduler(
        ["LinearWarmup"],
        {"LinearWarmup": {"warmup_iters": 500, "warmup_epochs": 2}},
        max_lr=1.0, steps_per_epoch=10, epochs=10)
    assert sched.warmup_iters == 20  # 2 epochs * 10 steps (reference rule)


def test_multistep_decay():
    sched = LRScheduler(
        ["MultiStepLR"],
        {"MultiStepLR": {"milestones": [1, 2], "gamma": 0.1}},
        max_lr=1.0, steps_per_epoch=10, epochs=3)
    assert sched.lr(5) == pytest.approx(1.0)
    assert sched.lr(15) == pytest.approx(0.1)
    assert sched.lr(25) == pytest.approx(0.01)


def test_polynomial():
    sched = LRScheduler(
        ["PolynomialLR"], {"PolynomialLR": {"power": 1.0}},
        max_lr=1.0, steps_per_epoch=10, epochs=1)
    assert sched.lr(0) == pytest.approx(1.0)
    assert sched.lr(5) == pytest.approx(0.5)


def test_reduce_on_plateau():
    sched = LRScheduler(
        ["ReduceLROnPlateau"],
        {"ReduceLROnPlateau": {"mode": "max", "factor": 0.1, "patience": 1}},
        max_lr=1.0, steps_per_epoch=10, epochs=10)
    sched.epoch_feedback(val_target=0.5)
    sched.epoch_feedback(val_target=0.4)  # bad 1
    assert sched.lr(0) == pytest.approx(1.0)
    sched.epoch_feedback(val_target=0.4)  # bad 2 > patience -> decay
    assert sched.lr(0) == pytest.approx(0.1)


def test_onecycle_linear():
    sched = LRScheduler(
        ["OneCycleLR"],
        {"OneCycleLR": {"anneal_strategy": "linear",
                        "final_div_factor": 1e4}},
        max_lr=1.0, steps_per_epoch=10, epochs=10)
    peak_it = int(0.3 * 100)
    assert sched.lr(peak_it) == pytest.approx(1.0, rel=0.05)
    assert sched.lr(0) < 1e-6   # div_factor = max_lr/1e-8
    assert sched.lr(99) < sched.lr(peak_it)


def test_unknown_scheduler_rejected():
    with pytest.raises(ValueError):
        LRScheduler(["Nope"], {}, max_lr=1.0, steps_per_epoch=1, epochs=1)


def test_cosine_table_matches_reference_shape():
    """reference CosineSchedulerWithWarmup (_utils.py:261-288)."""
    t = cosine_with_warmup_table(0.99, 1.0, 100, warmup_iters=10,
                                 warmup_init_val=0.5)
    assert len(t) == 100
    assert t[0] == pytest.approx(0.5)
    assert t[9] == pytest.approx(0.99, abs=0.01)
    assert t[-1] == pytest.approx(1.0, abs=1e-3)
    # monotone increase toward 1.0 after warmup
    assert np.all(np.diff(t[10:]) >= -1e-9)


def test_state_dict_roundtrip():
    sched = LRScheduler(
        ["ReduceLROnPlateau"],
        {"ReduceLROnPlateau": {"mode": "min", "factor": 0.5, "patience": 0}},
        max_lr=1.0, steps_per_epoch=1, epochs=1)
    sched.epoch_feedback(val_loss=1.0)
    sched.epoch_feedback(val_loss=2.0)  # worse -> decay immediately
    st = sched.state_dict()
    s2 = LRScheduler(
        ["ReduceLROnPlateau"],
        {"ReduceLROnPlateau": {"mode": "min", "factor": 0.5, "patience": 0}},
        max_lr=1.0, steps_per_epoch=1, epochs=1)
    s2.load_state_dict(st)
    assert s2.lr(0) == sched.lr(0) == pytest.approx(0.5)
