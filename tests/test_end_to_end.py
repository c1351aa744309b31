"""End-to-end integration: train a tiny APLA ViT on synthetic data over an
8-device CPU mesh; loss decreases; checkpoint round-trips; frozen params
never change (SURVEY.md §4(c)/(d))."""

import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy virtual-mesh integration tier

from apla_tpu.utils.config import load_merged_params
from apla_tpu.wrapper import DefaultWrapper
from apla_tpu.train.trainer import Trainer

PARAMS = os.path.join(os.path.dirname(__file__), "..", "params", "synthetic",
                      "vit_tiny", "apla.yml")


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    params = load_merged_params(PARAMS)
    params.training_params.epochs = 2
    params.training_params.log_every = 1
    params.training_params.save_dir = str(tmp_path_factory.mktemp("ckpt"))
    params.dataset_params.synthetic_size = 256
    wrapper = DefaultWrapper(params)
    wrapper.instantiate()
    frozen_before = jax.tree.map(np.asarray, wrapper.frozen)
    # snapshot: the train step donates its state buffers, so the original
    # trainable arrays are consumed by training
    trainable_before = jax.tree.map(np.asarray, wrapper.trainable)
    trainer = Trainer(wrapper)
    trainer.train()
    return wrapper, trainer, frozen_before, trainable_before


def test_loss_decreases(trained):
    wrapper, trainer, _, _ = trained
    path = os.path.join(trainer.save_dir, f"{trainer.model_name}.metrics.jsonl")
    import json
    losses = [json.loads(l)["train_loss"] for l in open(path)
              if "train_loss" in l]
    assert len(losses) >= 2
    assert losses[-1] < losses[0], f"no learning: {losses[0]} -> {losses[-1]}"


def test_frozen_params_unchanged(trained):
    wrapper, trainer, frozen_before, _ = trained
    frozen_after = jax.tree.map(np.asarray, trainer.frozen)
    for a, b in zip(jax.tree.leaves(frozen_before),
                    jax.tree.leaves(frozen_after)):
        np.testing.assert_array_equal(a, b)


def test_trainable_params_changed(trained):
    wrapper, trainer, _, trainable_before = trained
    wt = np.asarray(trainer.state.trainable["backbone"]["blocks"]["proj_wt"])
    wt0 = trainable_before["backbone"]["blocks"]["proj_wt"]
    assert np.abs(wt - wt0).max() > 0


def test_checkpoint_roundtrip(trained):
    wrapper, trainer, _, _ = trained
    from apla_tpu.train.checkpoint import load_checkpoint
    state, frozen, manifest, best, _ = load_checkpoint(
        trainer.checkpoint_path, state_template=trainer.state,
        frozen_template=trainer.frozen)
    assert manifest["iters"] == trainer.iters
    np.testing.assert_allclose(
        np.asarray(state.trainable["fc"]["kernel"]),
        np.asarray(trainer.state.trainable["fc"]["kernel"]))


def test_test_metrics(trained):
    wrapper, trainer, _, _ = trained
    results = trainer.test()
    assert "test_accuracy" in results
    # synthetic task is easy — should be far above chance (0.1)
    assert results["test_accuracy"] > 0.3


def test_resume_session(trained, tmp_path):
    wrapper, trainer, _, _ = trained
    params = load_merged_params(PARAMS)
    params.training_params.epochs = 2
    params.training_params.restore_session = True
    params.training_params.save_dir = trainer.save_dir
    params.dataset_params.synthetic_size = 256
    w2 = DefaultWrapper(params)
    w2.instantiate()
    t2 = Trainer(w2)
    t2.load_session()
    assert t2.iters == trainer.iters
    np.testing.assert_allclose(
        np.asarray(t2.state.trainable["fc"]["kernel"]),
        np.asarray(trainer.state.trainable["fc"]["kernel"]))


def test_linear_probe_freeze_backbone(tmp_path):
    """freeze_backbone: only the fc head trains (reference linear-probe /
    --knn setup, main.py:148-155)."""
    params = load_merged_params(PARAMS)
    del params.model_params["adaptation"]
    params.model_params.freeze_backbone = True
    params.training_params.epochs = 1
    params.training_params.save_dir = str(tmp_path)
    params.dataset_params.synthetic_size = 128
    wrapper = DefaultWrapper(params)
    wrapper.instantiate()
    assert set(wrapper.trainable.keys()) == {"fc"}
    trainer = Trainer(wrapper)
    trainer.train()
    assert np.isfinite(trainer.best_val_target)


def test_full_finetune_mode(tmp_path):
    """No adaptation + no freeze: the whole backbone trains."""
    params = load_merged_params(PARAMS)
    del params.model_params["adaptation"]
    params.training_params.epochs = 1
    params.training_params.save_dir = str(tmp_path)
    params.dataset_params.synthetic_size = 64
    wrapper = DefaultWrapper(params)
    wrapper.instantiate()
    assert "backbone" in wrapper.trainable and wrapper.frozen == {}
    trainer = Trainer(wrapper)
    trainer.train()
    assert np.isfinite(trainer.best_val_target)


def test_preemption_checkpoint(tmp_path):
    """A preemption flag mid-training saves a resumable checkpoint and
    returns cleanly."""
    params = load_merged_params(PARAMS)
    params.training_params.epochs = 50  # would run long without preemption
    params.training_params.val_every = 100
    params.training_params.save_dir = str(tmp_path)
    params.dataset_params.synthetic_size = 128
    wrapper = DefaultWrapper(params)
    wrapper.instantiate()
    trainer = Trainer(wrapper)

    orig_step = trainer.train_step
    calls = {"n": 0}

    def counting_step(*a, **k):
        calls["n"] += 1
        if calls["n"] == 3:
            trainer._preempted = True  # simulate SIGTERM delivery
        return orig_step(*a, **k)

    trainer.train_step = counting_step
    trainer.train()
    assert calls["n"] == 3  # stopped at the step after the signal
    assert os.path.isdir(trainer.checkpoint_path)
    from apla_tpu.train.checkpoint import load_checkpoint
    _, _, manifest, _, _ = load_checkpoint(
        trainer.checkpoint_path, state_template=trainer.state)
    assert manifest["iters"] == 3
