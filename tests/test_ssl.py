"""SSL stack smoke tests: BYOL / SimSiam / DINO on synthetic data (CPU mesh).

Checks the reference invariants: teacher starts equal to student
(BYOL/models.py:118), EMA moves the teacher, losses are finite and improve,
kNN eval produces metrics.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy virtual-mesh integration tier

from apla_tpu.utils.config import load_merged_params

PARAMS = os.path.join(os.path.dirname(__file__), "..", "params", "synthetic",
                      "vit_tiny", "apla.yml")


def ssl_params(tmp_path, **over):
    params = load_merged_params(PARAMS)
    params.training_params.epochs = 1
    params.training_params.log_every = 1
    params.training_params.val_every = 1.0
    params.training_params.save_dir = str(tmp_path)
    params.dataset_params.synthetic_size = 64
    params.dataloader_params.trainloader.batch_size = 16
    params.dataloader_params.valloader.batch_size = 16
    params.dataloader_params.testloader.batch_size = 16
    params.dataset_params.ssl_global_size = 32
    params.dataset_params.ssl_local_size = 16
    for k, v in over.items():
        params[k] = v
    return params


def test_byol_trains(tmp_path):
    from apla_tpu.ssl.byol import BYOLTrainer, BYOLWrapper
    wrapper = BYOLWrapper(ssl_params(tmp_path), use_momentum=True)
    wrapper.instantiate()
    # teacher == student at init
    s = wrapper.state
    np.testing.assert_allclose(
        np.asarray(s.teacher["head"]["fc0"]["kernel"]),
        np.asarray(s.trainable["head"]["fc0"]["kernel"]))
    trainer = BYOLTrainer(wrapper)
    t_before = np.asarray(s.teacher["head"]["fc0"]["kernel"])
    trainer.train()
    assert np.isfinite(float(trainer.best_val_target))
    t_after = np.asarray(trainer.state.teacher["head"]["fc0"]["kernel"])
    assert np.abs(t_after - t_before).max() > 0, "EMA never moved the teacher"


def test_simsiam_trains(tmp_path):
    from apla_tpu.ssl.byol import BYOLTrainer, BYOLWrapper
    wrapper = BYOLWrapper(ssl_params(tmp_path), use_momentum=False)
    wrapper.instantiate()
    trainer = BYOLTrainer(wrapper)
    trainer.train()
    results = trainer.test()
    assert any(k.startswith("knn_val_") for k in results)


def test_dino_trains(tmp_path):
    from apla_tpu.ssl.dino import DINOTrainer, DINOWrapper
    params = ssl_params(tmp_path)
    wrapper = DINOWrapper(params)
    wrapper.instantiate()
    trainer = DINOTrainer(wrapper)
    trainer.n_local = 8
    c_before = np.asarray(wrapper.state.center)
    trainer.train()
    c_after = np.asarray(trainer.state.center)
    assert np.abs(c_after - c_before).max() > 0, "centering never updated"
    assert np.isfinite(float(trainer.best_val_target))


def test_dino_loss_properties():
    """Same-view pairs are skipped; loss is positive CE."""
    from apla_tpu.ssl.dino import dino_loss
    key = jax.random.PRNGKey(0)
    B, K = 8, 32
    s = [jax.random.normal(jax.random.PRNGKey(i), (B, K)) for i in range(4)]
    t = [jax.random.normal(jax.random.PRNGKey(10 + i), (B, K))
         for i in range(2)]
    center = jnp.zeros((1, K))
    loss, new_center = dino_loss(s, t, center, teacher_temp=0.07)
    assert float(loss) > 0
    assert np.abs(np.asarray(new_center)).max() > 0


def test_byol_loss_range():
    from apla_tpu.ssl.byol import byol_loss, simsiam_loss
    x = [jnp.ones((4, 8)), jnp.ones((4, 8))]
    y = [jnp.ones((4, 8)), jnp.ones((4, 8))]
    # identical views: byol loss 0, simsiam loss -1 (two pairs of -0.5)
    assert float(byol_loss(x, y)) == pytest.approx(0.0, abs=1e-5)
    assert float(simsiam_loss(x, y)) == pytest.approx(-1.0, abs=1e-5)


def test_custom_augmentation_strategy_file(tmp_path):
    """A user-supplied reference-format augmentation_strategy.json overrides
    the builtin multi-crop recipe end-to-end through a DINO wrapper
    (reference wrappers.py:343-379)."""
    import json

    from apla_tpu.ssl.dino import DINOWrapper

    crop = {
        "RandomResizedCrop": {"apply": True, "size": 24,
                              "scale": [0.4, 1.0]},
        "HorizontalFlip": {"apply": True, "p": 0.5},
    }
    local = {
        "RandomResizedCrop": {"apply": True, "size": 8,
                              "scale": [0.05, 0.4]},
    }
    strategy = {
        "general_args": {"overwrite_defaults": True,
                         "inherit": ["Resize", "Normalize"]},
        "repetition_strategy": {"n_augmentations": [1, 3],
                                "order": ["global_1", "local"]},
        "transforms": {"train_transforms": {"global_1": crop,
                                            "local": local}},
    }
    spath = tmp_path / "strategy.json"
    spath.write_text(json.dumps(strategy))

    params = ssl_params(tmp_path)
    params.dataset_params.augmentation_strategy_path = str(spath)
    wrapper = DINOWrapper(params)

    tt = wrapper.parameters.dataset_params.train_transforms
    assert isinstance(tt, list) and len(tt) == 4  # 1 global + 3 local
    assert tt[0]["RandomResizedCrop"]["size"] == 24
    assert all(t["RandomResizedCrop"]["size"] == 8 for t in tt[1:])
    # inherit pulled Normalize from the dataset's original train_transforms
    assert "Normalize" in tt[0]

    # the dataset yields one crop per pipeline at the declared sizes
    wrapper.instantiate()
    sample = wrapper.dataloaders.trainloader.dataset[0]
    imgs = sample["image"]
    assert isinstance(imgs, list) and len(imgs) == 4
    assert imgs[0].shape[:2] == (24, 24)
    assert imgs[1].shape[:2] == (8, 8)


def test_byol_accum_trains(tmp_path):
    """BYOL with accum_steps: scan over microbatches (per-micro BN = the
    reference's per-rank BatchNorm semantics) — trains with finite loss and
    a moving EMA teacher."""
    from apla_tpu.ssl.byol import BYOLTrainer, BYOLWrapper
    params = ssl_params(tmp_path)
    params.training_params.accum_steps = 4
    wrapper = BYOLWrapper(params, use_momentum=True)
    wrapper.instantiate()
    trainer = BYOLTrainer(wrapper)
    t_before = np.asarray(wrapper.state.teacher["head"]["fc0"]["kernel"])
    trainer.train()
    assert np.isfinite(float(trainer.best_val_target))
    t_after = np.asarray(trainer.state.teacher["head"]["fc0"]["kernel"])
    assert np.abs(t_after - t_before).max() > 0


def test_dino_accum_matches_monolithic(tmp_path):
    """DINO v1 accum: teacher/centering run full-batch, student terms are
    per-image means — the accumulated update must equal the monolithic one
    (f32, no dropout)."""
    from apla_tpu.ssl.dino import DINOTrainer, DINOWrapper

    def run(accum):
        params = ssl_params(tmp_path / f"d{accum}")
        params.training_params.accum_steps = accum
        params.training_params.use_mixed_precision = False
        params.dataloader_params.trainloader.shuffle = False
        wrapper = DINOWrapper(params)
        wrapper.instantiate(seed=0)
        trainer = DINOTrainer(wrapper)
        batch = next(iter(wrapper.dataloaders.trainloader))
        g, l = trainer._stack_views(batch)
        step_fn = trainer._get_step(True)
        state, m = step_fn(trainer.state, trainer.frozen, g, l, 1e-4, 1e-5,
                           0.99, 0.04, jax.random.PRNGKey(5))
        return state, m

    s1, m1 = run(1)
    s4, m4 = run(4)
    np.testing.assert_allclose(float(m1["loss"]), float(m4["loss"]),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(s1.center), np.asarray(s4.center),
                               rtol=1e-6)
    w1 = np.asarray(s1.trainable["backbone"]["blocks"]["proj_wt"])
    w4 = np.asarray(s4.trainable["backbone"]["blocks"]["proj_wt"])
    np.testing.assert_allclose(w1, w4, rtol=1e-4, atol=2e-6)


def test_transfer_learning_pretrained_path(tmp_path):
    """transfer_learning_params.pretrained_path (reference
    wrappers.py:177-179, BYOL/wrappers.py:22-30): supervised checkpoints
    adopt fully into a supervised wrapper and backbone-only into an SSL
    wrapper; teacher starts from the adopted student."""
    from apla_tpu.train.checkpoint import save_checkpoint
    from apla_tpu.wrapper import DefaultWrapper

    params = load_merged_params(PARAMS)
    params.training_params.save_dir = str(tmp_path)
    w1 = DefaultWrapper(params)
    w1.instantiate(seed=0)
    ck = str(tmp_path / "ck")
    save_checkpoint(ck, state=w1.state, frozen=w1.frozen, epoch=0,
                    parameters=dict(params))

    # supervised -> supervised: full strict adoption (different init seed)
    params2 = load_merged_params(PARAMS)
    params2.training_params.save_dir = str(tmp_path)
    params2.transfer_learning_params = {"pretrained_path": ck}
    w2 = DefaultWrapper(params2)
    w2.instantiate(seed=1)
    np.testing.assert_array_equal(
        np.asarray(w2.state.trainable["backbone"]["blocks"]["proj_wt"]),
        np.asarray(w1.state.trainable["backbone"]["blocks"]["proj_wt"]))
    np.testing.assert_array_equal(
        np.asarray(w2.state.trainable["fc"]["kernel"]),
        np.asarray(w1.state.trainable["fc"]["kernel"]))

    # supervised -> DINO: backbone-only adoption; teacher copies student
    from apla_tpu.ssl.dino import DINOWrapper
    params3 = ssl_params(tmp_path / "ssl")
    params3.transfer_learning_params = {"pretrained_path": ck}
    w3 = DINOWrapper(params3)
    w3.instantiate(seed=2)
    np.testing.assert_array_equal(
        np.asarray(w3.state.trainable["backbone"]["blocks"]["proj_wt"]),
        np.asarray(w1.state.trainable["backbone"]["blocks"]["proj_wt"]))
    np.testing.assert_array_equal(
        np.asarray(w3.state.teacher["backbone"]["blocks"]["proj_wt"]),
        np.asarray(w1.state.trainable["backbone"]["blocks"]["proj_wt"]))


def test_custom_strategy_crop_counts_flow_to_trainer(tmp_path):
    """Crop COUNTS from a user strategy file drive the trainer/collate
    (reference set_crops_params reads them from the json): 2 global + 4
    local through a real DINO step."""
    import json

    from apla_tpu.ssl.dino import DINOTrainer, DINOWrapper

    g = {"RandomResizedCrop": {"apply": True, "size": 24,
                               "scale": [0.4, 1.0]}}
    l = {"RandomResizedCrop": {"apply": True, "size": 8,
                               "scale": [0.05, 0.4]}}
    strategy = {
        "general_args": {"overwrite_defaults": True,
                         "inherit": ["Resize", "Normalize"]},
        "repetition_strategy": {"n_augmentations": [1, 1, 4],
                                "order": ["global_1", "global_2", "local"]},
        "transforms": {"train_transforms": {"global_1": g, "global_2": g,
                                            "local": l}},
    }
    spath = tmp_path / "strategy.json"
    spath.write_text(json.dumps(strategy))

    params = ssl_params(tmp_path)
    params.dataset_params.augmentation_strategy_path = str(spath)
    wrapper = DINOWrapper(params)
    wrapper.instantiate()
    trainer = DINOTrainer(wrapper)
    assert trainer.n_global == 2 and trainer.n_local == 4
    batch = next(iter(wrapper.dataloaders.trainloader))
    gstack, lstack = trainer._stack_views(batch)
    assert gstack.shape[0] == 2 * batch["label"].shape[0]
    assert lstack.shape[0] == 4 * batch["label"].shape[0]
    step_fn = trainer._get_step(True)
    state, m = step_fn(trainer.state, trainer.frozen, gstack, lstack, 1e-4,
                       1e-5, 0.99, 0.04, trainer.rng)
    assert np.isfinite(float(m["loss"]))


def test_byol_transfer_syncs_teacher_head(tmp_path):
    """Full-scope transfer into BYOL must copy the WHOLE online network to
    the target (reference BYOL/wrappers.py:30) — teacher head included."""
    from apla_tpu.ssl.byol import BYOLTrainer, BYOLWrapper
    from apla_tpu.train.checkpoint import save_checkpoint

    p1 = ssl_params(tmp_path / "src")
    w1 = BYOLWrapper(p1, use_momentum=True)
    w1.instantiate(seed=0)
    ck = str(tmp_path / "ck")
    save_checkpoint(ck, state=w1.state, frozen=w1.frozen, epoch=0,
                    parameters=dict(p1))

    p2 = ssl_params(tmp_path / "dst")
    p2.transfer_learning_params = {"pretrained_path": ck}
    w2 = BYOLWrapper(p2, use_momentum=True)
    w2.instantiate(seed=5)
    np.testing.assert_array_equal(
        np.asarray(w2.state.teacher["head"]["fc0"]["kernel"]),
        np.asarray(w1.state.trainable["head"]["fc0"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(w2.state.teacher["head"]["fc0"]["kernel"]),
        np.asarray(w2.state.trainable["head"]["fc0"]["kernel"]))


def test_inactive_strategy_file_keeps_builtin_counts(tmp_path):
    """A strategy file with overwrite_defaults=false must not drive crop
    counts while the transform pipeline ignores it."""
    import json

    from apla_tpu.ssl.multicrop import resolve_strategy_spec
    from apla_tpu.utils.config import EDict

    strategy = {
        "general_args": {"overwrite_defaults": False},
        "repetition_strategy": {"n_augmentations": [1, 1],
                                "order": ["global_1", "local"]},
        "transforms": {"train_transforms": {
            "global_1": {"RandomResizedCrop": {"apply": True, "size": 24}},
            "local": {"RandomResizedCrop": {"apply": True, "size": 8}}}},
    }
    spath = tmp_path / "strategy.json"
    spath.write_text(json.dumps(strategy))
    params = EDict({"dataset_params":
                    {"augmentation_strategy_path": str(spath)}})
    spec = resolve_strategy_spec(params, "dino")
    assert spec["n_global"] == 2 and spec["n_local"] == 8  # builtin


def test_locals_before_globals_strategy_rejected(tmp_path):
    import json

    import pytest as pt

    from apla_tpu.ssl.multicrop import spec_from_strategy_json
    strategy = {
        "general_args": {"overwrite_defaults": True},
        "repetition_strategy": {"n_augmentations": [4, 2],
                                "order": ["local", "global_1"]},
        "transforms": {"train_transforms": {
            "global_1": {"RandomResizedCrop": {"apply": True, "size": 24}},
            "local": {"RandomResizedCrop": {"apply": True, "size": 8}}}},
    }
    with pt.raises(ValueError, match="before local"):
        spec_from_strategy_json(strategy)


def test_dinov2_pretrain_to_supervised_finetune_transfer(tmp_path):
    """The canonical APLA workflow: DINOv2 pre-train checkpoint adopts
    backbone-only into a supervised fine-tune wrapper."""
    from apla_tpu.ssl.dinov2 import DINOv2Wrapper
    from apla_tpu.train.checkpoint import save_checkpoint
    from apla_tpu.utils.config import load_merged_params
    from apla_tpu.wrapper import DefaultWrapper
    import os

    V2 = os.path.join(os.path.dirname(__file__), "..", "params",
                      "synthetic", "vit_tiny", "dinov2.yml")
    p1 = load_merged_params(V2)
    p1.training_params.save_dir = str(tmp_path)
    p1.dataset_params.synthetic_size = 8
    for ld in ("trainloader", "valloader", "testloader"):
        p1.dataloader_params[ld].batch_size = 8
    w1 = DINOv2Wrapper(p1)
    w1.instantiate(seed=0)
    ck = str(tmp_path / "ssl_ck")
    save_checkpoint(ck, state=w1.state, frozen=w1.frozen, epoch=0,
                    parameters=dict(p1))

    p2 = load_merged_params(PARAMS)
    p2.training_params.save_dir = str(tmp_path)
    p2.transfer_learning_params = {"pretrained_path": ck}
    w2 = DefaultWrapper(p2)
    w2.instantiate(seed=3)
    # backbone adopted from the SSL student; fc head fresh
    np.testing.assert_array_equal(
        np.asarray(w2.state.trainable["backbone"]["blocks"]["proj_wt"]),
        np.asarray(w1.state.trainable["backbone"]["blocks"]["proj_wt"]))
