"""DINOv2 objective tests: losses, masking collate (static shapes), and an
end-to-end training smoke run on synthetic data."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy virtual-mesh integration tier

from apla_tpu.utils.config import load_merged_params

PARAMS = os.path.join(os.path.dirname(__file__), "..", "params", "synthetic",
                      "vit_tiny", "dinov2.yml")


def test_masking_generator_shapes():
    from apla_tpu.ssl.dinov2 import MaskingGenerator
    gen = MaskingGenerator((8, 8), max_num_patches=32)
    rng = np.random.default_rng(0)
    m = gen(16, rng=rng)
    assert m.shape == (8, 8)
    assert 0 < m.sum() <= 32
    assert gen(0, rng=rng).sum() == 0


def test_ibot_collate_static_shapes():
    from apla_tpu.ssl.dinov2 import MaskingGenerator, make_ibot_collate
    n_tokens = 16
    gen = MaskingGenerator((4, 4), max_num_patches=8)
    collate = make_ibot_collate(
        n_global_crops=2, n_local_crops=4, mask_ratio_tuple=(0.1, 0.5),
        mask_probability=0.5, n_tokens=n_tokens, mask_generator=gen)
    samples = [{"image": [np.zeros((32, 32, 3), np.float32)] * 6,
                "label": i} for i in range(4)]
    b1 = collate(samples)
    b2 = collate(samples[:4])
    # static shapes across batches — XLA never recompiles
    for k in ("collated_masks", "mask_indices_list", "masks_weight",
              "mask_valid"):
        assert b1[k].shape == b2[k].shape, k
    assert b1["collated_global_crops"].shape == (8, 32, 32, 3)
    assert b1["collated_local_crops"].shape == (16, 32, 32, 3)
    # weights zero beyond the valid region
    inv = b1["mask_valid"] == 0
    assert (b1["masks_weight"][inv] == 0).all()


def test_sinkhorn_doubly_stochastic():
    from apla_tpu.ssl.dinov2 import sinkhorn_knopp_teacher
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 8))
    Q = sinkhorn_knopp_teacher(x, 0.07)
    rows = np.asarray(jnp.sum(Q, axis=1))
    np.testing.assert_allclose(rows, 1.0, atol=1e-3)  # per-sample assignment


def test_koleo_loss_prefers_spread():
    from apla_tpu.ssl.dinov2 import koleo_loss
    clustered = jnp.ones((8, 4)) + 0.001 * jax.random.normal(
        jax.random.PRNGKey(0), (8, 4))
    spread = jax.random.normal(jax.random.PRNGKey(1), (8, 4))
    assert float(koleo_loss(clustered)) > float(koleo_loss(spread))


@pytest.mark.slow
def test_dinov2_end_to_end(tmp_path):
    from apla_tpu.ssl.dinov2 import Dinov2Trainer, DINOv2Wrapper
    params = load_merged_params(PARAMS)
    params.training_params.epochs = 1
    params.training_params.log_every = 1
    params.training_params.val_every = 1.0
    params.training_params.save_dir = str(tmp_path)
    params.dataset_params.synthetic_size = 32
    for ld in ("trainloader", "valloader", "testloader"):
        params.dataloader_params[ld].batch_size = 8
    wrapper = DINOv2Wrapper(params)
    wrapper.instantiate()
    # teacher == student at init
    np.testing.assert_allclose(
        np.asarray(wrapper.state.teacher["dino_head"]["last_v"]),
        np.asarray(wrapper.state.trainable["dino_head"]["last_v"]))
    trainer = Dinov2Trainer(wrapper)
    trainer.train()
    # centers moved; loss finite; teacher EMA'd
    assert np.abs(np.asarray(trainer.state.dino_center)).max() > 0
    assert np.abs(np.asarray(trainer.state.ibot_center)).max() > 0
    assert np.isfinite(float(trainer.best_val_target))


def test_dinov2_separate_ibot_head_and_full_mode(tmp_path):
    """separate iBOT head + APLA 'full' mode (the ISIC2019 recipe shape):
    one train step must run and produce finite losses."""
    from apla_tpu.ssl.dinov2 import Dinov2Trainer, DINOv2Wrapper
    params = load_merged_params(PARAMS)
    params.training_params.epochs = 1
    params.training_params.val_every = 10  # skip validation
    params.training_params.save_dir = str(tmp_path)
    params.dataset_params.synthetic_size = 16
    for ld in ("trainloader", "valloader", "testloader"):
        params.dataloader_params[ld].batch_size = 8
    params.model_params.dinov2.ibot.separate_head = True
    params.model_params.adaptation.params.partial_size = "full"
    wrapper = DINOv2Wrapper(params)
    wrapper.instantiate()
    assert "ibot_head" in wrapper.state.trainable
    assert "proj" in wrapper.state.trainable["backbone"]["blocks"]["attn"]
    trainer = Dinov2Trainer(wrapper)
    trainer.val_every = 100  # no eval in this smoke
    loader = wrapper.dataloaders.trainloader
    batch = next(iter(loader))
    step_fn = trainer._get_step(True)
    state, m = step_fn(trainer.state, trainer.frozen,
                       trainer._device_batch(batch), 1e-4, 1e-5, 0.99,
                       0.04, trainer.rng)
    assert np.isfinite(float(m["loss"]))
    assert "ibot_loss" in m and np.isfinite(float(m["ibot_loss"]))


def test_dinov2_accum_matches_monolithic(tmp_path):
    """accum_steps for the SSL step: teacher/centering statistics run on the
    full batch, so with KoLeo off (the only batch-coupled student term) the
    accumulated update must match the monolithic one numerically."""
    from apla_tpu.ssl.dinov2 import Dinov2Trainer, DINOv2Wrapper

    shared_batch = {}

    def run(accum):
        params = load_merged_params(PARAMS)
        params.training_params.epochs = 1
        params.training_params.val_every = 10
        params.training_params.save_dir = str(tmp_path / f"a{accum}")
        params.training_params.accum_steps = accum
        params.training_params.use_mixed_precision = False
        params.dataset_params.synthetic_size = 8
        for ld in ("trainloader", "valloader", "testloader"):
            params.dataloader_params[ld].batch_size = 8
            params.dataloader_params[ld].shuffle = False
        params.model_params.dinov2.dino.koleo_loss_weight = 0.0
        wrapper = DINOv2Wrapper(params)
        wrapper.instantiate(seed=0)
        trainer = Dinov2Trainer(wrapper)
        # ONE collated batch for both runs: the collate draws the iBOT mask
        # layout from an unseeded RNG, so a fresh batch per run would
        # (correctly) change ibot_loss for reasons unrelated to accum
        if not shared_batch:
            shared_batch["b"] = next(iter(wrapper.dataloaders.trainloader))
        step_fn = trainer._get_step(True)
        state, m = step_fn(trainer.state, trainer.frozen,
                           trainer._device_batch(shared_batch["b"]), 1e-4,
                           1e-5, 0.99, 0.04, jax.random.PRNGKey(3))
        return state, m

    s1, m1 = run(1)
    s4, m4 = run(4)
    np.testing.assert_allclose(float(m1["loss"]), float(m4["loss"]),
                               rtol=2e-4)
    np.testing.assert_allclose(
        float(m1["ibot_loss"]), float(m4["ibot_loss"]), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s1.dino_center), np.asarray(s4.dino_center), rtol=1e-5)
    w1 = np.asarray(s1.trainable["backbone"]["blocks"]["proj_wt"])
    w4 = np.asarray(s4.trainable["backbone"]["blocks"]["proj_wt"])
    np.testing.assert_allclose(w1, w4, rtol=1e-4, atol=2e-6)


def test_dinov2_accum_with_koleo_runs(tmp_path):
    """KoLeo on + accum: per-micro KoLeo (per-rank semantics) — step must
    run with finite losses."""
    from apla_tpu.ssl.dinov2 import Dinov2Trainer, DINOv2Wrapper
    params = load_merged_params(PARAMS)
    params.training_params.epochs = 1
    params.training_params.val_every = 10
    params.training_params.save_dir = str(tmp_path)
    params.training_params.accum_steps = 2
    params.dataset_params.synthetic_size = 8
    for ld in ("trainloader", "valloader", "testloader"):
        params.dataloader_params[ld].batch_size = 4
    wrapper = DINOv2Wrapper(params)
    wrapper.instantiate()
    trainer = Dinov2Trainer(wrapper)
    batch = next(iter(wrapper.dataloaders.trainloader))
    step_fn = trainer._get_step(False)
    state, m = step_fn(trainer.state, trainer.frozen,
                       trainer._device_batch(batch), 1e-4, 1e-5, 0.99,
                       0.04, trainer.rng)
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["koleo_loss"]))


def test_dinov2_fsdp_param_sharding(tmp_path):
    """param_sharding='fsdp' through the SSL wrapper: the DINOv2 step must
    run with the frozen backbone sharded over the data axis."""
    from jax.sharding import PartitionSpec as P
    from apla_tpu.ssl.dinov2 import Dinov2Trainer, DINOv2Wrapper
    params = load_merged_params(PARAMS)
    params.training_params.epochs = 1
    params.training_params.val_every = 10
    params.training_params.save_dir = str(tmp_path)
    params.dataset_params.synthetic_size = 8
    params.system_params.param_sharding = "fsdp"
    for ld in ("trainloader", "valloader", "testloader"):
        params.dataloader_params[ld].batch_size = 8
    wrapper = DINOv2Wrapper(params)
    wrapper.instantiate()
    # at least one frozen leaf actually sharded
    specs = [leaf.sharding.spec
             for leaf in jax.tree.leaves(wrapper.frozen)]
    assert any(s != P() for s in specs)
    trainer = Dinov2Trainer(wrapper)
    batch = next(iter(wrapper.dataloaders.trainloader))
    step_fn = trainer._get_step(True)
    state, m = step_fn(trainer.state, trainer.frozen,
                       trainer._device_batch(batch), 1e-4, 1e-5, 0.99,
                       0.04, trainer.rng)
    assert np.isfinite(float(m["loss"]))


def test_ibot_collate_seeded_deterministic():
    from apla_tpu.ssl.dinov2 import MaskingGenerator, make_ibot_collate
    gen = MaskingGenerator((4, 4), max_num_patches=8)

    def mk():
        return make_ibot_collate(
            n_global_crops=2, n_local_crops=4, mask_ratio_tuple=(0.1, 0.5),
            mask_probability=0.5, n_tokens=16, mask_generator=gen, seed=7)

    samples = [{"image": [np.zeros((32, 32, 3), np.float32)] * 6,
                "label": i} for i in range(4)]
    c1, c2 = mk(), mk()
    b1a, b1b = c1(samples), c1(samples)     # successive calls differ
    b2a = c2(samples)                        # fresh collate replays exactly
    assert not np.array_equal(b1a["collated_masks"], b1b["collated_masks"])
    np.testing.assert_array_equal(b1a["collated_masks"],
                                  b2a["collated_masks"])
    np.testing.assert_array_equal(b1a["mask_indices_list"],
                                  b2a["mask_indices_list"])
