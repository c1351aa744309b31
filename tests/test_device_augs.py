"""Device-side augmentation tests (jit-compatible, static shapes)."""

import jax
import jax.numpy as jnp
import numpy as np

from apla_tpu.data.device_augs import DeviceAugConfig, device_augment


CFG = DeviceAugConfig(out_size=32, mean=(0.5, 0.5, 0.5),
                      std=(0.25, 0.25, 0.25))


def _batch(b=4, h=48, w=48):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8))


def test_shapes_and_dtype():
    out = jax.jit(lambda x, k: device_augment(x, k, CFG))(
        _batch(), jax.random.PRNGKey(0))
    assert out.shape == (4, 32, 32, 3)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_randomness_keyed():
    x = _batch()
    a = device_augment(x, jax.random.PRNGKey(0), CFG)
    b = device_augment(x, jax.random.PRNGKey(0), CFG)
    c = device_augment(x, jax.random.PRNGKey(1), CFG)
    np.testing.assert_array_equal(np.asarray(a, np.float32),
                                  np.asarray(b, np.float32))
    assert np.abs(np.asarray(a, np.float32)
                  - np.asarray(c, np.float32)).max() > 0


def test_no_recompile_across_batches():
    f = jax.jit(lambda x, k: device_augment(x, k, CFG))
    x = _batch()
    f(x, jax.random.PRNGKey(0))
    n0 = f._cache_size()
    f(_batch(), jax.random.PRNGKey(5))
    assert f._cache_size() == n0


def test_normalization_range():
    cfg = DeviceAugConfig(out_size=32, jitter_p=0.0, hflip_p=0.0,
                          crop_scale=(1.0, 1.0), crop_ratio=(1.0, 1.0),
                          mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0))
    x = jnp.full((1, 32, 32, 3), 255, jnp.uint8)
    out = np.asarray(device_augment(x, jax.random.PRNGKey(0), cfg),
                     np.float32)
    np.testing.assert_allclose(out, 1.0, atol=0.02)


def test_blur_and_solarize():
    from apla_tpu.data.device_augs import (
        DeviceAugConfig, _gaussian_blur_batch, _solarize_batch)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (4, 16, 16, 3)), jnp.float32)
    cfg = DeviceAugConfig(blur_p=1.0, blur_radius=(1.5, 1.5),
                          solarize_p=1.0, solarize_threshold=128)
    blurred = _gaussian_blur_batch(imgs, jax.random.PRNGKey(0), cfg)
    assert blurred.shape == imgs.shape
    # blur reduces local variance
    def tv(x):
        return float(jnp.mean(jnp.abs(x[:, 1:] - x[:, :-1])))
    assert tv(blurred) < tv(imgs)
    sol = _solarize_batch(imgs, jax.random.PRNGKey(1), cfg)
    hi = np.asarray(imgs) >= 0.5019
    np.testing.assert_allclose(np.asarray(sol)[hi],
                               1.0 - np.asarray(imgs)[hi], atol=1e-6)
    np.testing.assert_allclose(np.asarray(sol)[~hi],
                               np.asarray(imgs)[~hi], atol=1e-6)


def test_device_multicrop_shapes_and_strategy():
    from apla_tpu.data.device_augs import (
        crop_cfgs_from_strategy, device_multicrop)
    from apla_tpu.ssl.multicrop import STRATEGIES

    cfgs = crop_cfgs_from_strategy(STRATEGIES["dinov2"],
                                   mean=(0.5, 0.5, 0.5),
                                   std=(0.25, 0.25, 0.25),
                                   g_size=32, l_size=16)
    assert len(cfgs) == 10
    assert cfgs[0].out_size == 32 and cfgs[-1].out_size == 16
    assert cfgs[0].blur_p == 1.0          # global_1: always blur
    assert cfgs[1].solarize_p > 0         # global_2: solarize
    assert cfgs[0].hue == 0.1

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (4, 36, 36, 3)), jnp.uint8)
    g, l = device_multicrop(imgs, jax.random.PRNGKey(0), cfgs, n_global=2,
                            compute_dtype=jnp.float32)
    assert g.shape == (8, 32, 32, 3)      # 2 crops x B, crop-major
    assert l.shape == (32, 16, 16, 3)     # 8 crops x B
    assert np.isfinite(np.asarray(g)).all()


def test_dinov2_device_augment_end_to_end(tmp_path):
    """One DINOv2 step with device-side multi-crop: host ships raw uint8,
    all crops generated inside the jitted step."""
    import os
    from apla_tpu.ssl.dinov2 import Dinov2Trainer, DINOv2Wrapper
    from apla_tpu.utils.config import load_merged_params

    params_path = os.path.join(os.path.dirname(__file__), "..", "params",
                               "synthetic", "vit_tiny", "dinov2.yml")
    params = load_merged_params(params_path)
    params.training_params.epochs = 1
    params.training_params.is_dry = True
    params.training_params.save_dir = str(tmp_path)
    params.dataset_params.synthetic_size = 16
    params.dataset_params.device_augment = True
    # raw_images [B, ...] shards over the 8-device test mesh -> B % 8 == 0
    for ld in ("trainloader", "valloader", "testloader"):
        params.dataloader_params[ld].batch_size = 8
    wrapper = DINOv2Wrapper(params)
    wrapper.instantiate()
    assert wrapper.ssl_device_crop_cfgs is not None
    trainer = Dinov2Trainer(wrapper)
    batch = next(iter(wrapper.dataloaders.trainloader))
    assert "raw_images" in batch and batch["raw_images"].dtype == np.uint8
    assert "collated_global_crops" not in batch
    dbatch = trainer._device_batch(batch)
    step = trainer._get_step(True)
    state, m = step(trainer.state, trainer.frozen, dbatch,
                    1e-4, 0.04, 0.994, 0.04, trainer.rng)
    assert np.isfinite(float(m["loss"]))


def _ssl_raw_params(tmp_path):
    import os
    from apla_tpu.utils.config import load_merged_params
    params_path = os.path.join(os.path.dirname(__file__), "..", "params",
                               "synthetic", "vit_tiny", "apla.yml")
    params = load_merged_params(params_path)
    params.training_params.epochs = 1
    params.training_params.is_dry = True
    params.training_params.save_dir = str(tmp_path)
    params.dataset_params.synthetic_size = 16
    params.dataset_params.device_augment = True
    params.dataset_params.ssl_global_size = 32
    params.dataset_params.ssl_local_size = 16
    for ld in ("trainloader", "valloader", "testloader"):
        params.dataloader_params[ld].batch_size = 8
    return params


def test_byol_device_multicrop_step(tmp_path):
    from apla_tpu.ssl.byol import BYOLTrainer, BYOLWrapper

    wrapper = BYOLWrapper(_ssl_raw_params(tmp_path), use_momentum=True)
    wrapper.instantiate()
    assert len(wrapper.ssl_device_crop_cfgs) == 2  # BYOL: 2 global views
    trainer = BYOLTrainer(wrapper)
    batch = next(iter(wrapper.dataloaders.trainloader))
    assert not isinstance(batch["image"], list)  # single raw uint8 batch
    assert batch["image"].dtype == np.uint8
    views = trainer._device_views(batch)
    state, m = trainer.train_step(trainer.state, trainer.frozen, views,
                                  1e-3, 0.99, trainer.rng)
    assert np.isfinite(float(m["loss"]))


def test_dino_device_multicrop_step(tmp_path):
    from apla_tpu.ssl.dino import DINOTrainer, DINOWrapper

    wrapper = DINOWrapper(_ssl_raw_params(tmp_path))
    wrapper.instantiate()
    assert len(wrapper.ssl_device_crop_cfgs) == 10  # 2 global + 8 local
    trainer = DINOTrainer(wrapper)
    batch = next(iter(wrapper.dataloaders.trainloader))
    g, l = trainer._stack_views(batch)
    assert l is None  # crops built in-step on the raw batch
    step = trainer._get_step(True)
    state, m = step(trainer.state, trainer.frozen, g, l,
                    1e-4, 1e-5, 0.99, 0.04, trainer.rng)
    assert np.isfinite(float(m["loss"]))
