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
