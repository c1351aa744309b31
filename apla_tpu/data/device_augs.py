"""Device-side batched augmentations (TPU-native input pipeline tail).

The reference augments per-sample with PIL in DataLoader workers
(`bases.py:26-58`) — host CPU becomes the bottleneck at TPU batch rates
(SURVEY hot loop #4).  Here the geometric/photometric tail runs ON DEVICE,
vectorised over the batch and fused by XLA into the training step: the host
only decodes and ships uint8 images once.

Ops (jit/vmap-friendly, all shapes static):
- random resized crop via `jax.image.scale_and_translate` (dynamic scale and
  translation are traced values — no recompiles),
- horizontal flip, brightness/contrast/saturation jitter, grayscale,
- normalize to the dataset's mean/std.

Use `device_augment(images_u8, key, cfg)` inside the train step, or through
`Trainer` with `dataset_params.device_augment: true`.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DeviceAugConfig:
    out_size: int = 224
    crop_scale: tuple = (0.8, 1.2)       # RandomResizedCrop area range
    crop_ratio: tuple = (3 / 4, 4 / 3)
    hflip_p: float = 0.5
    jitter_p: float = 0.8
    brightness: float = 0.2
    contrast: float = 0.2
    saturation: float = 0.1
    grayscale_p: float = 0.0
    mean: Sequence[float] = (0.485, 0.456, 0.406)
    std: Sequence[float] = (0.229, 0.224, 0.225)


def _rrc_one(img, key, cfg: DeviceAugConfig):
    """Random resized crop for one [H, W, C] float image (dynamic box,
    static output shape)."""
    H, W = img.shape[0], img.shape[1]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = H * W * jax.random.uniform(k1, (), minval=cfg.crop_scale[0],
                                      maxval=cfg.crop_scale[1])
    log_r = jax.random.uniform(
        k2, (), minval=jnp.log(cfg.crop_ratio[0]),
        maxval=jnp.log(cfg.crop_ratio[1]))
    aspect = jnp.exp(log_r)
    cw = jnp.clip(jnp.sqrt(area * aspect), 8.0, W)
    ch = jnp.clip(jnp.sqrt(area / aspect), 8.0, H)
    y0 = jax.random.uniform(k3, ()) * (H - ch)
    x0 = jax.random.uniform(k4, ()) * (W - cw)
    out = cfg.out_size
    scale = jnp.stack([out / ch, out / cw])
    translation = jnp.stack([-y0 * out / ch, -x0 * out / cw])
    return jax.image.scale_and_translate(
        img, (out, out, img.shape[2]), (0, 1), scale, translation,
        method="bilinear")


def _jitter_one(img, key, cfg: DeviceAugConfig):
    kb, kc, ks, kp = jax.random.split(key, 4)
    apply = jax.random.uniform(kp, ()) < cfg.jitter_p
    fb = 1.0 + jax.random.uniform(kb, (), minval=-cfg.brightness,
                                  maxval=cfg.brightness)
    fc = 1.0 + jax.random.uniform(kc, (), minval=-cfg.contrast,
                                  maxval=cfg.contrast)
    fs = 1.0 + jax.random.uniform(ks, (), minval=-cfg.saturation,
                                  maxval=cfg.saturation)
    y = img * fb
    mean = jnp.mean(y, axis=(0, 1), keepdims=True)
    y = (y - mean) * fc + mean
    gray = jnp.mean(y, axis=-1, keepdims=True)
    y = (y - gray) * fs + gray
    y = jnp.clip(y, 0.0, 1.0)
    return jnp.where(apply, y, img)


def device_augment(images_u8, key, cfg: DeviceAugConfig,
                   compute_dtype=jnp.bfloat16):
    """images_u8: [B, H, W, C] uint8 -> augmented normalised
    [B, out, out, C] in compute_dtype."""
    B = images_u8.shape[0]
    imgs = images_u8.astype(jnp.float32) / 255.0
    keys = jax.random.split(key, 3 * B).reshape(3, B, -1)

    imgs = jax.vmap(lambda im, k: _rrc_one(im, k, cfg))(imgs, keys[0])

    flip = jax.random.uniform(jax.random.fold_in(key, 1),
                              (B, 1, 1, 1)) < cfg.hflip_p
    imgs = jnp.where(flip, imgs[:, :, ::-1], imgs)

    imgs = jax.vmap(lambda im, k: _jitter_one(im, k, cfg))(imgs, keys[1])

    if cfg.grayscale_p > 0:
        g = jax.random.uniform(jax.random.fold_in(key, 2),
                               (B, 1, 1, 1)) < cfg.grayscale_p
        gray = jnp.mean(imgs, axis=-1, keepdims=True)
        imgs = jnp.where(g, jnp.broadcast_to(gray, imgs.shape), imgs)

    mean = jnp.asarray(cfg.mean, jnp.float32)
    std = jnp.asarray(cfg.std, jnp.float32)
    imgs = (imgs - mean) / std
    return imgs.astype(compute_dtype)
