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
    hue: float = 0.0                     # hue shift handled as channel roll mix
    grayscale_p: float = 0.0
    # SSL extras (reference multi-crop recipes): gaussian blur + solarize
    blur_p: float = 0.0
    blur_radius: tuple = (0.1, 2.0)
    solarize_p: float = 0.0
    solarize_threshold: float = 128.0    # on the 0..255 scale
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
    kb, kc, ks, kh, kp = jax.random.split(key, 5)
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
    if cfg.hue > 0:
        # hue shift as a YIQ chroma rotation (PIL-hue approximation,
        # vectorises on the VPU; factor in turns like torchvision)
        theta = 2.0 * jnp.pi * jax.random.uniform(
            kh, (), minval=-cfg.hue, maxval=cfg.hue)
        r, g, b = y[..., 0], y[..., 1], y[..., 2]
        Y = 0.299 * r + 0.587 * g + 0.114 * b
        I = 0.596 * r - 0.274 * g - 0.322 * b
        Q = 0.211 * r - 0.523 * g + 0.312 * b
        c, s = jnp.cos(theta), jnp.sin(theta)
        I, Q = I * c - Q * s, I * s + Q * c
        y = jnp.stack([Y + 0.956 * I + 0.621 * Q,
                       Y - 0.272 * I - 0.647 * Q,
                       Y - 1.106 * I + 1.703 * Q], axis=-1)
    y = jnp.clip(y, 0.0, 1.0)
    return jnp.where(apply, y, img)


_BLUR_K = 9  # static kernel width; covers sigma up to ~2 (radius_max)


def _gaussian_blur_batch(imgs, key, cfg: DeviceAugConfig):
    """Per-image random-sigma separable gaussian blur, applied with
    probability blur_p.  Static kernel width, traced sigma — no recompiles
    (reference RandomGaussianBlur: PIL GaussianBlur(radius~U[min,max]))."""
    B, H, W, C = imgs.shape
    kr, kp = jax.random.split(key)
    sigma = jax.random.uniform(kr, (B,), minval=cfg.blur_radius[0],
                               maxval=cfg.blur_radius[1])
    apply = jax.random.uniform(kp, (B, 1, 1, 1)) < cfg.blur_p
    x = jnp.arange(_BLUR_K, dtype=jnp.float32) - (_BLUR_K - 1) / 2

    def blur_one(img, s):
        w = jnp.exp(-0.5 * (x / s) ** 2)
        w = w / jnp.sum(w)
        # separable depthwise conv: H then W (NHWC, one image as N=1)
        img4 = img[None]
        kh = jnp.tile(w.reshape(_BLUR_K, 1, 1, 1), (1, 1, 1, C))
        img4 = jax.lax.conv_general_dilated(
            img4, kh, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)
        kw = jnp.tile(w.reshape(1, _BLUR_K, 1, 1), (1, 1, 1, C))
        img4 = jax.lax.conv_general_dilated(
            img4, kw, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)
        return img4[0]

    blurred = jax.vmap(blur_one)(imgs, sigma)
    return jnp.where(apply, blurred, imgs)


def _solarize_batch(imgs, key, cfg: DeviceAugConfig):
    """Invert pixels above the threshold with probability solarize_p
    (reference RandomSolarize; imgs in [0,1])."""
    t = cfg.solarize_threshold / 255.0
    apply = jax.random.uniform(key, (imgs.shape[0], 1, 1, 1)) \
        < cfg.solarize_p
    sol = jnp.where(imgs >= t, 1.0 - imgs, imgs)
    return jnp.where(apply, sol, imgs)


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

    if cfg.blur_p > 0:
        imgs = _gaussian_blur_batch(imgs, jax.random.fold_in(key, 3), cfg)
    if cfg.solarize_p > 0:
        imgs = _solarize_batch(imgs, jax.random.fold_in(key, 4), cfg)

    mean = jnp.asarray(cfg.mean, jnp.float32)
    std = jnp.asarray(cfg.std, jnp.float32)
    imgs = (imgs - mean) / std
    return imgs.astype(compute_dtype)


# --------------------------------------------------------------------------- #
# SSL multi-crop on device: ship ONE uint8 image per sample; generate every
# crop (2 global + n local) inside the jitted step.  The reference's host
# pipeline runs 10 PIL pipelines per image (multicrop strategy JSONs) — at
# TPU batch rates the host becomes the bottleneck; on device the crops are
# vectorised over the batch and fused into the train step by XLA.
# --------------------------------------------------------------------------- #

def crop_cfgs_from_strategy(strategy_spec: dict, mean, std,
                            g_size=None, l_size=None):
    """Build one DeviceAugConfig per crop from a multicrop STRATEGIES spec
    (ssl/multicrop.py) — same transform parameters as the host pipeline."""
    cfgs = []
    for kind, crop in strategy_spec["crops"]:
        rrc = crop.get("RandomResizedCrop", {})
        cj = crop.get("ColorJitter", {})
        blur = crop.get("RandomGaussianBlur", {})
        sol = crop.get("RandomSolarize", {})
        size = int(rrc.get("size", 224))
        if kind == "global" and g_size:
            size = int(g_size)
        if kind == "local" and l_size:
            size = int(l_size)
        cfgs.append(DeviceAugConfig(
            out_size=size,
            crop_scale=tuple(rrc.get("scale", (0.4, 1.0))),
            hflip_p=float(crop.get("HorizontalFlip", {}).get("p", 0.5)),
            jitter_p=float(cj.get("p", 0.8)) if cj.get("apply") else 0.0,
            brightness=float(cj.get("brightness", 0.4)),
            contrast=float(cj.get("contrast", 0.4)),
            saturation=float(cj.get("saturation", 0.2)),
            hue=float(cj.get("hue", 0.0)),
            grayscale_p=float(crop.get("RandomGrayscale", {}).get("p", 0.0)),
            blur_p=float(blur.get("p", 0.0)) if blur.get("apply",
                                                         True) else 0.0,
            blur_radius=(float(blur.get("radius_min", 0.1)),
                         float(blur.get("radius_max", 2.0))),
            solarize_p=float(sol.get("p", 0.0)) if sol else 0.0,
            solarize_threshold=float(sol.get("threshold", 128)),
            mean=tuple(mean), std=tuple(std)))
    return cfgs


def device_multicrop(images_u8, key, crop_cfgs, n_global: int,
                     compute_dtype=jnp.bfloat16):
    """images_u8 [B, H, W, C] -> (global_crops [n_global*B, g, g, C],
    local_crops [n_local*B, l, l, C] | None).

    Crop-major concatenation matches the host iBOT collate (crop i of all
    B samples, then crop i+1, ...)."""
    outs = [device_augment(images_u8, jax.random.fold_in(key, i), cfg,
                           compute_dtype=compute_dtype)
            for i, cfg in enumerate(crop_cfgs)]
    g = jnp.concatenate(outs[:n_global], axis=0)
    l = (jnp.concatenate(outs[n_global:], axis=0)
         if len(outs) > n_global else None)
    return g, l
