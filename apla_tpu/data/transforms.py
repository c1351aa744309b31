"""Declarative image transform pipeline (PIL/numpy, NHWC float32 output).

Parity with the reference's YAML-driven transform factory
(`src/defaults/bases.py:69-231` `get_trans_list`): the same transform names,
parameters and application order (geometric -> pixel -> tensor/normalize/erase),
implemented without torchvision.  Randomness comes from an explicit
`np.random.Generator` per call, so the pipeline is seedable and
worker-reproducible.

Output convention: HWC float32 in [0,1] before Normalize (TPU-native NHWC —
the reference emits CHW for cuDNN).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np
from PIL import Image, ImageEnhance, ImageFilter, ImageOps

BICUBIC = Image.BICUBIC
BILINEAR = Image.BILINEAR


# --------------------------------------------------------------------------- #
# primitives
# --------------------------------------------------------------------------- #

class Transform:
    def __call__(self, img, rng: np.random.Generator):
        raise NotImplementedError

    def __repr__(self):
        return self.__class__.__name__


class Compose(Transform):
    def __init__(self, transforms: Sequence[Transform]):
        self.transforms = list(transforms)

    def __call__(self, img, rng):
        for t in self.transforms:
            img = t(img, rng)
        return img

    def __repr__(self):
        inner = ", ".join(repr(t) for t in self.transforms)
        return f"Compose([{inner}])"


class RandomApply(Transform):
    def __init__(self, transform: Transform, p: float = 0.5):
        self.transform = transform
        self.p = p

    def __call__(self, img, rng):
        if rng.random() < self.p:
            return self.transform(img, rng)
        return img


class Resize(Transform):
    def __init__(self, size, interpolation=BICUBIC):
        # size: int (short side) or (h, w)
        self.size = size
        self.interpolation = interpolation

    def __call__(self, img, rng):
        if isinstance(self.size, int):
            w, h = img.size
            short = min(w, h)
            scale = self.size / short
            return img.resize((max(1, round(w * scale)),
                               max(1, round(h * scale))), self.interpolation)
        h, w = self.size
        return img.resize((w, h), self.interpolation)


class CenterCrop(Transform):
    def __init__(self, size):
        self.size = size if isinstance(size, (tuple, list)) else (size, size)

    def __call__(self, img, rng):
        th, tw = self.size
        w, h = img.size
        if w < tw or h < th:
            # torchvision CenterCrop zero-pads undersized images WITHOUT
            # rescaling (ImageOps.pad would contain-fit resize the content
            # first, changing the pixel scale vs the reference pipeline)
            padded = Image.new(img.mode, (max(w, tw), max(h, th)))
            padded.paste(img, ((max(w, tw) - w) // 2, (max(h, th) - h) // 2))
            img = padded
            w, h = img.size
        left = (w - tw) // 2
        top = (h - th) // 2
        return img.crop((left, top, left + tw, top + th))


class RandomCrop(Transform):
    def __init__(self, size, padding: Optional[int] = None):
        self.size = size if isinstance(size, (tuple, list)) else (size, size)
        self.padding = padding

    def __call__(self, img, rng):
        if self.padding:
            img = ImageOps.expand(img, border=self.padding, fill=0)
        th, tw = self.size
        w, h = img.size
        if w == tw and h == th:
            return img
        left = int(rng.integers(0, max(w - tw, 0) + 1))
        top = int(rng.integers(0, max(h - th, 0) + 1))
        return img.crop((left, top, left + tw, top + th))


class RandomResizedCrop(Transform):
    def __init__(self, size, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3),
                 interpolation=BICUBIC):
        self.size = size if isinstance(size, (tuple, list)) else (size, size)
        self.scale = scale
        self.ratio = ratio
        self.interpolation = interpolation

    def __call__(self, img, rng):
        w, h = img.size
        area = w * h
        for _ in range(10):
            target_area = area * rng.uniform(*self.scale)
            log_ratio = (math.log(self.ratio[0]), math.log(self.ratio[1]))
            aspect = math.exp(rng.uniform(*log_ratio))
            cw = int(round(math.sqrt(target_area * aspect)))
            ch = int(round(math.sqrt(target_area / aspect)))
            if 0 < cw <= w and 0 < ch <= h:
                left = int(rng.integers(0, w - cw + 1))
                top = int(rng.integers(0, h - ch + 1))
                crop = img.crop((left, top, left + cw, top + ch))
                return crop.resize((self.size[1], self.size[0]),
                                   self.interpolation)
        # fallback: center crop
        in_ratio = w / h
        if in_ratio < self.ratio[0]:
            cw, ch = w, int(round(w / self.ratio[0]))
        elif in_ratio > self.ratio[1]:
            cw, ch = int(round(h * self.ratio[1])), h
        else:
            cw, ch = w, h
        left, top = (w - cw) // 2, (h - ch) // 2
        crop = img.crop((left, top, left + cw, top + ch))
        return crop.resize((self.size[1], self.size[0]), self.interpolation)


class RandomHorizontalFlip(Transform):
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img, rng):
        if rng.random() < self.p:
            return img.transpose(Image.FLIP_LEFT_RIGHT)
        return img


class RandomVerticalFlip(Transform):
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img, rng):
        if rng.random() < self.p:
            return img.transpose(Image.FLIP_TOP_BOTTOM)
        return img


class RandomRotation(Transform):
    def __init__(self, degrees):
        self.degrees = degrees if isinstance(degrees, (tuple, list)) \
            else (-degrees, degrees)

    def __call__(self, img, rng):
        angle = rng.uniform(*self.degrees)
        return img.rotate(angle, resample=BILINEAR)


class ColorJitter(Transform):
    def __init__(self, brightness=0, contrast=0, saturation=0, hue=0):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue

    @staticmethod
    def _factor(rng, amount):
        return rng.uniform(max(0.0, 1 - amount), 1 + amount)

    def __call__(self, img, rng):
        ops = []
        if self.brightness:
            f = self._factor(rng, self.brightness)
            ops.append(lambda im, f=f: ImageEnhance.Brightness(im).enhance(f))
        if self.contrast:
            f = self._factor(rng, self.contrast)
            ops.append(lambda im, f=f: ImageEnhance.Contrast(im).enhance(f))
        if self.saturation:
            f = self._factor(rng, self.saturation)
            ops.append(lambda im, f=f: ImageEnhance.Color(im).enhance(f))
        if self.hue:
            shift = rng.uniform(-self.hue, self.hue)
            ops.append(lambda im, s=shift: _hue_shift(im, s))
        order = rng.permutation(len(ops))
        for i in order:
            img = ops[int(i)](img)
        return img


def _hue_shift(img, shift):
    if img.mode != "RGB":
        return img
    hsv = np.array(img.convert("HSV"), dtype=np.int16)
    hsv[..., 0] = (hsv[..., 0] + int(shift * 255)) % 256
    return Image.fromarray(hsv.astype(np.uint8), "HSV").convert("RGB")


class RandomGrayscale(Transform):
    def __init__(self, p=0.1):
        self.p = p

    def __call__(self, img, rng):
        if rng.random() < self.p:
            return ImageOps.grayscale(img).convert(img.mode)
        return img


class RandomGaussianBlur(Transform):
    """DINO-style blur (reference `_utils.py:191-207`)."""

    def __init__(self, p=0.5, radius_min=0.1, radius_max=2.0):
        self.p = p
        self.radius_min = radius_min
        self.radius_max = radius_max

    def __call__(self, img, rng):
        if rng.random() > self.p:
            return img
        radius = rng.uniform(self.radius_min, self.radius_max)
        return img.filter(ImageFilter.GaussianBlur(radius))


class RandomSolarize(Transform):
    def __init__(self, threshold=128, p=0.5):
        self.threshold = threshold
        self.p = p

    def __call__(self, img, rng):
        if rng.random() < self.p:
            return ImageOps.solarize(img, self.threshold)
        return img


class RandomAffine(Transform):
    def __init__(self, degrees=0, translate=None, scale=None, shear=None):
        self.degrees = degrees if isinstance(degrees, (tuple, list)) \
            else (-degrees, degrees)
        self.translate = translate
        self.scale = scale
        self.shear = shear

    def __call__(self, img, rng):
        angle = math.radians(rng.uniform(*self.degrees))
        w, h = img.size
        tx = ty = 0.0
        if self.translate:
            tx = rng.uniform(-self.translate[0], self.translate[0]) * w
            ty = rng.uniform(-self.translate[1], self.translate[1]) * h
        s = rng.uniform(*self.scale) if self.scale else 1.0
        shear = math.radians(rng.uniform(-self.shear, self.shear)) \
            if self.shear else 0.0
        cos_a, sin_a = math.cos(angle + shear), math.sin(angle + shear)
        # inverse affine for PIL's coefficient convention
        a = cos_a / s
        b = sin_a / s
        cx, cy = w / 2, h / 2
        coeffs = (a, b, cx - a * (cx + tx) - b * (cy + ty),
                  -b, a, cy + b * (cx + tx) - a * (cy + ty))
        return img.transform((w, h), Image.AFFINE, coeffs, resample=BILINEAR)


class RandomPerspective(Transform):
    def __init__(self, distortion_scale=0.5, p=0.5):
        self.distortion_scale = distortion_scale
        self.p = p

    def __call__(self, img, rng):
        if rng.random() >= self.p:
            return img
        w, h = img.size
        d = self.distortion_scale
        dx, dy = int(d * w / 2), int(d * h / 2)
        tl = (rng.integers(0, dx + 1), rng.integers(0, dy + 1))
        tr = (w - rng.integers(0, dx + 1), rng.integers(0, dy + 1))
        br = (w - rng.integers(0, dx + 1), h - rng.integers(0, dy + 1))
        bl = (rng.integers(0, dx + 1), h - rng.integers(0, dy + 1))
        coeffs = _perspective_coeffs(
            [(0, 0), (w, 0), (w, h), (0, h)], [tl, tr, br, bl])
        return img.transform((w, h), Image.PERSPECTIVE, coeffs,
                             resample=BILINEAR)


def _perspective_coeffs(src, dst):
    A = []
    for (x, y), (u, v) in zip(dst, src):
        A.append([x, y, 1, 0, 0, 0, -u * x, -u * y])
        A.append([0, 0, 0, x, y, 1, -v * x, -v * y])
    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(src, dtype=np.float64).reshape(8)
    return tuple(np.linalg.solve(A, B))


class ToArray(Transform):
    """PIL -> HWC float32 in [0,1] (the reference's ToTensor, minus the CHW)."""

    def __call__(self, img, rng):
        arr = np.asarray(img, dtype=np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[..., None]
        return arr


class NativeToArrayNormalize(Transform):
    """Fused PIL -> float32 HWC normalised via the C++ kernel
    (apla_tpu.native.normalize): one pass instead of ToArray + Normalize."""

    def __init__(self, mean, std):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)

    def __call__(self, img, rng):
        from .. import native
        arr = np.asarray(img)
        if arr.ndim == 2:
            arr = arr[..., None]
        if arr.dtype == np.uint8 and arr.shape[-1] == len(self.mean):
            return native.normalize(arr, self.mean, self.std)
        arr = arr.astype(np.float32) / 255.0
        return (arr - self.mean) / self.std


class Normalize(Transform):
    def __init__(self, mean, std):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)

    def __call__(self, arr, rng):
        return (arr - self.mean) / self.std


class RandomErasing(Transform):
    """Operates on the HWC float array (after normalize), like torchvision."""

    def __init__(self, p=0.5, scale=(0.02, 0.33), ratio=(0.3, 3.3), value=0):
        self.p = p
        self.scale = scale
        self.ratio = ratio
        self.value = value

    def __call__(self, arr, rng):
        if rng.random() >= self.p:
            return arr
        h, w = arr.shape[:2]
        area = h * w
        for _ in range(10):
            target = area * rng.uniform(*self.scale)
            log_ratio = (math.log(self.ratio[0]), math.log(self.ratio[1]))
            aspect = math.exp(rng.uniform(*log_ratio))
            eh = int(round(math.sqrt(target * aspect)))
            ew = int(round(math.sqrt(target / aspect)))
            if eh < h and ew < w:
                top = int(rng.integers(0, h - eh + 1))
                left = int(rng.integers(0, w - ew + 1))
                arr = arr.copy()
                arr[top:top + eh, left:left + ew] = self.value
                return arr
        return arr


# --------------------------------------------------------------------------- #
# auto-augmentation policies (PIL-level, before ToArray)
# --------------------------------------------------------------------------- #

def _apply_op(img, op, magnitude, rng):
    if op == "ShearX":
        return img.transform(img.size, Image.AFFINE,
                             (1, magnitude, 0, 0, 1, 0), resample=BILINEAR)
    if op == "ShearY":
        return img.transform(img.size, Image.AFFINE,
                             (1, 0, 0, magnitude, 1, 0), resample=BILINEAR)
    if op == "TranslateX":
        return img.transform(img.size, Image.AFFINE,
                             (1, 0, magnitude * img.size[0], 0, 1, 0),
                             resample=BILINEAR)
    if op == "TranslateY":
        return img.transform(img.size, Image.AFFINE,
                             (1, 0, 0, 0, 1, magnitude * img.size[1]),
                             resample=BILINEAR)
    if op == "Rotate":
        return img.rotate(magnitude, resample=BILINEAR)
    if op == "Brightness":
        return ImageEnhance.Brightness(img).enhance(1.0 + magnitude)
    if op == "Color":
        return ImageEnhance.Color(img).enhance(1.0 + magnitude)
    if op == "Contrast":
        return ImageEnhance.Contrast(img).enhance(1.0 + magnitude)
    if op == "Sharpness":
        return ImageEnhance.Sharpness(img).enhance(1.0 + magnitude)
    if op == "Posterize":
        return ImageOps.posterize(img, int(magnitude))
    if op == "Solarize":
        return ImageOps.solarize(img, int(magnitude))
    if op == "AutoContrast":
        return ImageOps.autocontrast(img)
    if op == "Equalize":
        return ImageOps.equalize(img)
    if op == "Invert":
        return ImageOps.invert(img)
    if op == "Identity":
        return img
    raise ValueError(op)


_RA_OPS = {
    # op: (magnitudes over 31 bins, signed)
    "Identity": (None, False),
    "ShearX": (np.linspace(0.0, 0.3, 31), True),
    "ShearY": (np.linspace(0.0, 0.3, 31), True),
    "TranslateX": (np.linspace(0.0, 150.0 / 331.0, 31), True),
    "TranslateY": (np.linspace(0.0, 150.0 / 331.0, 31), True),
    "Rotate": (np.linspace(0.0, 30.0, 31), True),
    "Brightness": (np.linspace(0.0, 0.9, 31), True),
    "Color": (np.linspace(0.0, 0.9, 31), True),
    "Contrast": (np.linspace(0.0, 0.9, 31), True),
    "Sharpness": (np.linspace(0.0, 0.9, 31), True),
    "Posterize": (8 - (np.arange(31) / ((31 - 1) / 4)).round(), False),
    "Solarize": (np.linspace(255.0, 0.0, 31), False),
    "AutoContrast": (None, False),
    "Equalize": (None, False),
}


class RandAugment(Transform):
    """torchvision-style RandAugment (reference bases.py:186-196)."""

    def __init__(self, num_ops=2, magnitude=9, num_magnitude_bins=31):
        self.num_ops = num_ops
        self.magnitude = magnitude
        self.bins = num_magnitude_bins

    def __call__(self, img, rng):
        names = list(_RA_OPS)
        for _ in range(self.num_ops):
            op = names[int(rng.integers(0, len(names)))]
            mags, signed = _RA_OPS[op]
            mag = 0.0
            if mags is not None:
                mag = float(mags[min(self.magnitude, len(mags) - 1)])
                if signed and rng.random() < 0.5:
                    mag = -mag
            img = _apply_op(img, op, mag, rng)
        return img


class TrivialAugmentWide(Transform):
    """torchvision TrivialAugmentWide (reference bases.py:210-217)."""

    _OPS = {
        "Identity": (None, False),
        "ShearX": (np.linspace(0.0, 0.99, 31), True),
        "ShearY": (np.linspace(0.0, 0.99, 31), True),
        "TranslateX": (np.linspace(0.0, 32.0 / 224.0, 31), True),
        "TranslateY": (np.linspace(0.0, 32.0 / 224.0, 31), True),
        "Rotate": (np.linspace(0.0, 135.0, 31), True),
        "Brightness": (np.linspace(0.0, 0.99, 31), True),
        "Color": (np.linspace(0.0, 0.99, 31), True),
        "Contrast": (np.linspace(0.0, 0.99, 31), True),
        "Sharpness": (np.linspace(0.0, 0.99, 31), True),
        "Posterize": (8 - (np.arange(31) / ((31 - 1) / 6)).round(), False),
        "Solarize": (np.linspace(255.0, 0.0, 31), False),
        "AutoContrast": (None, False),
        "Equalize": (None, False),
    }

    def __call__(self, img, rng):
        names = list(self._OPS)
        op = names[int(rng.integers(0, len(names)))]
        mags, signed = self._OPS[op]
        mag = 0.0
        if mags is not None:
            mag = float(mags[int(rng.integers(0, len(mags)))])
            if signed and rng.random() < 0.5:
                mag = -mag
        return _apply_op(img, op, mag, rng)


class AutoAugment(Transform):
    """ImageNet AutoAugment policy (subset of sub-policies; reference uses
    torchvision's AutoAugmentPolicy.IMAGENET, bases.py:198-207)."""

    _POLICY = [
        (("Posterize", 0.4, 8), ("Rotate", 0.6, 9)),
        (("Solarize", 0.6, 5), ("AutoContrast", 0.6, 0)),
        (("Equalize", 0.8, 0), ("Equalize", 0.6, 0)),
        (("Posterize", 0.6, 7), ("Posterize", 0.6, 6)),
        (("Equalize", 0.4, 0), ("Solarize", 0.2, 4)),
        (("Equalize", 0.4, 0), ("Rotate", 0.8, 8)),
        (("Solarize", 0.6, 3), ("Equalize", 0.6, 0)),
        (("Posterize", 0.8, 5), ("Equalize", 1.0, 0)),
        (("Rotate", 0.2, 3), ("Solarize", 0.6, 8)),
        (("Equalize", 0.6, 0), ("Posterize", 0.4, 6)),
        (("Rotate", 0.8, 8), ("Color", 0.4, 0)),
        (("Rotate", 0.4, 9), ("Equalize", 0.6, 0)),
        (("Equalize", 0.0, 0), ("Equalize", 0.8, 0)),
        (("Invert", 0.6, 0), ("Equalize", 1.0, 0)),
        (("Color", 0.6, 4), ("Contrast", 1.0, 8)),
        (("Rotate", 0.8, 8), ("Color", 1.0, 2)),
        (("Color", 0.8, 8), ("Solarize", 0.8, 7)),
        (("Sharpness", 0.4, 7), ("Invert", 0.6, 0)),
        (("ShearX", 0.6, 5), ("Equalize", 1.0, 0)),
        (("Color", 0.4, 0), ("Equalize", 0.6, 0)),
        (("Equalize", 0.4, 0), ("Solarize", 0.2, 4)),
        (("Solarize", 0.6, 5), ("AutoContrast", 0.6, 0)),
        (("Invert", 0.6, 0), ("Equalize", 1.0, 0)),
        (("Color", 0.6, 4), ("Contrast", 1.0, 8)),
        (("Equalize", 0.8, 0), ("Equalize", 0.6, 0)),
    ]

    def __call__(self, img, rng):
        sub = self._POLICY[int(rng.integers(0, len(self._POLICY)))]
        for op, p, mag_idx in sub:
            if rng.random() < p:
                mags, signed = _RA_OPS.get(op, (None, False))
                if op == "Invert":
                    mags, signed = None, False
                mag = 0.0
                if mags is not None:
                    idx = min(int(mag_idx * 30 / 9), 30)
                    mag = float(mags[idx])
                    if signed and rng.random() < 0.5:
                        mag = -mag
                img = _apply_op(img, op, mag, rng)
        return img


class AugMix(Transform):
    """AugMix (reference `src/utils/augmix.py` — torchvision port): chains of
    augmentation ops mixed with Dirichlet/Beta weights."""

    _OPS = ["AutoContrast", "Equalize", "Posterize", "Rotate", "Solarize",
            "ShearX", "ShearY", "TranslateX", "TranslateY"]
    _ALL_OPS_EXTRA = ["Brightness", "Color", "Contrast", "Sharpness"]

    def __init__(self, severity=3, mixture_width=3, chain_depth=-1, alpha=1.0,
                 all_ops=True, interpolation=None):
        self.severity = severity
        self.mixture_width = mixture_width
        self.chain_depth = chain_depth
        self.alpha = alpha
        self.ops = self._OPS + (self._ALL_OPS_EXTRA if all_ops else [])

    def _mag(self, op, rng):
        mags, signed = _RA_OPS.get(op, (None, False))
        if mags is None:
            return 0.0
        idx = min(self.severity * 3, len(mags) - 1)
        mag = float(mags[int(rng.integers(0, idx + 1))]) if idx > 0 else 0.0
        if signed and rng.random() < 0.5:
            mag = -mag
        return mag

    def __call__(self, img, rng):
        ws = rng.dirichlet([self.alpha] * self.mixture_width)
        m = rng.beta(self.alpha, self.alpha)
        base = np.asarray(img, dtype=np.float32)
        mix = np.zeros_like(base)
        for i in range(self.mixture_width):
            depth = self.chain_depth if self.chain_depth > 0 \
                else int(rng.integers(1, 4))
            aug = img
            for _ in range(depth):
                op = self.ops[int(rng.integers(0, len(self.ops)))]
                aug = _apply_op(aug, op, self._mag(op, rng), rng)
            mix += ws[i] * np.asarray(aug, dtype=np.float32)
        out = (1 - m) * base + m * mix
        return Image.fromarray(np.clip(out, 0, 255).astype(np.uint8))


# --------------------------------------------------------------------------- #
# declarative factory (reference get_trans_list order)
# --------------------------------------------------------------------------- #

def build_transform(transform_dict: dict, mean, std) -> Compose:
    """Build a Compose from the YAML transform dict, reference order:
    geometric -> pixel -> ToArray/Normalize/RandomErasing."""
    td = transform_dict
    tl: list[Transform] = []

    def on(name):
        entry = td.get(name)
        return bool(entry) and (entry is True or entry.get("apply"))

    if on("Resize"):
        e = td["Resize"]
        tl.append(Resize((e["height"], e["width"])))
    if on("CenterCrop"):
        e = td["CenterCrop"]
        tl.append(CenterCrop((e["height"], e["width"])))
    if on("RandomCrop"):
        e = td["RandomCrop"]
        pad = e.get("padding", 0)
        tl.append(RandomCrop((e["height"], e["width"]),
                             padding=pad if pad and pad > 0 else None))
    if on("RandomResizedCrop"):
        e = td["RandomResizedCrop"]
        tl.append(RandomResizedCrop(e["size"], scale=tuple(e["scale"]),
                                    ratio=tuple(e.get("ratio", (3 / 4, 4 / 3)))))
    if on("VerticalFlip"):
        tl.append(RandomVerticalFlip(p=td["VerticalFlip"]["p"]))
    if on("HorizontalFlip"):
        tl.append(RandomHorizontalFlip(p=td["HorizontalFlip"]["p"]))
    if on("RandomRotation"):
        e = td["RandomRotation"]
        tl.append(RandomApply(RandomRotation(e["angle"]), p=e["p"]))
    if on("ColorJitter"):
        e = td["ColorJitter"]
        tl.append(RandomApply(
            ColorJitter(e["brightness"], e["contrast"], e["saturation"],
                        e["hue"]), p=e["p"]))
    if on("RandomGrayscale"):
        tl.append(RandomGrayscale(p=td["RandomGrayscale"]["p"]))
    if on("RandomGaussianBlur"):
        e = td["RandomGaussianBlur"]
        tl.append(RandomGaussianBlur(p=e["p"], radius_min=e["radius_min"],
                                     radius_max=e["radius_max"]))
    if on("RandomAffine"):
        e = td["RandomAffine"]
        tl.append(RandomApply(
            RandomAffine(e["degrees"], e.get("translate"), e.get("scale"),
                         e.get("shear")), p=e["p"]))
    if on("RandomPerspective"):
        e = td["RandomPerspective"]
        tl.append(RandomPerspective(e["distortion_scale"], p=e["p"]))
    if on("RandomSolarize"):
        e = td["RandomSolarize"]
        tl.append(RandomSolarize(threshold=e["threshold"], p=e["p"]))
    if on("AugMix"):
        e = td["AugMix"]
        tl.append(AugMix(severity=e.get("severity", 3),
                         mixture_width=e.get("mixture_width", 3),
                         chain_depth=e.get("chain_depth", -1),
                         alpha=e.get("alpha", 1.0),
                         all_ops=e.get("all_ops", True)))
    if on("RandAugment"):
        e = td["RandAugment"]
        tl.append(RandAugment(num_ops=e.get("num_ops", 2),
                              magnitude=e.get("magnitude", 9)))
    if on("AutoAugment"):
        tl.append(AutoAugment())
    if on("TrivialAugment"):
        tl.append(TrivialAugmentWide())

    if td.get("Normalize"):
        from .. import native as _native
        if _native.available():
            tl.append(NativeToArrayNormalize(mean, std))
        else:
            tl.append(ToArray())
            tl.append(Normalize(mean, std))
    else:
        tl.append(ToArray())
    if on("RandomErasing"):
        e = td["RandomErasing"]
        tl.append(RandomErasing(p=e["p"], scale=tuple(e["scale"]),
                                ratio=tuple(e["ratio"]), value=e["value"]))
    return Compose(tl)
