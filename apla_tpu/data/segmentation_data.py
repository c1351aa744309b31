"""Semantic-segmentation dataset (ADE20K-style directory layout).

Reference scope: seg data handling lives in mmseg; here a self-contained
reader for the standard layout

    <root>/images/<split>/*.jpg
    <root>/annotations/<split>/*.png    (per-pixel class ids; 0 or 255 = ignore)

emitting fixed-size (image [S, S, 3] float32 normalised, label [S, S] int32)
pairs — nearest-neighbour label resize, reduce_zero_label like mmseg's
ADE20K convention (class ids shift down by one, 0 becomes ignore 255).
"""

from __future__ import annotations

import glob
import os

import numpy as np
from PIL import Image


class ADE20KSegmentation:
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    ignore_index = 255
    n_classes = 150

    def __init__(self, root: str, split: str = "training",
                 img_size: int = 512, reduce_zero_label: bool = True):
        self.img_size = img_size
        self.reduce_zero_label = reduce_zero_label
        img_dir = os.path.join(root, "images", split)
        ann_dir = os.path.join(root, "annotations", split)
        self.samples = []
        for img_path in sorted(glob.glob(os.path.join(img_dir, "*.jpg"))):
            stem = os.path.splitext(os.path.basename(img_path))[0]
            ann_path = os.path.join(ann_dir, stem + ".png")
            if os.path.exists(ann_path):
                self.samples.append((img_path, ann_path))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx, rng=None):
        img_path, ann_path = self.samples[idx]
        with open(img_path, "rb") as f:
            img = Image.open(f).convert("RGB")
        with open(ann_path, "rb") as f:
            ann = Image.open(f)
            ann.load()  # PIL is lazy; read before the file closes
        s = self.img_size
        img = img.resize((s, s), Image.BILINEAR)
        ann = ann.resize((s, s), Image.NEAREST)
        arr = np.asarray(img, np.float32) / 255.0
        arr = (arr - self.mean) / self.std
        label = np.asarray(ann, np.int64)
        if label.ndim == 3:
            label = label[..., 0]
        if self.reduce_zero_label:
            # mmseg ADE20K: 0 = unlabeled -> ignore; classes 1..150 -> 0..149;
            # a raw 255 shifts to 254 and must ALSO map back to ignore
            # (mmseg sets it to 255 after the shift)
            label = label.astype(np.int64)
            label = np.where(label == 0, 256, label) - 1
            label = np.where(label >= 254, self.ignore_index, label)
        return {"image": arr.astype(np.float32),
                "label": label.astype(np.int32)}


def segmentation_collate(samples):
    return {"image": np.stack([s["image"] for s in samples]),
            "label": np.stack([s["label"] for s in samples])}
