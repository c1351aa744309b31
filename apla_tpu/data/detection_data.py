"""COCO-format detection dataset + collate (detection side-car data path).

The reference defers detection data entirely to mmdet; here a self-contained
COCO-annotation reader emits fixed-size padded GT buffers (static shapes for
XLA): boxes [M, 4] xyxy, labels [M] with -1 padding.
"""

from __future__ import annotations

import json
import os

import numpy as np
from PIL import Image


class CocoDetection:
    """Reads a COCO `instances_*.json` + image dir.  Samples:
    {'image': HWC float32 (resized, normalized), 'boxes': [M,4] (resized
    coords), 'labels': [M], 'n_boxes': int}."""

    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)

    def __init__(self, img_dir: str, ann_file: str, img_size: int = 224,
                 max_boxes: int = 32):
        self.img_dir = img_dir
        self.img_size = img_size
        self.max_boxes = max_boxes
        with open(ann_file) as f:
            coco = json.load(f)
        cat_ids = sorted(c["id"] for c in coco.get("categories", []))
        self.cat_to_label = {c: i for i, c in enumerate(cat_ids)}
        self.n_classes = len(cat_ids)
        self.images = {im["id"]: im for im in coco["images"]}
        self.anns_by_image = {}
        for ann in coco.get("annotations", []):
            if ann.get("iscrowd"):
                continue
            self.anns_by_image.setdefault(ann["image_id"], []).append(ann)
        self.ids = sorted(self.images)

    def __len__(self):
        return len(self.ids)

    def __getitem__(self, idx, rng=None):
        img_id = self.ids[idx]
        info = self.images[img_id]
        path = os.path.join(self.img_dir, info["file_name"])
        with open(path, "rb") as f:
            img = Image.open(f).convert("RGB")
        w0, h0 = img.size
        img = img.resize((self.img_size, self.img_size), Image.BILINEAR)
        arr = np.asarray(img, np.float32) / 255.0
        arr = (arr - self.mean) / self.std

        sx = self.img_size / w0
        sy = self.img_size / h0
        boxes = np.zeros((self.max_boxes, 4), np.float32)
        labels = np.full((self.max_boxes,), -1, np.int32)
        anns = self.anns_by_image.get(img_id, [])[:self.max_boxes]
        for i, ann in enumerate(anns):
            x, y, bw, bh = ann["bbox"]  # COCO xywh
            boxes[i] = [x * sx, y * sy, (x + bw) * sx, (y + bh) * sy]
            labels[i] = self.cat_to_label[ann["category_id"]]
        return {"image": arr.astype(np.float32), "boxes": boxes,
                "labels": labels, "n_boxes": len(anns)}


def detection_collate(samples):
    return {
        "image": np.stack([s["image"] for s in samples]),
        "boxes": np.stack([s["boxes"] for s in samples]),
        "labels": np.stack([s["labels"] for s in samples]),
    }
