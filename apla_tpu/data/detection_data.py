"""COCO-format detection dataset + collate (detection side-car data path).

The reference defers detection data entirely to mmdet; here a self-contained
COCO-annotation reader emits fixed-size padded GT buffers (static shapes for
XLA): boxes [M, 4] xyxy, labels [M] with -1 padding, and — for the
instance-segmentation recipe (the reference's det config trains box AND mask
heads: apla_mask_rcnn_swin_tiny_..._coco.py `with_mask=True`) — rasterized
binary masks [M, Hm, Wm] on a fixed mask grid (img_size / mask_stride).
"""

from __future__ import annotations

import json
import os

import numpy as np
from PIL import Image, ImageDraw


def _rle_counts_from_string(s: str):
    """Decode COCO's compressed-RLE char encoding to a counts list
    (pycocotools rleFrString semantics: 5-bit groups, bit 0x20 = more,
    sign-extend on 0x10 in the last group, delta vs counts[-2])."""
    counts = []
    p = 0
    while p < len(s):
        x, k, more = 0, 0, True
        while more:
            c = ord(s[p]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def rle_to_mask(rle) -> np.ndarray:
    """COCO RLE ({'counts': list|str, 'size': [h, w]}) -> [h, w] uint8.
    Counts are column-major (Fortran) runs alternating 0/1, starting at 0."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, str):
        counts = _rle_counts_from_string(counts)
    flat = np.zeros(h * w, np.uint8)
    pos, val = 0, 0
    for c in counts:
        flat[pos:pos + c] = val
        pos += c
        val = 1 - val
    return flat.reshape((w, h)).T


def polygons_to_mask(polys, out_h: int, out_w: int, sx: float = 1.0,
                     sy: float = 1.0) -> np.ndarray:
    """Rasterize COCO polygon list ([[x0,y0,x1,y1,...], ...], source-image
    coords) onto an [out_h, out_w] uint8 grid, scaling coords by (sx, sy)."""
    img = Image.new("L", (out_w, out_h), 0)
    draw = ImageDraw.Draw(img)
    for poly in polys:
        pts = [(poly[i] * sx, poly[i + 1] * sy)
               for i in range(0, len(poly) - 1, 2)]
        if len(pts) >= 3:
            draw.polygon(pts, outline=1, fill=1)
    return np.asarray(img, np.uint8)


class CocoDetection:
    """Reads a COCO `instances_*.json` + image dir.  Samples:
    {'image': HWC float32 (resized, normalized), 'boxes': [M,4] (resized
    coords), 'labels': [M], 'n_boxes': int}."""

    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)

    def __init__(self, img_dir: str, ann_file: str, img_size: int = 224,
                 max_boxes: int = 32, with_masks: bool = False,
                 mask_stride: int = 4):
        self.img_dir = img_dir
        self.img_size = img_size
        self.max_boxes = max_boxes
        self.with_masks = with_masks
        self.mask_stride = mask_stride
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
        out = {"image": arr.astype(np.float32), "boxes": boxes,
               "labels": labels, "n_boxes": len(anns)}
        if self.with_masks:
            hm = self.img_size // self.mask_stride
            masks = np.zeros((self.max_boxes, hm, hm), np.uint8)
            for i, ann in enumerate(anns):
                masks[i] = self._gt_mask(ann, (h0, w0), hm)
            out["masks"] = masks
        return out

    def _gt_mask(self, ann, src_hw, hm):
        """Rasterize one annotation's segmentation onto the [hm, hm] mask
        grid; a missing/empty segmentation falls back to the filled box."""
        h0, w0 = src_hw
        seg = ann.get("segmentation")
        if isinstance(seg, dict):  # RLE (uncompressed list or compressed str)
            full = rle_to_mask(seg)
            ys = (np.arange(hm) + 0.5) * full.shape[0] / hm
            xs = (np.arange(hm) + 0.5) * full.shape[1] / hm
            return full[ys.astype(int)[:, None], xs.astype(int)[None, :]]
        if isinstance(seg, list) and seg and isinstance(seg[0], (list, tuple)):
            return polygons_to_mask(seg, hm, hm, sx=hm / w0, sy=hm / h0)
        # box fallback (also what mmdet does for degenerate segmentations)
        x, y, bw, bh = ann["bbox"]
        m = np.zeros((hm, hm), np.uint8)
        x0 = int(np.floor(x / w0 * hm))
        y0 = int(np.floor(y / h0 * hm))
        x1 = int(np.ceil((x + bw) / w0 * hm))
        y1 = int(np.ceil((y + bh) / h0 * hm))
        m[max(y0, 0):y1, max(x0, 0):x1] = 1
        return m


def detection_collate(samples):
    out = {
        "image": np.stack([s["image"] for s in samples]),
        "boxes": np.stack([s["boxes"] for s in samples]),
        "labels": np.stack([s["labels"] for s in samples]),
    }
    if "masks" in samples[0]:
        out["masks"] = np.stack([s["masks"] for s in samples])
    return out
