"""Anchor-free detection head on the APLA-Swin feature pyramid.

Reference scope: the reference's detection support is a backbone drop-in —
`APLA_SwinTransformer` (freeze all but attn.proj) fed into mmdet's Mask R-CNN
(`apla_mask_rcnn_swin_tiny_..._coco.py`); the head itself is external.  Here
a compact in-repo FCOS-style head (shared conv towers -> per-level cls /
box / centerness maps, focal + IoU loss, top-k + NMS decode) makes the
adapted backbone trainable end-to-end for detection on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .vit import trunc_normal


def _conv_init(key, k, c_in, c_out):
    return {"kernel": trunc_normal(key, (k, k, c_in, c_out), std=0.01),
            "bias": jnp.zeros((c_out,))}


def init_fcos_head(key, in_channels, n_classes, channels=128, n_convs=2,
                   n_levels=4, n_protos=0):
    """`n_protos > 0` adds a mask-coefficient conv on the box tower (the
    instance-mask branch: the reference's detection recipe is Mask R-CNN
    with `with_mask=True`, apla_mask_rcnn_swin_tiny_..._coco.py:28; here
    masks are prototype+coefficient style — static shapes, no RoI ops)."""
    keys = jax.random.split(key, 2 * n_convs + 5)
    head = {"cls_tower": [], "box_tower": []}
    for i in range(n_convs):
        cin = in_channels if i == 0 else channels
        head["cls_tower"].append(_conv_init(keys[2 * i], 3, cin, channels))
        head["box_tower"].append(_conv_init(keys[2 * i + 1], 3, cin, channels))
    head["cls"] = _conv_init(keys[-5], 3, channels, n_classes)
    # focal-loss prior: start predictions near p=0.01
    head["cls"]["bias"] = jnp.full((n_classes,), -np.log((1 - 0.01) / 0.01))
    head["box"] = _conv_init(keys[-4], 3, channels, 4)
    head["ctr"] = _conv_init(keys[-3], 3, channels, 1)
    if n_protos:
        head["coef"] = _conv_init(keys[-2], 3, channels, n_protos)
    head["scales"] = jnp.ones((n_levels,))
    # lateral 1x1 convs: project each pyramid level to `channels`... handled
    # by per-level input conv when channel counts differ
    return head


def init_protonet(key, in_channels, n_protos=32, channels=64, n_convs=2):
    """Prototype-mask net on the finest (lateral-projected) pyramid level:
    n_convs 3x3-relu + a 1x1 to `n_protos` channels."""
    keys = jax.random.split(key, n_convs + 1)
    convs = []
    for i in range(n_convs):
        cin = in_channels if i == 0 else channels
        convs.append(_conv_init(keys[i], 3, cin, channels))
    return {"convs": convs, "out": _conv_init(keys[-1], 1, channels,
                                              n_protos)}


def protonet_forward(feat, params):
    """[B, Hm, Wm, C] finest level -> prototype masks [B, Hm, Wm, P]."""
    x = feat
    for p in params["convs"]:
        x = jax.nn.relu(_conv(x, p))
    return jax.nn.relu(_conv(x, params["out"])).astype(jnp.float32)


def _conv(x, p):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    return y + p["bias"].astype(x.dtype)


def fcos_head_forward(features, head, laterals=None):
    """features: list of [B, H, W, C_l] pyramid levels (C_l may differ —
    pass `laterals` 1x1 conv params per level to unify).  Returns per-level
    (cls_logits [B,H,W,K], box [B,H,W,4], ctr [B,H,W,1]) — plus mask
    coefficients [B,H,W,P] (tanh) when the head has a 'coef' conv."""
    outs = []
    for lvl, feat in enumerate(features):
        x = feat
        if laterals is not None:
            x = _conv(x, laterals[lvl])
        c = x
        for p in head["cls_tower"]:
            c = jax.nn.relu(_conv(c, p))
        b = x
        for p in head["box_tower"]:
            b = jax.nn.relu(_conv(b, p))
        cls_logits = _conv(c, head["cls"]).astype(jnp.float32)
        box = jax.nn.relu(_conv(b, head["box"]).astype(jnp.float32)
                          * head["scales"][lvl])
        ctr = _conv(b, head["ctr"]).astype(jnp.float32)
        if "coef" in head:
            coef = jnp.tanh(_conv(b, head["coef"]).astype(jnp.float32))
            outs.append((cls_logits, box, ctr, coef))
        else:
            outs.append((cls_logits, box, ctr))
    return outs


def focal_loss(logits, targets, alpha=0.25, gamma=2.0):
    """Sigmoid focal loss; targets one-hot [N, K] (0 rows = background)."""
    p = jax.nn.sigmoid(logits)
    ce = -(targets * jax.nn.log_sigmoid(logits)
           + (1 - targets) * jax.nn.log_sigmoid(-logits))
    p_t = p * targets + (1 - p) * (1 - targets)
    a_t = alpha * targets + (1 - alpha) * (1 - targets)
    return a_t * ((1 - p_t) ** gamma) * ce


def iou_loss(pred_ltrb, target_ltrb, eps=1e-7):
    """IoU loss between (l, t, r, b) distance encodings at matched points."""
    pl, pt, pr, pb = jnp.split(pred_ltrb, 4, axis=-1)
    tl, tt, tr, tb = jnp.split(target_ltrb, 4, axis=-1)
    p_area = (pl + pr) * (pt + pb)
    t_area = (tl + tr) * (tt + tb)
    iw = jnp.minimum(pl, tl) + jnp.minimum(pr, tr)
    ih = jnp.minimum(pt, tt) + jnp.minimum(pb, tb)
    inter = jnp.clip(iw, 0) * jnp.clip(ih, 0)
    union = p_area + t_area - inter
    iou = inter / (union + eps)
    return -jnp.log(iou + eps)[..., 0]


def _fcos_loss_single(level_maps, strides, gt_boxes, gt_labels,
                      size_ranges=((0, 64), (64, 128), (128, 256),
                                   (256, 1e8)),
                      coefs=None, protos=None, gt_masks=None,
                      mask_stride=4):
    """Per-image FCOS loss terms.  `level_maps`: list of (cls [H,W,K],
    box [H,W,4], ctr [H,W,1]); gt padded with label -1.  With
    `coefs` (per-level [H,W,P]) + `protos` [Hm,Wm,P] + `gt_masks`
    [M,Hm,Wm], also returns the prototype-mask loss (one representative
    positive location per instance; BCE cropped to the GT box)."""
    total_cls = total_box = total_ctr = n_pos = 0.0
    rep_scores, rep_best, rep_coefs = [], [], []
    valid_gt = gt_labels >= 0
    areas = jnp.where(valid_gt,
                      (gt_boxes[:, 2] - gt_boxes[:, 0])
                      * (gt_boxes[:, 3] - gt_boxes[:, 1]), 1e9)
    for lvl, (cls_logits, box, ctr) in enumerate(level_maps):
        H, W, K = cls_logits.shape
        stride = strides[lvl]
        ys = (jnp.arange(H) + 0.5) * stride
        xs = (jnp.arange(W) + 0.5) * stride
        py, px = jnp.meshgrid(ys, xs, indexing="ij")      # [H, W]
        l = px[..., None] - gt_boxes[None, None, :, 0]
        t = py[..., None] - gt_boxes[None, None, :, 1]
        r = gt_boxes[None, None, :, 2] - px[..., None]
        b = gt_boxes[None, None, :, 3] - py[..., None]
        ltrb = jnp.stack([l, t, r, b], axis=-1)           # [H, W, M, 4]
        inside = jnp.min(ltrb, axis=-1) > 0
        max_dist = jnp.max(ltrb, axis=-1)
        lo, hi = size_ranges[min(lvl, len(size_ranges) - 1)]
        in_range = (max_dist >= lo) & (max_dist <= hi)
        candidate = inside & in_range & valid_gt[None, None, :]
        cand_areas = jnp.where(candidate, areas[None, None, :], 1e9)
        best = jnp.argmin(cand_areas, axis=-1)            # [H, W]
        is_pos = jnp.take_along_axis(candidate, best[..., None],
                                     axis=-1)[..., 0]
        tgt_label = jnp.where(is_pos, gt_labels[best], -1)
        tgt_ltrb = jnp.take_along_axis(
            ltrb, best[..., None, None].repeat(4, -1), axis=2)[:, :, 0]

        one_hot = jax.nn.one_hot(jnp.where(tgt_label >= 0, tgt_label, 0),
                                 K) * (tgt_label >= 0)[..., None]
        total_cls = total_cls + jnp.sum(focal_loss(cls_logits, one_hot))
        lr_ = jnp.stack([tgt_ltrb[..., 0], tgt_ltrb[..., 2]], -1)
        tb_ = jnp.stack([tgt_ltrb[..., 1], tgt_ltrb[..., 3]], -1)
        ctr_tgt = jnp.sqrt(
            jnp.clip(jnp.min(lr_, -1) / jnp.clip(jnp.max(lr_, -1), 1e-7), 0)
            * jnp.clip(jnp.min(tb_, -1) / jnp.clip(jnp.max(tb_, -1), 1e-7),
                       0))
        pos = is_pos.astype(jnp.float32)
        total_box = total_box + jnp.sum(
            iou_loss(box / stride, tgt_ltrb / stride) * pos)
        ctr_bce = -(ctr_tgt * jax.nn.log_sigmoid(ctr[..., 0])
                    + (1 - ctr_tgt) * jax.nn.log_sigmoid(-ctr[..., 0]))
        total_ctr = total_ctr + jnp.sum(ctr_bce * pos)
        n_pos = n_pos + jnp.sum(pos)
        if coefs is not None:
            # flatten this level's assignment for representative selection
            rep_scores.append(((ctr_tgt + 1e-6) * pos).reshape(-1))
            rep_best.append(best.reshape(-1))
            rep_coefs.append(coefs[lvl].reshape(-1, coefs[lvl].shape[-1]))
    if coefs is None:
        return total_cls, total_box, total_ctr, n_pos
    mask_l, n_mask = _proto_mask_loss(
        jnp.concatenate(rep_scores), jnp.concatenate(rep_best),
        jnp.concatenate(rep_coefs), protos, gt_boxes, gt_labels, gt_masks,
        mask_stride)
    return total_cls, total_box, total_ctr, n_pos, mask_l, n_mask


def _proto_mask_loss(score_flat, best_flat, coef_flat, protos, gt_boxes,
                     gt_labels, gt_masks, mask_stride):
    """Prototype-mask loss over one image.  For each GT instance pick the
    highest-centerness positive location across all levels (stop-gradient
    argmax; the coef gather itself IS differentiated — that is how the
    coefficient maps and protonet train), assemble its mask as
    sigmoid(protos @ coef), and take box-cropped BCE against the GT mask,
    normalised per instance by the GT-box pixel area (YOLACT semantics).
    Returns (sum of per-instance losses, number of valid instances)."""
    M = gt_labels.shape[0]
    hm, wm, _ = protos.shape
    # [L, M] score of each location for each instance
    scores_2d = score_flat[:, None] * (best_flat[:, None]
                                       == jnp.arange(M)[None, :])
    rep_idx = jnp.argmax(scores_2d, axis=0)                    # [M]
    has_pos = jnp.max(scores_2d, axis=0) > 0
    coef_m = coef_flat[rep_idx]                                # [M, P]
    logits = jnp.einsum("hwp,mp->mhw", protos, coef_m)         # [M, Hm, Wm]
    tgt = gt_masks.astype(jnp.float32)
    bce = -(tgt * jax.nn.log_sigmoid(logits)
            + (1 - tgt) * jax.nn.log_sigmoid(-logits))
    # crop to the GT box on the mask grid
    cy = (jnp.arange(hm) + 0.5) * mask_stride
    cx = (jnp.arange(wm) + 0.5) * mask_stride
    inside = ((cx[None, None, :] >= gt_boxes[:, 0, None, None])
              & (cx[None, None, :] <= gt_boxes[:, 2, None, None])
              & (cy[None, :, None] >= gt_boxes[:, 1, None, None])
              & (cy[None, :, None] <= gt_boxes[:, 3, None, None]))
    inside = inside.astype(jnp.float32)
    area = jnp.maximum(jnp.sum(inside, axis=(1, 2)), 1.0)
    per_inst = jnp.sum(bce * inside, axis=(1, 2)) / area       # [M]
    valid = ((gt_labels >= 0) & has_pos).astype(jnp.float32)
    return jnp.sum(per_inst * valid), jnp.sum(valid)


def fcos_loss(level_outs, strides, gt_boxes, gt_labels, n_classes, img_hw):
    """Single-image convenience wrapper ([1, H, W, *] maps)."""
    maps = [(lvl[0][0], lvl[1][0], lvl[2][0]) for lvl in level_outs]
    cls_l, box_l, ctr_l, n_pos = _fcos_loss_single(
        maps, tuple(strides), gt_boxes, gt_labels)
    n_pos = jnp.maximum(n_pos, 1.0)
    return {"cls_loss": cls_l / n_pos, "box_loss": box_l / n_pos,
            "ctr_loss": ctr_l / n_pos,
            "total": (cls_l + box_l + ctr_l) / n_pos}


def fcos_loss_batch(level_outs, strides, gt_boxes, gt_labels,
                    protos=None, gt_masks=None, mask_stride=4,
                    mask_weight=2.0):
    """Batched FCOS loss via vmap: level_outs [B, H, W, *] per level;
    gt_boxes [B, M, 4]; gt_labels [B, M].  Positives normalised over the
    whole batch (FCOS convention).  With coef maps in `level_outs` plus
    `protos` [B,Hm,Wm,P] and `gt_masks` [B,M,Hm,Wm], adds the prototype
    mask loss (normalised over valid instances in the batch)."""
    strides = tuple(strides)
    arity = len(level_outs[0])
    with_mask = protos is not None and arity == 4

    def single(maps_flat, boxes, labels, *mask_args):
        maps = [tuple(maps_flat[arity * i:arity * i + 3])
                for i in range(len(maps_flat) // arity)]
        if not with_mask:
            return _fcos_loss_single(maps, strides, boxes, labels)
        coefs = [maps_flat[arity * i + 3]
                 for i in range(len(maps_flat) // arity)]
        proto, masks = mask_args
        return _fcos_loss_single(maps, strides, boxes, labels, coefs=coefs,
                                 protos=proto, gt_masks=masks,
                                 mask_stride=mask_stride)

    flat = [a for lvl in level_outs for a in lvl]
    if with_mask:
        cls_l, box_l, ctr_l, n_pos, mask_l, n_mask = jax.vmap(single)(
            flat, gt_boxes, gt_labels, protos, gt_masks)
    else:
        cls_l, box_l, ctr_l, n_pos = jax.vmap(
            single, in_axes=(0, 0, 0))(flat, gt_boxes, gt_labels)
    n_pos = jnp.maximum(jnp.sum(n_pos), 1.0)
    out = {"cls_loss": jnp.sum(cls_l) / n_pos,
           "box_loss": jnp.sum(box_l) / n_pos,
           "ctr_loss": jnp.sum(ctr_l) / n_pos}
    out["total"] = out["cls_loss"] + out["box_loss"] + out["ctr_loss"]
    if with_mask:
        out["mask_loss"] = (mask_weight * jnp.sum(mask_l)
                            / jnp.maximum(jnp.sum(n_mask), 1.0))
        out["total"] = out["total"] + out["mask_loss"]
    return out


def decode_detections(level_outs, strides, score_thresh=0.05, top_k=100,
                      protos=None, mask_stride=4, mask_thresh=0.5):
    """Decode per-level maps to (boxes [N,4], scores [N], labels [N]) on
    host (numpy) with greedy NMS.  When the maps carry mask coefficients
    and `protos` [1, Hm, Wm, P] is given, also returns boolean instance
    masks [N, Hm, Wm] (sigmoid(protos @ coef), cropped to the predicted
    box, thresholded)."""
    with_mask = protos is not None and len(level_outs[0]) == 4
    boxes, scores, labels, coef_rows = [], [], [], []
    for lvl, maps in enumerate(level_outs):
        cls_logits, box, ctr = maps[0], maps[1], maps[2]
        stride = strides[lvl]
        cls_p = np.asarray(jax.nn.sigmoid(cls_logits))[0]
        ctr_p = np.asarray(jax.nn.sigmoid(ctr))[0, ..., 0]
        box_np = np.asarray(box)[0]
        coef_np = np.asarray(maps[3])[0] if with_mask else None
        H, W, K = cls_p.shape
        ys = (np.arange(H) + 0.5) * stride
        xs = (np.arange(W) + 0.5) * stride
        py, px = np.meshgrid(ys, xs, indexing="ij")
        score = cls_p * ctr_p[..., None]
        keep = score > score_thresh
        hh, ww, kk = np.nonzero(keep)
        for y, x, k in zip(hh, ww, kk):
            l, t, r, b = box_np[y, x]
            boxes.append([px[y, x] - l, py[y, x] - t,
                          px[y, x] + r, py[y, x] + b])
            scores.append(score[y, x, k])
            labels.append(k)
            if with_mask:
                coef_rows.append(coef_np[y, x])
    if not boxes:
        empty = (np.zeros((0, 4)), np.zeros((0,)), np.zeros((0,), int))
        if with_mask:
            hm, wm = protos.shape[1:3]
            return empty + (np.zeros((0, hm, wm), bool),)
        return empty
    boxes = np.asarray(boxes)
    scores = np.asarray(scores)
    labels = np.asarray(labels, int)
    order = np.argsort(-scores)[:top_k * 4]
    boxes, scores, labels = boxes[order], scores[order], labels[order]
    keep = nms(boxes, scores, iou_thresh=0.6)[:top_k]
    if not with_mask:
        return boxes[keep], scores[keep], labels[keep]
    coef = np.asarray(coef_rows)[order][keep]                  # [N, P]
    proto_np = np.asarray(protos)[0]                           # [Hm, Wm, P]
    logits = np.einsum("hwp,np->nhw", proto_np, coef)
    masks = 1.0 / (1.0 + np.exp(-logits)) > mask_thresh
    hm, wm = proto_np.shape[:2]
    cy = (np.arange(hm) + 0.5) * mask_stride
    cx = (np.arange(wm) + 0.5) * mask_stride
    kept_boxes = boxes[keep]
    inside = ((cx[None, None, :] >= kept_boxes[:, 0, None, None])
              & (cx[None, None, :] <= kept_boxes[:, 2, None, None])
              & (cy[None, :, None] >= kept_boxes[:, 1, None, None])
              & (cy[None, :, None] <= kept_boxes[:, 3, None, None]))
    return kept_boxes, scores[keep], labels[keep], masks & inside


def nms(boxes, scores, iou_thresh=0.5):
    order = np.argsort(-scores)
    keep = []
    while len(order):
        i = order[0]
        keep.append(i)
        if len(order) == 1:
            break
        rest = order[1:]
        xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        a_r = (boxes[rest, 2] - boxes[rest, 0]) \
            * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / (a_i + a_r - inter + 1e-9)
        order = rest[iou <= iou_thresh]
    return np.asarray(keep, int)


def box_iou_matrix(a, b):
    """IoU between box sets a [N,4], b [M,4] (xyxy), numpy."""
    a = np.asarray(a, float)
    b = np.asarray(b, float)
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-9)


def mask_iou(a, b):
    """IoU between two boolean masks of the same shape."""
    a = np.asarray(a, bool)
    b = np.asarray(b, bool)
    union = np.logical_or(a, b).sum()
    return float(np.logical_and(a, b).sum() / union) if union else 0.0


class DetectionAP:
    """Mean average precision at an IoU threshold (VOC-style, all-point
    interpolation) — the in-repo analogue of the mmdet COCO eval the
    reference delegates to.  `use_masks=True` matches on instance-mask IoU
    instead of box IoU (the mask-mAP half of the reference's Mask R-CNN
    recipe, apla_mask_rcnn_swin_tiny_..._coco.py `with_mask=True`); then
    `add_image` takes `pred_masks` / `gt_masks` on a shared mask grid."""

    def __init__(self, n_classes, iou_thresh=0.5, use_masks=False):
        self.n_classes = n_classes
        self.iou_thresh = iou_thresh
        self.use_masks = use_masks
        self.preds = []   # (image_id, label, score, box_or_mask)
        self.gts = []     # (image_id, label, box_or_mask)

    def add_image(self, image_id, pred_boxes, pred_scores, pred_labels,
                  gt_boxes, gt_labels, pred_masks=None, gt_masks=None):
        pred_geo = pred_masks if self.use_masks else pred_boxes
        gt_geo = gt_masks if self.use_masks else gt_boxes
        for g, s, l in zip(pred_geo, pred_scores, pred_labels):
            self.preds.append((image_id, int(l), float(s), np.asarray(g)))
        for g, l in zip(gt_geo, gt_labels):
            if int(l) >= 0:
                self.gts.append((image_id, int(l), np.asarray(g)))

    def _iou(self, a, b):
        if self.use_masks:
            return mask_iou(a, b)
        return float(box_iou_matrix(a[None], b[None])[0, 0])

    def mean_ap(self):
        aps = []
        for c in range(self.n_classes):
            gts_c = [(i, b) for (i, l, b) in self.gts if l == c]
            preds_c = sorted([(i, s, b) for (i, l, s, b) in self.preds
                              if l == c], key=lambda t: -t[1])
            if not gts_c:
                continue
            matched = set()
            tp = np.zeros(len(preds_c))
            fp = np.zeros(len(preds_c))
            for k, (img, _, box) in enumerate(preds_c):
                cands = [(j, g) for j, (gi, g) in enumerate(gts_c)
                         if gi == img and j not in matched]
                best_iou, best_j = 0.0, -1
                for j, g in cands:
                    iou = self._iou(box, g)
                    if iou > best_iou:
                        best_iou, best_j = iou, j
                if best_iou >= self.iou_thresh:
                    tp[k] = 1
                    matched.add(best_j)
                else:
                    fp[k] = 1
            tp_cum = np.cumsum(tp)
            fp_cum = np.cumsum(fp)
            recall = tp_cum / len(gts_c)
            precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
            # all-point interpolation
            ap = 0.0
            for r in np.linspace(0, 1, 101):
                p = precision[recall >= r].max() if (recall >= r).any() else 0
                ap += p / 101
            aps.append(ap)
        return float(np.mean(aps)) if aps else 0.0


def make_detection_train_step(swin_cfg, tx, strides=None, with_mask=False):
    """Jitted detection train step: APLA-Swin backbone -> lateral 1x1s ->
    FCOS head -> batched FCOS loss -> optimizer update.  The first-class
    analogue of `make_train_step` for the detection side-car (the reference
    only ships mmdet drop-in backbones; the head/loss here are this
    framework's own).

    `trainable` = {"backbone": swin trainable, "head": fcos head,
    "laterals": [conv params], + "protonet" when with_mask};
    batch = {"image" [B,H,W,3], "boxes" [B,M,4] (padded with -1 rows),
    "labels" [B,M], + "masks" [B,M,Hm,Wm] when with_mask}."""
    import optax

    from .swin import swin_features

    if strides is None:
        # one pyramid level per Swin stage: patch stride 4, doubling per
        # merge — a fixed (4, 8) default would mismatch the stock 4-stage
        # config and index out of range in the loss
        strides = tuple(4 * 2 ** i for i in range(len(swin_cfg.depths)))

    def step(trainable, opt_state, frozen, batch):
        def loss_fn(t):
            feats = swin_features(frozen, batch["image"], swin_cfg,
                                  trainable=t["backbone"])
            outs = fcos_head_forward(feats, t["head"], t["laterals"])
            protos = gt_masks = None
            if with_mask:
                # protonet reads the finest lateral-projected level
                fin = _conv(feats[0], t["laterals"][0])
                protos = protonet_forward(fin, t["protonet"])
                gt_masks = batch["masks"]
            losses = fcos_loss_batch(outs, strides, batch["boxes"],
                                     batch["labels"], protos=protos,
                                     gt_masks=gt_masks,
                                     mask_stride=strides[0])
            return losses["total"], losses

        (loss, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        metrics = dict(losses)
        metrics["grad_norm"] = optax.global_norm(grads)
        return trainable, opt_state, metrics

    return jax.jit(step, donate_argnums=(0, 1))
