"""Instance-mask detection branch tests (the reference recipe trains box
AND mask heads: apla_mask_rcnn_swin_tiny_..._coco.py `with_mask=True`;
here a prototype+coefficient branch — static shapes, no RoI ops)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from PIL import Image

from apla_tpu.data.detection_data import (CocoDetection, detection_collate,
                                          polygons_to_mask, rle_to_mask)
from apla_tpu.models.detection import (DetectionAP, decode_detections,
                                       fcos_head_forward, fcos_loss_batch,
                                       init_fcos_head, init_protonet,
                                       make_detection_train_step, mask_iou,
                                       protonet_forward, _conv, _conv_init)
from apla_tpu.models.swin import (SwinConfig, build_apla_swin,
                                  init_swin_params, swin_features)

CFG = SwinConfig(img_size=56, patch_size=4, embed_dim=32, depths=(2, 2),
                 num_heads=(2, 4), window_size=7, compute_dtype=jnp.float32)


# ------------------------------------------------------------------ #
# GT mask parsing
# ------------------------------------------------------------------ #

def test_rle_to_mask_uncompressed():
    # 3x4 mask, column-major runs: 2 zeros, 3 ones, 7 zeros
    m = rle_to_mask({"size": [3, 4], "counts": [2, 3, 7]})
    expect = np.zeros((3, 4), np.uint8)
    # column-major positions 2, 3, 4 -> (2,0), (0,1), (1,1)
    expect[2, 0] = expect[0, 1] = expect[1, 1] = 1
    np.testing.assert_array_equal(m, expect)


def test_polygons_to_mask_square():
    # unit square [2, 2] -> [6, 6] in a 8x8 grid
    m = polygons_to_mask([[2, 2, 6, 2, 6, 6, 2, 6]], 8, 8)
    assert m[4, 4] == 1 and m[0, 0] == 0 and m[7, 7] == 0
    assert m.sum() >= 16  # filled interior


def make_coco_masks(tmp_path, n_images=3):
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    images, annotations = [], []
    for i in range(n_images):
        name = f"im{i}.jpg"
        Image.fromarray(np.full((56, 56, 3), 20 * i, np.uint8)).save(
            img_dir / name)
        images.append({"id": i, "file_name": name, "width": 56,
                       "height": 56})
        # a square object with a polygon mask matching its box
        annotations.append({
            "id": 10 + i, "image_id": i, "category_id": 7,
            "bbox": [8, 8, 32, 32], "iscrowd": 0,
            "segmentation": [[8, 8, 40, 8, 40, 40, 8, 40]]})
    ann = {"images": images, "annotations": annotations,
           "categories": [{"id": 7, "name": "thing"}]}
    ann_file = tmp_path / "instances.json"
    ann_file.write_text(json.dumps(ann))
    return str(img_dir), str(ann_file)


def test_coco_with_masks(tmp_path):
    img_dir, ann_file = make_coco_masks(tmp_path)
    ds = CocoDetection(img_dir, ann_file, img_size=56, max_boxes=4,
                       with_masks=True, mask_stride=4)
    s = ds[0]
    assert s["masks"].shape == (4, 14, 14)
    m = s["masks"][0]
    # polygon square covers ~[2..10) on the 14-grid
    assert m[5, 5] == 1 and m[0, 0] == 0 and m[13, 13] == 0
    assert s["masks"][1].sum() == 0  # padding instance
    batch = detection_collate([ds[i] for i in range(2)])
    assert batch["masks"].shape == (2, 4, 14, 14)


def test_rle_fallbacks(tmp_path):
    # uncompressed-RLE segmentation + missing segmentation (box fallback)
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(img_dir / "a.jpg")
    full = np.zeros((8, 8), np.uint8)
    full[2:6, 2:6] = 1
    # encode column-major runs
    flat = full.T.reshape(-1)
    counts, run, val = [], 0, 0
    for v in flat:
        if v == val:
            run += 1
        else:
            counts.append(run)
            run, val = 1, v
    counts.append(run)
    ann = {"images": [{"id": 0, "file_name": "a.jpg", "width": 8,
                       "height": 8}],
           "annotations": [
               {"id": 1, "image_id": 0, "category_id": 1, "iscrowd": 0,
                "bbox": [2, 2, 4, 4],
                "segmentation": {"size": [8, 8], "counts": counts}},
               {"id": 2, "image_id": 0, "category_id": 1, "iscrowd": 0,
                "bbox": [0, 0, 4, 4]}],
           "categories": [{"id": 1, "name": "x"}]}
    ann_file = tmp_path / "inst.json"
    ann_file.write_text(json.dumps(ann))
    ds = CocoDetection(str(img_dir), str(ann_file), img_size=8, max_boxes=2,
                       with_masks=True, mask_stride=1)
    s = ds[0]
    np.testing.assert_array_equal(s["masks"][0], full)
    assert s["masks"][1][:4, :4].all() and s["masks"][1][5:, 5:].sum() == 0


# ------------------------------------------------------------------ #
# model: head, protonet, loss
# ------------------------------------------------------------------ #

def _mask_setup(batch):
    params = init_swin_params(jax.random.PRNGKey(0), CFG)
    trainable, frozen = build_apla_swin(params)
    head = init_fcos_head(jax.random.PRNGKey(1), 32, 1, channels=16,
                          n_levels=2, n_protos=8)
    laterals = [_conv_init(jax.random.PRNGKey(5), 1, 32, 32),
                _conv_init(jax.random.PRNGKey(6), 1, 64, 32)]
    protonet = init_protonet(jax.random.PRNGKey(7), 32, n_protos=8,
                             channels=16)
    t = {"backbone": trainable, "head": head, "laterals": laterals,
         "protonet": protonet}
    return t, frozen


def test_head_emits_coefs_and_protos(tmp_path):
    img_dir, ann_file = make_coco_masks(tmp_path)
    ds = CocoDetection(img_dir, ann_file, img_size=56, max_boxes=4,
                       with_masks=True)
    batch = detection_collate([ds[0]])
    t, frozen = _mask_setup(batch)
    feats = swin_features(frozen, jnp.asarray(batch["image"]), CFG,
                          trainable=t["backbone"])
    outs = fcos_head_forward(feats, t["head"], t["laterals"])
    assert all(len(lvl) == 4 for lvl in outs)
    assert outs[0][3].shape == (1, 14, 14, 8)
    assert float(jnp.abs(outs[0][3]).max()) <= 1.0  # tanh
    protos = protonet_forward(_conv(feats[0], t["laterals"][0]),
                              t["protonet"])
    assert protos.shape == (1, 14, 14, 8)
    assert float(protos.min()) >= 0  # relu


def test_mask_loss_and_grads(tmp_path):
    img_dir, ann_file = make_coco_masks(tmp_path)
    ds = CocoDetection(img_dir, ann_file, img_size=56, max_boxes=4,
                       with_masks=True)
    batch = detection_collate([ds[i] for i in range(2)])
    t, frozen = _mask_setup(batch)

    def loss(t):
        feats = swin_features(frozen, jnp.asarray(batch["image"]), CFG,
                              trainable=t["backbone"])
        outs = fcos_head_forward(feats, t["head"], t["laterals"])
        protos = protonet_forward(_conv(feats[0], t["laterals"][0]),
                                  t["protonet"])
        losses = fcos_loss_batch(outs, [4, 8], jnp.asarray(batch["boxes"]),
                                 jnp.asarray(batch["labels"]),
                                 protos=protos,
                                 gt_masks=jnp.asarray(batch["masks"]),
                                 mask_stride=4)
        return losses["total"], losses

    (val, losses), g = jax.value_and_grad(loss, has_aux=True)(t)
    assert np.isfinite(float(val))
    assert float(losses["mask_loss"]) > 0
    # gradients reach the mask-specific params
    assert np.abs(np.asarray(g["head"]["coef"]["kernel"])).max() > 0
    assert np.abs(np.asarray(g["protonet"]["out"]["kernel"])).max() > 0


@pytest.mark.slow
def test_mask_train_step_decreases_loss(tmp_path):
    img_dir, ann_file = make_coco_masks(tmp_path)
    ds = CocoDetection(img_dir, ann_file, img_size=56, max_boxes=4,
                       with_masks=True)
    batch = {k: jnp.asarray(v) for k, v in
             detection_collate([ds[i] for i in range(2)]).items()}
    t, frozen = _mask_setup(batch)
    tx = optax.adam(3e-3)
    opt_state = tx.init(t)
    step = make_detection_train_step(CFG, tx, strides=(4, 8),
                                     with_mask=True)
    first = None
    for i in range(30):
        t, opt_state, m = step(t, opt_state, frozen, batch)
        if first is None:
            first = float(m["mask_loss"])
    assert float(m["mask_loss"]) < first
    assert float(m["total"]) < first + 10  # finite, trained


def test_mask_step_fsdp_mesh_matches_single_device(tmp_path):
    """One with_mask detection step on a 2-device DP mesh with the frozen
    Swin genuinely fsdp-sharded must reproduce the single-device update —
    mask-branch (protonet + coefficient head) gradients included (the
    reference trains masks under DDP, apla_mask_rcnn_swin_tiny_...coco.py:28).
    Companion of __graft_entry__.dryrun_multichip path 7m."""
    from jax.sharding import PartitionSpec as P

    from apla_tpu.parallel.mesh import (fsdp_sharding_tree, make_mesh,
                                        shard_batch, shard_params)

    img_dir, ann_file = make_coco_masks(tmp_path)
    ds = CocoDetection(img_dir, ann_file, img_size=56, max_boxes=4,
                       with_masks=True)
    batch_np = detection_collate([ds[i] for i in range(2)])
    t, frozen = _mask_setup(batch_np)
    tx = optax.adamw(1e-3)
    step = make_detection_train_step(CFG, tx, strides=(4, 8), with_mask=True)
    t1, _, m1 = step(t, tx.init(t), frozen,
                     {k: jnp.asarray(v) for k, v in batch_np.items()})

    # the step donates (trainable, opt_state) — re-init identically
    t, frozen = _mask_setup(batch_np)
    mesh = make_mesh(n_data=2, devices=jax.devices()[:2])
    # toy Swin leaves sit below the production fsdp min_size; lower it so
    # the placement actually shards (the thing under test)
    fr_sh = fsdp_sharding_tree(mesh, frozen, min_size=2 ** 10)
    assert any(s.spec != P() for s in jax.tree.leaves(fr_sh)), \
        "nothing sharded at this scale"
    t2, _, m2 = step(shard_params(t, mesh),
                     shard_params(tx.init(t), mesh),
                     jax.device_put(frozen, fr_sh),
                     shard_batch(batch_np, mesh))

    for k in ("total", "mask_loss", "cls_loss"):
        if k in m1:
            np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-5)
    assert float(m1["mask_loss"]) > 0
    for a, b in zip(jax.tree.leaves(t1), jax.tree.leaves(t2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


# ------------------------------------------------------------------ #
# decode + metric
# ------------------------------------------------------------------ #

def test_decode_with_masks_returns_cropped_masks():
    H = W = 8
    K, P = 1, 4
    cls = jnp.full((1, H, W, K), -8.0)
    cls = cls.at[0, 4, 4, 0].set(4.0)  # one confident location
    box = jnp.zeros((1, H, W, 4)).at[0, 4, 4].set(
        jnp.asarray([8.0, 8.0, 8.0, 8.0]))
    ctr = jnp.full((1, H, W, 1), 4.0)
    coef = jnp.zeros((1, H, W, P)).at[0, 4, 4, 0].set(1.0)
    protos = jnp.zeros((1, H, W, P)).at[..., 0].set(10.0)  # all-on proto
    outs = [(cls, box, ctr, coef)]
    boxes, scores, labels, masks = decode_detections(
        outs, strides=[4], protos=protos, mask_stride=4)
    assert len(boxes) == 1 and masks.shape == (1, H, W)
    # proto says "everything", crop restricts to the predicted box
    cy = (np.arange(H) + 0.5) * 4
    inside_rows = (cy >= boxes[0][1]) & (cy <= boxes[0][3])
    assert masks[0][inside_rows][:, inside_rows].all()
    assert not masks[0][~inside_rows].any()


def test_mask_iou_and_ap_metric():
    a = np.zeros((8, 8), bool)
    a[:4] = True
    b = np.zeros((8, 8), bool)
    b[2:6] = True
    assert abs(mask_iou(a, b) - (16 / 48)) < 1e-9

    metric = DetectionAP(n_classes=2, use_masks=True)
    gt = np.zeros((1, 8, 8), bool)
    gt[0, 2:6, 2:6] = True
    # perfect prediction for class 0
    metric.add_image(0, np.zeros((1, 4)), [0.9], [0],
                     np.zeros((1, 4)), [0], pred_masks=gt, gt_masks=gt)
    assert metric.mean_ap() == pytest.approx(1.0, abs=1e-6)

    bad = DetectionAP(n_classes=2, use_masks=True)
    wrong = ~gt
    bad.add_image(0, np.zeros((1, 4)), [0.9], [0],
                  np.zeros((1, 4)), [0], pred_masks=wrong, gt_masks=gt)
    assert bad.mean_ap() == pytest.approx(0.0, abs=1e-6)
