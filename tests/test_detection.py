"""Detection head tests (FCOS-style head on the Swin pyramid)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from apla_tpu.models.detection import (
    decode_detections, fcos_head_forward, fcos_loss, focal_loss,
    init_fcos_head, iou_loss, nms)
from apla_tpu.models.swin import (
    SwinConfig, build_apla_swin, init_swin_params, swin_features)

CFG = SwinConfig(img_size=56, patch_size=4, embed_dim=32, depths=(2, 2),
                 num_heads=(2, 4), window_size=7, compute_dtype=jnp.float32)


def _head_and_feats():
    params = init_swin_params(jax.random.PRNGKey(0), CFG)
    x = jnp.ones((1, 56, 56, 3))
    feats = swin_features(params, x, CFG)
    head = init_fcos_head(jax.random.PRNGKey(1), in_channels=32,
                          n_classes=3, channels=16, n_levels=len(feats))
    laterals = [
        {"kernel": jnp.eye(f.shape[-1], 16).reshape(1, 1, f.shape[-1], 16),
         "bias": jnp.zeros((16,))} for f in feats]
    # use a conv init for channel-matching laterals
    from apla_tpu.models.detection import _conv_init
    laterals = [_conv_init(jax.random.PRNGKey(10 + i), 1, f.shape[-1], 32)
                for i, f in enumerate(feats)]
    head = init_fcos_head(jax.random.PRNGKey(1), in_channels=32, n_classes=3,
                          channels=16, n_levels=len(feats))
    return params, head, laterals, feats


def test_head_shapes():
    _, head, laterals, feats = _head_and_feats()
    outs = fcos_head_forward(feats, head, laterals)
    assert len(outs) == len(feats)
    for (cls, box, ctr), f in zip(outs, feats):
        assert cls.shape[:3] == f.shape[:3] and cls.shape[-1] == 3
        assert box.shape[-1] == 4 and ctr.shape[-1] == 1
        assert float(jnp.min(box)) >= 0  # relu'd distances


def test_losses_finite_and_positive():
    _, head, laterals, feats = _head_and_feats()
    outs = fcos_head_forward(feats, head, laterals)
    gt_boxes = jnp.asarray([[4.0, 4.0, 40.0, 40.0], [0, 0, 0, 0]])
    gt_labels = jnp.asarray([1, -1])
    losses = fcos_loss(outs, strides=[4, 8], gt_boxes=gt_boxes,
                       gt_labels=gt_labels, n_classes=3, img_hw=(56, 56))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["total"]) > 0


def test_end_to_end_grads_through_apla_swin():
    params = init_swin_params(jax.random.PRNGKey(0), CFG)
    trainable, frozen = build_apla_swin(params)
    head = init_fcos_head(jax.random.PRNGKey(1), 32, 3, channels=16,
                          n_levels=2)
    from apla_tpu.models.detection import _conv_init
    laterals = [_conv_init(jax.random.PRNGKey(5), 1, 32, 32),
                _conv_init(jax.random.PRNGKey(6), 1, 64, 32)]
    x = jnp.ones((1, 56, 56, 3))
    gt_boxes = jnp.asarray([[4.0, 4.0, 40.0, 40.0]])
    gt_labels = jnp.asarray([0])

    def loss(args):
        trainable, head, laterals = args
        feats = swin_features(frozen, x, CFG, trainable=trainable)
        outs = fcos_head_forward(feats, head, laterals)
        return fcos_loss(outs, [4, 8], gt_boxes, gt_labels, 3,
                         (56, 56))["total"]

    g = jax.grad(loss)((trainable, head, laterals))
    g_bb = np.asarray(g[0]["stages"][0]["blocks"][0]["proj"]["kernel"])
    g_head = np.asarray(g[1]["cls"]["kernel"])
    assert np.abs(g_bb).max() > 0 and np.abs(g_head).max() > 0


def test_focal_loss_behaviour():
    logits = jnp.asarray([[10.0, -10.0]])
    targets = jnp.asarray([[1.0, 0.0]])
    good = float(focal_loss(logits, targets).sum())
    bad = float(focal_loss(-logits, targets).sum())
    assert good < 1e-3 < bad


def test_iou_loss_zero_at_match():
    t = jnp.asarray([[2.0, 3.0, 4.0, 5.0]])
    assert float(iou_loss(t, t)[0]) < 1e-5


def test_nms():
    boxes = np.asarray([[0, 0, 10, 10], [1, 1, 10, 10], [20, 20, 30, 30]],
                       float)
    scores = np.asarray([0.9, 0.8, 0.7])
    keep = nms(boxes, scores, iou_thresh=0.5)
    assert list(keep) == [0, 2]


def test_decode_returns_arrays():
    _, head, laterals, feats = _head_and_feats()
    outs = fcos_head_forward(feats, head, laterals)
    boxes, scores, labels = decode_detections(outs, [4, 8],
                                              score_thresh=0.0, top_k=5)
    assert boxes.shape[1] == 4 if len(boxes) else True
    assert len(scores) == len(labels) == len(boxes)


def test_detection_ap_metric():
    from apla_tpu.models.detection import DetectionAP
    m = DetectionAP(n_classes=2, iou_thresh=0.5)
    gt = np.asarray([[0, 0, 10, 10], [20, 20, 30, 30]], float)
    # perfect predictions -> mAP 1
    m.add_image(0, gt, [0.9, 0.8], [0, 1], gt, [0, 1])
    assert m.mean_ap() == pytest.approx(1.0, abs=0.02)
    # all-miss predictions -> 0
    m2 = DetectionAP(n_classes=2)
    m2.add_image(0, np.asarray([[50, 50, 60, 60]], float), [0.9], [0],
                 gt, [0, 1])
    assert m2.mean_ap() == pytest.approx(0.0, abs=1e-6)


def test_make_detection_train_step_decreases_loss():
    from apla_tpu.models.detection import (_conv_init,
                                           make_detection_train_step)
    import optax

    params = init_swin_params(jax.random.PRNGKey(0), CFG)
    bb_t, frozen = build_apla_swin(params)
    head = init_fcos_head(jax.random.PRNGKey(1), 32, 3, channels=16,
                          n_levels=2)
    laterals = [_conv_init(jax.random.PRNGKey(5), 1, 32, 32),
                _conv_init(jax.random.PRNGKey(6), 1, 64, 32)]
    trainable = {"backbone": bb_t, "head": head, "laterals": laterals}
    tx = optax.adamw(1e-3)
    opt_state = tx.init(trainable)
    batch = {
        "image": jnp.ones((2, 56, 56, 3)),
        "boxes": jnp.asarray([[[4.0, 4.0, 40.0, 40.0]],
                              [[8.0, 8.0, 30.0, 30.0]]]),
        "labels": jnp.asarray([[0], [1]]),
    }
    step = make_detection_train_step(CFG, tx, strides=(4, 8))
    losses = []
    for _ in range(6):
        trainable, opt_state, m = step(trainable, opt_state, frozen, batch)
        losses.append(float(m["total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
