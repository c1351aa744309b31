"""Segmentation head tests (reference seg side-car parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from apla_tpu.apla.core import AplaConfig, count_params
from apla_tpu.models.seg import (
    init_segmenter, mean_iou, segmentation_loss, segmenter_forward)
from apla_tpu.models.vit import ViTConfig

CFG = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=4,
                compute_dtype=jnp.float32)


def test_segmenter_shapes_and_grads():
    trainable, frozen = init_segmenter(jax.random.PRNGKey(0), CFG,
                                       n_classes=5, channels=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    logits = segmenter_forward(trainable, frozen, x, CFG)
    assert logits.shape == (2, 32, 32, 5)

    labels = jnp.zeros((2, 32, 32), jnp.int32)

    def loss(trainable):
        lg = segmenter_forward(trainable, frozen, x, CFG)
        return segmentation_loss(lg, labels)

    g = jax.grad(loss)(trainable)
    # reference seg recipe: 'full' mode — whole attn out-proj trainable,
    # everything else frozen (apla_vit.py:27-33)
    gw = np.asarray(g["backbone"]["blocks"]["attn"]["proj"]["kernel"])
    assert np.isfinite(gw).all() and np.abs(gw).max() > 0


def test_segmentation_loss_ignore_index():
    logits = jnp.zeros((1, 4, 4, 3))
    labels = jnp.full((1, 4, 4), 255, jnp.int32)  # everything ignored
    loss = segmentation_loss(logits, labels)
    assert float(loss) == 0.0
    labels = labels.at[0, 0, 0].set(1)
    loss = segmentation_loss(logits, labels)
    assert float(loss) > 0


def test_mean_iou():
    pred = np.array([[0, 0], [1, 1]])
    labels = np.array([[0, 0], [1, 255]])
    assert mean_iou(pred, labels, n_classes=2) == 1.0
    assert mean_iou(1 - pred, labels, n_classes=2) == 0.0


def test_iou_counts_dataset_level():
    """Accumulated pixel counts give DATASET-level mIoU: two batches of
    different sizes must weight by pixels, not per-batch means."""
    from apla_tpu.models.seg import iou_counts, mean_iou_from_counts

    # batch A: 2x2, all class 0, all correct.  batch B: 1 pixel, class 0,
    # wrong.  Dataset IoU(class0) = 4/5; a mean of per-batch mIoUs would
    # report (1.0 + 0.0)/2 = 0.5.
    ia, ua = iou_counts(np.zeros((1, 2, 2)), np.zeros((1, 2, 2)),
                        n_classes=2)
    ib, ub = iou_counts(np.ones((1, 1, 1)), np.zeros((1, 1, 1)),
                        n_classes=2)
    got = mean_iou_from_counts(ia + ib, ua + ub)
    # class 0: inter 4, union 5; class 1: inter 0, union 1
    assert got == (4 / 5 + 0.0) / 2
    assert mean_iou_from_counts(np.zeros(3), np.zeros(3)) == 0.0


def test_slide_forward_single_window_equals_plain():
    """H=W=crop: slide inference is exactly the plain forward."""
    from apla_tpu.models.seg import segmenter_slide_forward

    trainable, frozen = init_segmenter(jax.random.PRNGKey(0), CFG,
                                       n_classes=5, channels=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    plain = segmenter_forward(trainable, frozen, x, CFG)
    slide = segmenter_slide_forward(trainable, frozen, x, CFG)
    np.testing.assert_allclose(np.asarray(slide), np.asarray(plain),
                               rtol=1e-6, atol=1e-6)


def test_slide_forward_tiled_and_overlapping():
    """Non-overlapping windows (stride=crop) reproduce per-crop forwards;
    overlapping default stride averages logits where windows meet."""
    from apla_tpu.models.seg import segmenter_slide_forward

    trainable, frozen = init_segmenter(jax.random.PRNGKey(0), CFG,
                                       n_classes=5, channels=16)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3))
    tiled = segmenter_slide_forward(trainable, frozen, x, CFG, stride=32)
    assert tiled.shape == (1, 64, 64, 5)
    for y in (0, 32):
        for xx in (0, 32):
            crop = segmenter_forward(trainable, frozen,
                                     x[:, y:y + 32, xx:xx + 32], CFG)
            np.testing.assert_allclose(
                np.asarray(tiled[:, y:y + 32, xx:xx + 32]),
                np.asarray(crop), rtol=1e-5, atol=1e-5)

    over = segmenter_slide_forward(trainable, frozen, x, CFG)  # stride 21
    assert over.shape == (1, 64, 64, 5)
    assert bool(jnp.all(jnp.isfinite(over)))
    # the flush-to-edge rule covers every pixel (no zero-count divisions)
    import pytest
    with pytest.raises(ValueError, match="smaller than crop"):
        segmenter_slide_forward(trainable, frozen, x[:, :16, :16], CFG)


def test_aux_heads_train_step():
    """Reference SETR auxiliary heads: one trunk pass feeds main + aux
    decoders at fractional depths; aux losses join at weight 0.4 and
    their params receive gradients."""
    import optax

    from apla_tpu.models.seg import (aux_indices, make_seg_train_step,
                                     segmenter_forward_train)

    assert aux_indices(24, 3) == [9, 14, 19]  # mmseg ViT-L out_indices

    trainable, frozen = init_segmenter(jax.random.PRNGKey(0), CFG,
                                       n_classes=5, channels=16,
                                       n_aux_heads=2, aux_channels=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    main, aux = segmenter_forward_train(trainable, frozen, x, CFG)
    assert main.shape == (2, 32, 32, 5)
    assert len(aux) == 2 and all(a.shape == (2, 32, 32, 5) for a in aux)

    tx = optax.adamw(1e-3)
    step = make_seg_train_step(CFG, tx)
    labels = jnp.zeros((2, 32, 32), jnp.int32)
    before = jax.tree.map(lambda v: np.asarray(v).copy(),
                          trainable["aux_heads"])
    t2, _, m = step(trainable, tx.init(trainable), frozen,
                    {"image": x, "label": labels})
    assert np.isfinite(float(m["loss"]))
    moved = [not np.allclose(a, b)
             for a, b in zip(jax.tree.leaves(before),
                             jax.tree.leaves(t2["aux_heads"]))]
    assert all(moved), "aux head params did not train"


def test_head_lr_mult():
    """--head_lr_mult: the decoder head moves ~mult times further per
    AdamW step than the backbone-lr baseline."""
    import optax

    from apla_tpu.models.seg import make_seg_train_step
    from apla_tpu.segdet import train_segmentation  # noqa: F401 (import ok)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    labels = jnp.ones((2, 32, 32), jnp.int32)
    deltas = {}
    for mult in (1.0, 10.0):
        trainable, frozen = init_segmenter(jax.random.PRNGKey(0), CFG,
                                           n_classes=5, channels=16)
        labels_tree = {k: jax.tree.map(
                           lambda _: "bb" if k == "backbone" else "head", v)
                       for k, v in trainable.items()}
        tx = optax.multi_transform(
            {"bb": optax.adamw(1e-3), "head": optax.adamw(1e-3 * mult)},
            labels_tree)
        step = make_seg_train_step(CFG, tx)
        before = np.asarray(trainable["head"]["cls"]["kernel"]).copy()
        t2, _, _ = step(trainable, tx.init(trainable), frozen,
                        {"image": x, "label": labels})
        deltas[mult] = float(np.abs(
            np.asarray(t2["head"]["cls"]["kernel"]) - before).mean())
    assert deltas[10.0] > 5 * deltas[1.0]


def test_apla_rank_mode_seg():
    trainable, frozen = init_segmenter(
        jax.random.PRNGKey(0), CFG, n_classes=5, channels=32,
        apla_cfg=AplaConfig(partial_size=8))
    assert trainable["backbone"]["blocks"]["proj_wt"].shape == (2, 64, 8)
    x = jnp.ones((1, 32, 32, 3))
    logits = segmenter_forward(trainable, frozen, x, CFG)
    assert logits.shape == (1, 32, 32, 5)
