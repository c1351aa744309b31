"""ADE20K-style seg dataset + a full seg train-step smoke (loss decreases)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
from PIL import Image

from apla_tpu.data.segmentation_data import (
    ADE20KSegmentation, segmentation_collate)
from apla_tpu.models.seg import (
    init_segmenter, mean_iou, segmentation_loss, segmenter_forward)
from apla_tpu.models.vit import ViTConfig


def make_ade(tmp_path, n=3):
    for split in ("training", "validation"):
        os.makedirs(tmp_path / "images" / split)
        os.makedirs(tmp_path / "annotations" / split)
    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.integers(0, 256, (40, 50, 3), dtype=np.uint8)
        ann = np.zeros((40, 50), np.uint8)
        ann[10:30, 10:40] = 2  # class 2 -> label 1 after reduce_zero
        Image.fromarray(img).save(
            tmp_path / "images" / "training" / f"a{i}.jpg")
        Image.fromarray(ann).save(
            tmp_path / "annotations" / "training" / f"a{i}.png")
    return str(tmp_path)


def test_ade_layout_and_labels(tmp_path):
    root = make_ade(tmp_path)
    ds = ADE20KSegmentation(root, "training", img_size=32)
    assert len(ds) == 3
    s = ds[0]
    assert s["image"].shape == (32, 32, 3)
    assert s["label"].shape == (32, 32)
    labels = np.unique(s["label"])
    assert 255 in labels          # zero pixels became ignore
    assert 1 in labels            # class 2 -> 1
    batch = segmentation_collate([ds[i] for i in range(2)])
    assert batch["label"].shape == (2, 32, 32)


def test_seg_training_smoke(tmp_path):
    root = make_ade(tmp_path)
    ds = ADE20KSegmentation(root, "training", img_size=32)
    batch = segmentation_collate([ds[i] for i in range(3)])
    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2,
                    num_heads=4, compute_dtype=jnp.float32)
    trainable, frozen = init_segmenter(jax.random.PRNGKey(0), cfg,
                                       n_classes=5, channels=16)
    tx = optax.adamw(1e-3)
    opt_state = tx.init(trainable)
    images = jnp.asarray(batch["image"])
    labels = jnp.asarray(batch["label"])

    @jax.jit
    def step(trainable, opt_state):
        def loss_fn(t):
            logits = segmenter_forward(t, frozen, images, cfg)
            return segmentation_loss(logits, labels)
        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, loss

    losses = []
    for _ in range(8):
        trainable, opt_state, loss = step(trainable, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    logits = segmenter_forward(trainable, frozen, images, cfg)
    pred = np.asarray(jnp.argmax(logits, -1))
    iou = mean_iou(pred, np.asarray(labels), n_classes=5)
    assert 0.0 <= iou <= 1.0
