"""COCO-format dataset + batched FCOS loss tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from apla_tpu.data.detection_data import CocoDetection, detection_collate
from apla_tpu.models.detection import fcos_loss_batch, fcos_head_forward, \
    init_fcos_head, _conv_init
from apla_tpu.models.swin import SwinConfig, init_swin_params, swin_features


def make_coco(tmp_path, n_images=3):
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    images, annotations = [], []
    for i in range(n_images):
        name = f"im{i}.jpg"
        Image.fromarray(np.full((60, 80, 3), 20 * i, np.uint8)).save(
            img_dir / name)
        images.append({"id": i, "file_name": name, "width": 80,
                       "height": 60})
        annotations.append({"id": 10 + i, "image_id": i, "category_id": 7,
                            "bbox": [10, 10, 30, 20], "iscrowd": 0})
    ann = {"images": images, "annotations": annotations,
           "categories": [{"id": 7, "name": "thing"},
                          {"id": 9, "name": "other"}]}
    ann_file = tmp_path / "instances.json"
    ann_file.write_text(json.dumps(ann))
    return str(img_dir), str(ann_file)


def test_coco_dataset_and_collate(tmp_path):
    img_dir, ann_file = make_coco(tmp_path)
    ds = CocoDetection(img_dir, ann_file, img_size=56, max_boxes=8)
    assert len(ds) == 3
    assert ds.n_classes == 2
    s = ds[0]
    assert s["image"].shape == (56, 56, 3)
    assert s["labels"][0] == 0 and (s["labels"][1:] == -1).all()
    # boxes rescaled: x1 = 10 * 56/80 = 7
    np.testing.assert_allclose(s["boxes"][0][0], 7.0, atol=0.5)
    batch = detection_collate([ds[i] for i in range(3)])
    assert batch["image"].shape == (3, 56, 56, 3)
    assert batch["boxes"].shape == (3, 8, 4)


def test_batched_fcos_loss_and_grads(tmp_path):
    img_dir, ann_file = make_coco(tmp_path)
    ds = CocoDetection(img_dir, ann_file, img_size=56, max_boxes=8)
    batch = detection_collate([ds[i] for i in range(2)])

    cfg = SwinConfig(img_size=56, patch_size=4, embed_dim=32, depths=(2, 2),
                     num_heads=(2, 4), window_size=7,
                     compute_dtype=jnp.float32)
    params = init_swin_params(jax.random.PRNGKey(0), cfg)
    head = init_fcos_head(jax.random.PRNGKey(1), 32, ds.n_classes,
                          channels=16, n_levels=2)
    laterals = [_conv_init(jax.random.PRNGKey(5), 1, 32, 32),
                _conv_init(jax.random.PRNGKey(6), 1, 64, 32)]

    def loss(args):
        params, head, laterals = args
        feats = swin_features(params, jnp.asarray(batch["image"]), cfg)
        outs = fcos_head_forward(feats, head, laterals)
        return fcos_loss_batch(outs, [4, 8], jnp.asarray(batch["boxes"]),
                               jnp.asarray(batch["labels"]))["total"]

    val, g = jax.value_and_grad(loss)((params, head, laterals))
    assert np.isfinite(float(val)) and float(val) > 0
    assert np.abs(np.asarray(g[1]["cls"]["kernel"])).max() > 0
