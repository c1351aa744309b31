"""End-to-end side-car training loops (apla_tpu/segdet.py): tiny ADE/COCO
fixtures through the full train/eval/checkpoint path."""

import json
import os

import jax.numpy as jnp
import numpy as np
from PIL import Image

from apla_tpu.models.vit import ViTConfig


def make_ade(tmp_path, n=4):
    rng = np.random.default_rng(0)
    for split in ("training", "validation"):
        os.makedirs(tmp_path / "images" / split)
        os.makedirs(tmp_path / "annotations" / split)
        for i in range(n):
            img = rng.integers(0, 256, (40, 50, 3), dtype=np.uint8)
            ann = np.zeros((40, 50), np.uint8)
            ann[10:30, 10:40] = 2
            Image.fromarray(img).save(
                tmp_path / "images" / split / f"a{i}.jpg")
            Image.fromarray(ann).save(
                tmp_path / "annotations" / split / f"a{i}.png")
    return str(tmp_path)


def make_coco(tmp_path, n_images=4):
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
           "categories": [{"id": 7, "name": "thing"}]}
    ann_file = tmp_path / "instances.json"
    ann_file.write_text(json.dumps(ann))
    return str(img_dir), str(ann_file)


def test_segmentation_loop(tmp_path):
    from apla_tpu.segdet import train_segmentation
    root = make_ade(tmp_path)
    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2,
                    num_heads=4, compute_dtype=jnp.float32)
    out = train_segmentation(
        root, epochs=2, img_size=32, batch_size=2, lr=1e-3,
        save_dir=str(tmp_path / "ck"), num_workers=2, log_every=1,
        vit_cfg=cfg)
    assert out["iters"] == 4  # 4 imgs / b2 * 2 epochs
    assert 0.0 <= out["best_miou"] <= 1.0
    assert os.path.exists(tmp_path / "ck" / "seg_best.msgpack")


def test_detection_loop(tmp_path):
    from apla_tpu.segdet import train_detection
    img_dir, ann = make_coco(tmp_path)
    out = train_detection(
        img_dir, ann, epochs=2, img_size=56, batch_size=2, lr=1e-3,
        embed_dim=32, depths=(2, 2), num_heads=(2, 4),
        save_dir=str(tmp_path / "ck"), num_workers=2, log_every=1)
    assert out["iters"] == 4
    assert 0.0 <= out["best_map50"] <= 1.0
    assert os.path.exists(tmp_path / "ck" / "det_best.msgpack")


def test_detection_loop_with_hf_swin_ckpt(tmp_path):
    """--swin_ckpt: a local HF SwinModel state_dict initialises the
    detection backbone end-to-end."""
    import pytest
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from transformers import SwinConfig as HFSwinConfig, SwinModel

    from apla_tpu.segdet import train_detection

    hf = SwinModel(HFSwinConfig(image_size=56, patch_size=4, embed_dim=32,
                                depths=[2, 2], num_heads=[2, 4],
                                window_size=7),
                   add_pooling_layer=False)
    ckpt = tmp_path / "swin_hf.pth"
    torch.save(hf.state_dict(), ckpt)

    img_dir, ann = make_coco(tmp_path)
    out = train_detection(
        img_dir, ann, epochs=1, img_size=56, batch_size=2, lr=1e-3,
        embed_dim=32, depths=(2, 2), num_heads=(2, 4),
        save_dir=str(tmp_path / "ck"), num_workers=2, log_every=1,
        swin_ckpt=str(ckpt))
    assert out["iters"] == 2
