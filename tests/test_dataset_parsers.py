"""File-based dataset parser tests: materialise miniature on-disk datasets
in the reference's directory layouts and load them through the real classes
+ DataLoader."""

import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from apla_tpu.data.datasets import (
    CIFAR_10, Caltech_101, ImageNet, Pneumonia, VTAB_dtd)
from apla_tpu.data.loader import DataLoader

TRANSFORMS = {
    "train_transforms": {"Resize": {"apply": True, "height": 16,
                                    "width": 16}, "Normalize": True},
    "val_transforms": {"Resize": {"apply": True, "height": 16, "width": 16},
                       "Normalize": True},
    "test_transforms": {"Resize": {"apply": True, "height": 16, "width": 16},
                        "Normalize": True},
}


def _png(path, value):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.full((20, 20, 3), value, np.uint8)).save(path)


def test_vtab_layout(tmp_path):
    root = tmp_path / "VTAB_dtd"
    for split in ("train", "val", "test"):
        for i in range(4):
            _png(str(root / split / f"img_{i}-label_{i % 2}.png"), i * 30)
    ds = VTAB_dtd({"data_location": str(tmp_path), **TRANSFORMS},
                  mode="train")
    assert len(ds) == 4
    sample = ds[0]
    assert sample["image"].shape == (16, 16, 3)
    assert sample["label"] in (0, 1)
    batch = next(iter(DataLoader(ds, batch_size=4)))
    assert batch["image"].shape == (4, 16, 16, 3)


def test_cifar_pickle_layout(tmp_path):
    root = tmp_path / "CIFAR_10" / "cifar-10-batches-py"
    os.makedirs(root)
    rng = np.random.default_rng(0)
    for name in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
        data = {b"data": rng.integers(0, 256, (20, 3072), dtype=np.uint8),
                b"labels": list(rng.integers(0, 10, 20))}
        with open(root / name, "wb") as f:
            pickle.dump(data, f)
    params = {"data_location": str(tmp_path), **TRANSFORMS}
    train = CIFAR_10(params, mode="train")
    val = CIFAR_10(params, mode="val")
    test = CIFAR_10(params, mode="test")
    assert len(train) + len(val) == 100  # 5 x 20, split 90/10
    assert len(test) == 20
    assert train[0]["image"].shape == (16, 16, 3)
    # split persisted + disjoint
    assert (tmp_path / "CIFAR_10" / "val_ids.json").exists()


def test_caltech_folder_layout(tmp_path):
    root = tmp_path / "Caltech_101" / "101_ObjectCategories"
    for cls in ("ant", "bee", "BACKGROUND_Google"):
        for i in range(6):
            _png(str(root / cls / f"img_{i}.jpg"), i * 40)
    params = {"data_location": str(tmp_path), **TRANSFORMS}
    train = Caltech_101(params, mode="train")
    test = Caltech_101(params, mode="test")
    # BACKGROUND_Google excluded (reference behaviour)
    labels = {r["label"] for r in train.data + test.data}
    assert labels <= {0, 1}
    assert len(train) + len(test) > 0


def test_imagenet_layout(tmp_path):
    root = tmp_path / "ImageNet"
    for split in ("train", "val"):
        for cls in ("n01440764", "n01443537"):
            for i in range(2):
                _png(str(root / split / cls / f"{cls}_{i}.JPEG"), i * 50)
    params = {"data_location": str(tmp_path), **TRANSFORMS}
    ds = ImageNet(params, mode="train")
    assert len(ds) == 4
    assert {r["label"] for r in ds.data} == {0, 1}


def test_simple_csv_layout(tmp_path):
    root = tmp_path / "Pneumonia"
    os.makedirs(root / "images")
    rows = ["filename,label"]
    for i in range(4):
        _png(str(root / "images" / f"x{i}.png"), i * 60)
        rows.append(f"x{i}.png,{i % 2}")
    for split in ("train", "val", "test"):
        (root / f"{split}.csv").write_text("\n".join(rows) + "\n")
    ds = Pneumonia({"data_location": str(tmp_path), **TRANSFORMS},
                   mode="val")
    assert len(ds) == 4
    assert ds[1]["label"] == 1
