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
    CIFAR_10, Caltech_101, DTD, Flowers102, ImageNet, OxfordIII_Pet,
    Pneumonia, StanfordCars, VTAB_dtd)
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


def test_flowers102_labels_are_one_based(tmp_path):
    """Reference datasets.py:1126-1135 subtracts 1 from the CSV labels."""
    root = tmp_path / "Flowers102"
    os.makedirs(root / "images")
    rows = ["filename,label"]
    for i in range(4):
        _png(str(root / "images" / f"f{i}.jpg"), i * 50)
        rows.append(f"f{i}.jpg,{i + 1}")  # labels start at 1 on disk
    for split in ("train", "val", "test"):
        (root / f"{split}.csv").write_text("\n".join(rows) + "\n")
    ds = Flowers102({"data_location": str(tmp_path), **TRANSFORMS},
                    mode="train")
    assert [r["label"] for r in ds.data] == [0, 1, 2, 3]


def test_stanford_cars_devkit_layout(tmp_path):
    """Reference datasets.py:1602-1656: torchvision devkit .mat layout with
    val_imgfiles.txt carving val out of train."""
    from scipy.io import savemat

    root = tmp_path / "StanfordCars"
    base = root / "stanford_cars"
    os.makedirs(base / "devkit")

    def save_annos(path, img_dir, n, off=0):
        dt = np.dtype([("fname", object), ("bbox_x1", object),
                       ("class", object)])
        a = np.empty((n,), dtype=dt)
        for i in range(n):
            fname = f"{i + off:05d}.jpg"
            a[i] = (fname, 1, (i % 3) + 1)  # 1-based classes on disk
            _png(str(base / img_dir / fname), i * 20)
        savemat(str(path), {"annotations": a})

    save_annos(base / "devkit" / "cars_train_annos.mat", "cars_train", 6)
    save_annos(base / "cars_test_annos_withlabels.mat", "cars_test", 4,
               off=100)
    (root / "val_imgfiles.txt").write_text(
        "stanford_cars/cars_train/00000.jpg\n"
        "stanford_cars/cars_train/00001.jpg\n")

    params = {"data_location": str(tmp_path), **TRANSFORMS}
    train = StanfordCars(params, mode="train")
    val = StanfordCars(params, mode="val")
    test = StanfordCars(params, mode="test")
    assert len(train) == 4 and len(val) == 2 and len(test) == 4
    assert {r["label"] for r in train.data} <= {0, 1, 2}  # -1 applied
    assert train[0]["image"].shape == (16, 16, 3)
    # train_val mode folds val back into train (reference :1631-1636)
    tv = StanfordCars({**params, "train_val": True}, mode="train")
    assert len(tv) == 6


def test_dtd_torchvision_layout(tmp_path):
    """Reference datasets.py:1659-1705: dtd/dtd/labels/{split}1.txt with
    class/filename lines; labels from the sorted class set."""
    root = tmp_path / "DTD"
    data = root / "dtd" / "dtd"
    os.makedirs(data / "labels")
    entries = {"train": ["banded/banded_0001.jpg", "dotted/dotted_0001.jpg"],
               "val": ["banded/banded_0002.jpg"],
               "test": ["dotted/dotted_0002.jpg", "banded/banded_0003.jpg"]}
    for split, lines in entries.items():
        (data / "labels" / f"{split}1.txt").write_text("\n".join(lines) + "\n")
        for ln in lines:
            _png(str(data / "images" / ln), 77)
    params = {"data_location": str(tmp_path), **TRANSFORMS}
    train = DTD(params, mode="train")
    test = DTD(params, mode="test")
    assert len(train) == 2 and len(test) == 2
    assert [r["label"] for r in train.data] == [0, 1]  # banded=0, dotted=1
    assert train[0]["image"].shape == (16, 16, 3)


def test_oxford_pet_torchvision_layout(tmp_path):
    """Reference datasets.py:1862-1921: oxford-iiit-pet annotations files
    (1-based labels) + val_imgfiles.txt."""
    root = tmp_path / "OxfordIII_Pet"
    base = root / "oxford-iiit-pet"
    os.makedirs(base / "annotations")
    trainval = [("Abyssinian_1", 1), ("Abyssinian_2", 1), ("bengal_1", 2)]
    test = [("Abyssinian_3", 1), ("bengal_2", 2)]
    for split, items in (("trainval", trainval), ("test", test)):
        (base / "annotations" / f"{split}.txt").write_text(
            "".join(f"{n} {l} {l} 1\n" for n, l in items))
        for n, _ in items:
            _png(str(base / "images" / f"{n}.jpg"), 99)
    (root / "val_imgfiles.txt").write_text(
        "oxford-iiit-pet/images/Abyssinian_2.jpg\n")
    params = {"data_location": str(tmp_path), **TRANSFORMS}
    train = OxfordIII_Pet(params, mode="train")
    val = OxfordIII_Pet(params, mode="val")
    tst = OxfordIII_Pet(params, mode="test")
    assert len(train) == 2 and len(val) == 1 and len(tst) == 2
    assert {r["label"] for r in train.data} == {0, 1}  # -1 applied
    assert val.data[0]["img_path"].endswith("Abyssinian_2.jpg")


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


def test_isic2019_seeded_split_counts(tmp_path):
    """ISIC2019 frame() returns a dict of columns — the split must use the
    COLUMN length (20 samples), not len(dict)==2 (which silently collapsed
    the dataset to 2 rows)."""
    import numpy as np

    from apla_tpu.data.datasets import ISIC2019

    root = tmp_path / "isic"
    (root / "train").mkdir(parents=True)
    names = [f"ISIC_{i:07d}" for i in range(20)]
    header = "image,MEL,NV,BCC,AK,BKL,DF,VASC,SCC"
    rows = [header]
    rng = np.random.default_rng(0)
    for n in names:
        onehot = np.zeros(8, int)
        onehot[rng.integers(0, 8)] = 1
        rows.append(n + "," + ",".join(map(str, onehot)))
    (root / "ISIC_2019_Training_GroundTruth.csv").write_text(
        "\n".join(rows))

    params = {"data_location": str(tmp_path), "train_transforms": {},
              "val_transforms": {}, "test_transforms": {}}

    class _Set(ISIC2019):
        name = "isic"
        def __init__(self, mode):
            self.mode = mode
            self.root_dir = str(root)
            self.data = self.get_data_as_list()

    train, val, test = _Set("train"), _Set("val"), _Set("test")
    assert len(train.data) == 16          # 20 - int(0.2*20)
    assert len(val.data) + len(test.data) == 4
    all_paths = {d["img_path"] for s in (train, val, test) for d in s.data}
    assert len(all_paths) == 20           # disjoint full coverage
