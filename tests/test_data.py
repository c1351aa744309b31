"""Data layer tests: transforms, loader determinism, mixup collate."""

import numpy as np
import pytest
from PIL import Image

from apla_tpu.data.loader import DataLoader, default_collate
from apla_tpu.data.mixup import AdvancedAugCollate
from apla_tpu.data.transforms import (
    build_transform, CenterCrop, Compose, Normalize, RandomResizedCrop,
    Resize, ToArray)
from apla_tpu.data.datasets import BaseSet, Synthetic, get_dataset_class


def rgb(h=40, w=40):
    arr = (np.arange(h * w * 3).reshape(h, w, 3) % 255).astype(np.uint8)
    return Image.fromarray(arr)


def test_transform_factory_reference_order():
    td = {
        "Resize": {"apply": True, "height": 32, "width": 32},
        "CenterCrop": {"apply": True, "height": 28, "width": 28},
        "HorizontalFlip": {"apply": True, "p": 0.5},
        "Normalize": True,
    }
    t = build_transform(td, mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25))
    names = [type(x).__name__ for x in t.transforms]
    assert names[:3] == ["Resize", "CenterCrop", "RandomHorizontalFlip"]
    # tail is either the fused native op or ToArray+Normalize
    assert names[3:] in (["NativeToArrayNormalize"], ["ToArray", "Normalize"])
    out = t(rgb(), np.random.default_rng(0))
    assert out.shape == (28, 28, 3)
    assert out.dtype == np.float32


def test_transforms_deterministic_given_rng():
    td = {"RandomResizedCrop": {"apply": True, "size": 16,
                                "scale": [0.5, 1.0]},
          "ColorJitter": {"apply": True, "brightness": 0.4, "contrast": 0.4,
                          "saturation": 0.2, "hue": 0.1, "p": 0.8},
          "Normalize": True}
    t = build_transform(td, (0.5,) * 3, (0.25,) * 3)
    a = t(rgb(), np.random.default_rng(42))
    b = t(rgb(), np.random.default_rng(42))
    c = t(rgb(), np.random.default_rng(43))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_resize_disentanglement():
    td = {"Resize": {"apply": True, "height": 32, "width": 32},
          "Normalize": True}
    t = build_transform(td, (0.5,) * 3, (0.25,) * 3)
    stripped, resizing = BaseSet.disentangle_resizes_from_transforms(t)
    assert isinstance(resizing, Resize)
    assert not any(isinstance(x, Resize) for x in stripped.transforms)


def test_rand_augment_runs():
    td = {"RandAugment": {"apply": True, "num_ops": 2, "magnitude": 9},
          "Normalize": True}
    t = build_transform(td, (0.5,) * 3, (0.25,) * 3)
    out = t(rgb(), np.random.default_rng(0))
    assert out.shape == (40, 40, 3)


def test_augmix_and_trivial():
    td = {"AugMix": {"apply": True, "severity": 3},
          "TrivialAugment": {"apply": True}, "Normalize": True}
    t = build_transform(td, (0.5,) * 3, (0.25,) * 3)
    out = t(rgb(), np.random.default_rng(0))
    assert np.isfinite(out).all()


def test_loader_determinism_and_epochs():
    ds = Synthetic({"data_location": "/tmp", "synthetic_size": 32,
                    "train_transforms": {"Normalize": True},
                    "val_transforms": {"Normalize": True},
                    "test_transforms": {"Normalize": True}}, mode="train")
    dl = DataLoader(ds, batch_size=8, shuffle=True, drop_last=True,
                    num_workers=2, seed=7)
    dl.set_epoch(0)
    b0 = [b["label"].copy() for b in dl]
    dl2 = DataLoader(ds, batch_size=8, shuffle=True, drop_last=True,
                     num_workers=4, seed=7)
    dl2.set_epoch(0)
    b1 = [b["label"].copy() for b in dl2]
    for x, y in zip(b0, b1):
        np.testing.assert_array_equal(x, y)  # worker count irrelevant
    dl.set_epoch(1)
    b2 = [b["label"].copy() for b in dl]
    assert any(not np.array_equal(x, y) for x, y in zip(b0, b2))


def test_mixup_collate_soft_labels():
    samples = [{"image": np.ones((8, 8, 3), np.float32) * i, "label": i % 3}
               for i in range(8)]
    collate = AdvancedAugCollate({"num_classes": 3, "prob": 1.0,
                                  "label_smoothing": 0.1, "seed": 0})
    batch = collate(samples)
    assert batch["label"].shape == (8, 3)
    np.testing.assert_allclose(batch["label"].sum(axis=1), 1.0, rtol=1e-5)


def test_dataset_registry_covers_reference_zoo():
    """All 43 reference dataset wrappers exist with the metadata contract
    (SURVEY.md §2 component 13)."""
    names = [
        "VTAB_cifar100", "VTAB_caltech101", "VTAB_dtd", "VTAB_flowers",
        "VTAB_pets", "VTAB_svhn", "VTAB_sun397", "VTAB_pcam", "VTAB_eurosat",
        "VTAB_resisc45", "VTAB_retinopathy", "VTAB_clevr_count",
        "VTAB_clevr_dist", "VTAB_dmlab", "VTAB_kitti_dist",
        "VTAB_dsprites_loc", "VTAB_dsprites_ori", "VTAB_smallnorb_azimuth",
        "VTAB_smallnorb_elevation", "NABirds", "DDSM", "ISIC2019",
        "APTOS2019", "Flowers102", "SUN397", "CIFAR_10", "CIFAR_100",
        "Colorectal", "AID", "RSSCN7", "Aircraft", "StanfordCars", "DTD",
        "StanfordDogs", "OxfordIII_Pet", "CUB_200_2011", "Birdsnap",
        "Caltech_101", "Caltech_256", "MIT_Indoor", "Pneumonia", "ImageNet",
    ]
    assert len(names) == 42  # + Synthetic = 43 wrappers in-repo
    for name in names:
        cls = get_dataset_class(name)
        assert isinstance(cls.n_classes, int) and cls.n_classes > 0, name
        assert cls.task == "classification"
        assert cls.target_metric in (
            "accuracy", "mean_per_class_accuracy", "quadratic_kappa",
            "roc_auc", "recall", "mAP"), name
        assert len(cls.mean) >= 1 and len(cls.std) >= 1


def test_reference_metric_choices():
    """Spot-check target metrics against the reference classes."""
    assert get_dataset_class("ISIC2019").target_metric == "recall"
    assert get_dataset_class("APTOS2019").target_metric == "quadratic_kappa"
    assert get_dataset_class("Pneumonia").target_metric == "roc_auc"
    assert get_dataset_class("Flowers102").target_metric == \
        "mean_per_class_accuracy"
    assert get_dataset_class("CIFAR_100").n_classes == 100
    assert get_dataset_class("NABirds").n_classes == 555


def test_loader_surfaces_worker_exception():
    """A sample-load failure must raise in the consumer, not deadlock the
    producer queue."""
    import pytest as pt

    from apla_tpu.data.loader import DataLoader

    class Broken:
        def __len__(self):
            return 8

        def __getitem__(self, idx, rng=None):
            if idx == 3:
                raise OSError("corrupt image")
            import numpy as np
            return {"image": np.zeros((4, 4, 3), np.float32), "label": 0}

    loader = DataLoader(Broken(), batch_size=4, num_workers=2)
    with pt.raises(RuntimeError, match="worker failed"):
        for _ in loader:
            pass
