"""Dataset zoo — parity with `src/defaults/datasets.py` (43 wrappers) and the
`BaseSet` machinery (`src/defaults/bases.py:14-326`).

Each class declares the reference's metadata contract: `n_classes`, `task`,
`is_multiclass`, `mean`/`std`, `knn_nhood`, `target_metric`, `img_channels`
(values copied from the corresponding reference class — cited per class).
Samples are returned as HWC float32 arrays (NHWC batches, TPU layout).

Every wrapper is a path parser over `dataset_params.data_location`; the
directory layouts follow the reference exactly.  A `Synthetic` dataset (not
in the reference) provides deterministic fake data so the full stack runs
hermetically in tests/benchmarks.
"""

from __future__ import annotations

import glob
import os
import pickle
import random
from pathlib import Path

import numpy as np
from PIL import Image

from ..utils.config import load_json, save_json
from .transforms import build_transform, Compose, Resize


def files_with_suffix(directory, suffix):
    """Recursive glob (reference helpfuns.files_with_suffix)."""
    return sorted(
        os.path.abspath(p) for p in
        glob.glob(os.path.join(directory, "**", f"*{suffix}"), recursive=True))


def read_file_to_list(filepath):
    with open(filepath) as f:
        return f.read().splitlines()


def _read_csv(path):
    import pandas as pd
    return pd.read_csv(path)


class BaseSet:
    """Reference BaseSet protocol: declarative transforms per mode, optional
    resize disentanglement, multi-augmentation, deterministic val splits."""

    img_channels = 3
    is_multiclass = True
    task = "classification"
    knn_nhood = 200
    target_metric = "accuracy"
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    num_augmentations = 1
    is_multi_crop = False

    def __init__(self, dataset_params, mode="train"):
        self.attr_from_dict(dataset_params)
        self.mode = mode
        self.dataset_location = getattr(self, "dataset_location",
                                        self.__class__.__name__)
        self.root_dir = os.path.join(self.data_location, self.dataset_location)
        self.data = self.get_data_as_list()
        self.transform, self.resizing = self.get_transforms()

    def attr_from_dict(self, param_dict):
        self.name = self.__class__.__name__
        for key in param_dict:
            setattr(self, key, param_dict[key])

    # ------------------------------------------------------------------ #
    def __len__(self):
        return len(self.data)

    def load_image(self, record):
        if "img_arr" in record:
            return Image.fromarray(record["img_arr"])
        img_path = record["img_path"]
        png_path = ".".join(img_path.split(".")[:-1]) + ".png"
        if os.path.exists(png_path):
            img_path = png_path
        with open(img_path, "rb") as f:
            img = Image.open(f)
            if self.img_channels == 3:
                return img.convert("RGB")
            if self.img_channels == 1:
                return img.convert("L")
            return img.convert("RGBA")

    # raw_mode: skip per-sample augmentation; emit resized uint8 HWC for
    # DEVICE-side augmentation (data/device_augs.py).  Set by the wrapper
    # when `dataset_params.device_augment` is on.
    raw_mode = False
    raw_size = None

    def _load_raw_fast(self, record):
        """Native decode+resize for JPEG files in raw_mode (GIL-free
        libjpeg with DCT-domain scaling, native/jpeg_dec.cpp); None ->
        caller falls back to the PIL path."""
        path = record.get("img_path")
        if (not path or not self.raw_size or self.img_channels != 3
                or not path.lower().endswith((".jpg", ".jpeg"))):
            return None
        # load_image prefers a .png twin when present — mirror that
        if os.path.exists(".".join(path.split(".")[:-1]) + ".png"):
            return None
        try:
            from ..native import decode_jpeg
            with open(path, "rb") as f:
                data = f.read()
            return decode_jpeg(data, out_size=int(self.raw_size))
        except Exception:
            return None

    def __getitem__(self, idx, rng=None):
        """Returns {'image': HWC float32 (or list for SSL multi-aug; uint8 in
        raw_mode), 'label': int or float vector}."""
        if rng is None:
            rng = np.random.default_rng()
        record = self.data[idx]
        if self.raw_mode:
            arr = self._load_raw_fast(record)
            if arr is not None:
                return {"image": arr, "label": record["label"]}
        img = self.load_image(record)
        if self.raw_mode:
            if self.raw_size and img.size != (self.raw_size, self.raw_size):
                img = img.resize((self.raw_size, self.raw_size),
                                 Image.BICUBIC)
            return {"image": np.asarray(img, dtype=np.uint8),
                    "label": record["label"]}
        if self.resizing is not None:
            img = self.resizing(img, rng)
        if isinstance(self.transform, list):
            # SSL multi-crop: one pipeline per crop (reference bases.py:47-52)
            image = [tr(img, rng) for tr in self.transform]
        elif self.transform is not None:
            image = [self.transform(img, rng)
                     for _ in range(self.num_augmentations)]
            image = image[0] if len(image) == 1 else image
        else:
            image = np.asarray(img, dtype=np.float32) / 255.0
        return {"image": image, "label": record["label"]}

    # ------------------------------------------------------------------ #
    def get_transform_defs(self):
        if self.mode == "train":
            return self.train_transforms
        if self.mode in ("val", "eval"):
            return self.val_transforms
        return self.test_transforms

    def get_transforms(self):
        applied = self.get_transform_defs()
        if isinstance(applied, list):  # SSL: list of per-crop dicts
            transforms = [build_transform(t, self.mean, self.std)
                          for t in applied]
        else:
            transforms = build_transform(applied, self.mean, self.std)
        return self.disentangle_resizes_from_transforms(transforms)

    @staticmethod
    def disentangle_resizes_from_transforms(transforms):
        """Hoist a shared Resize out of the pipelines so decode+resize can be
        done once per image (reference bases.py:267-294)."""
        if isinstance(transforms, Compose):
            resizes = [t for t in transforms.transforms if isinstance(t, Resize)]
            rest = [t for t in transforms.transforms
                    if not isinstance(t, Resize)]
            return Compose(rest), (resizes[0] if resizes else None)
        if isinstance(transforms, list):
            all_resizes = []
            for tr in transforms:
                r = [t for t in tr.transforms if isinstance(t, Resize)]
                if not r:
                    return transforms, None
                all_resizes.append(r[0])
            sizes = {str(r.size) for r in all_resizes}
            if len(sizes) == 1 and len(all_resizes) > 1:
                stripped = [Compose([t for t in tr.transforms
                                     if not isinstance(t, Resize)])
                            for tr in transforms]
                return stripped, all_resizes[0]
            return transforms, None
        raise TypeError(type(transforms))

    @staticmethod
    def get_validation_ids(total_size, val_size, json_path, dataset_name,
                           seed_n=42, overwrite=False):
        """Persisted seeded train/val split (reference bases.py:296-326)."""
        idxs = list(range(total_size))
        if val_size < 1:
            val_size = int(total_size * val_size)
        train_size = total_size - val_size
        if not os.path.isfile(json_path) or overwrite:
            random.Random(seed_n).shuffle(idxs)
            train_split = idxs[val_size:]
            val_split = idxs[:val_size]
            save_json({"train_split": train_split, "val_split": val_split},
                      json_path)
        else:
            s = load_json(json_path)
            if isinstance(s, dict):
                val_split, train_split = s["val_split"], s["train_split"]
            else:
                val_split = s
                train_split = sorted(set(range(total_size)) - set(val_split))
            if val_size != len(val_split) or train_size != len(train_split):
                return BaseSet.get_validation_ids(
                    total_size, val_size, json_path, dataset_name,
                    seed_n=seed_n, overwrite=True)
        return train_split, val_split

    def get_data_as_list(self):
        raise NotImplementedError


# --------------------------------------------------------------------------- #
# Synthetic (hermetic testing/benchmarking; no reference analogue)
# --------------------------------------------------------------------------- #

class Synthetic(BaseSet):
    n_classes = 10
    mean = (0.5, 0.5, 0.5)
    std = (0.25, 0.25, 0.25)

    def __init__(self, dataset_params, mode="train"):
        self.attr_from_dict(dataset_params)
        self.mode = mode
        self.n_classes = int(getattr(self, "synthetic_classes", 10))
        self.size = int(getattr(self, "synthetic_size",
                                512 if mode == "train" else 128))
        self.img_hw = int(getattr(self, "synthetic_img_size", 32))
        self.data = self.get_data_as_list()
        self.transform, self.resizing = self.get_transforms()

    def get_data_as_list(self):
        rng = np.random.default_rng(0 if self.mode == "train" else 1)
        data = []
        for i in range(self.size):
            label = int(i % self.n_classes)
            # class-dependent mean so the task is learnable
            base = np.full((self.img_hw, self.img_hw, 3),
                           40 + 15 * label, np.float32)
            noise = rng.normal(0, 25, base.shape)
            arr = np.clip(base + noise, 0, 255).astype(np.uint8)
            data.append({"img_arr": arr, "label": label})
        return data


class SyntheticMultiLabel(Synthetic):
    """Multi-label synthetic variant (exercises the BCE + MultiLabel metrics
    path; reference analogue: the DDSM/multi-label branches)."""

    is_multiclass = False
    target_metric = "mAP"

    def get_data_as_list(self):
        data = super().get_data_as_list()
        for rec in data:
            c = rec["label"]
            vec = np.zeros(self.n_classes, np.float32)
            vec[c] = 1.0
            vec[(c + 1) % self.n_classes] = 1.0
            rec["label"] = vec
        return data


# --------------------------------------------------------------------------- #
# VTAB suite (reference datasets.py:36-178): png files named img_*-label_N.png
# under <root>/VTAB_<name>/{train,val,test}
# --------------------------------------------------------------------------- #

_VTAB_LOCATIONS = {
    "VTAB_flowers": "VTAB_oxford_flowers102",
    "_VTAB_flowers": "VTAB_oxford_flowers102",
    "VTAB_pets": "VTAB_oxford_iiit_pet",
    "VTAB_pcam": "VTAB_patch_camelyon",
    "VTAB_clevr_count": "VTAB_clevr_count_all",
    "VTAB_clevr_dist": "VTAB_clevr_closest_object_distance",
    "VTAB_dsprites_loc": "VTAB_dsprites_label_x_position",
    "VTAB_dsprites_ori": "VTAB_dsprites_label_orientation",
    "VTAB_smallnorb_azimuth": "VTAB_smallnorb_label_azimuth",
    "VTAB_smallnorb_elevation": "VTAB_smallnorb_label_elevation",
    "VTAB_kitti_dist": "VTAB_kitti_closest_vehicle_distance",
    "VTAB_retinopathy": "VTAB_diabetic_retinopathy_detection",
    "VTAB_svhn": "VTAB_svhn_cropped",
}


class VTABDataset(BaseSet):
    def __init__(self, dataset_params, mode="train"):
        self.dataset_location = _VTAB_LOCATIONS.get(
            self.__class__.__name__, self.__class__.__name__)
        super().__init__(dataset_params, mode)

    def get_data_as_list(self):
        if getattr(self, "train_val", False):
            if self.mode == "train":
                files = (files_with_suffix(os.path.join(self.root_dir, "train"), ".png")
                         + files_with_suffix(os.path.join(self.root_dir, "val"), ".png"))
            else:
                files = files_with_suffix(os.path.join(self.root_dir, "test"), ".png")
        else:
            files = files_with_suffix(
                os.path.join(self.root_dir, self.mode), ".png")
        # corrupted images excluded by the reference (datasets.py:73-75)
        bad = ("VTAB_oxford_iiit_pet/train/img_261-label_20.png",
               "VTAB_sun397/train/img_442-label_85.png")
        files = [f for f in files if not f.endswith(bad)]
        return [{"img_path": f,
                 "label": int(f.split(".")[0].split("-label_")[1])}
                for f in files]


class VTAB_cifar100(VTABDataset):
    n_classes = 100

class VTAB_caltech101(VTABDataset):
    n_classes = 102

class VTAB_dtd(VTABDataset):
    n_classes = 47

class VTAB_flowers(VTABDataset):
    n_classes = 102

class VTAB_pets(VTABDataset):
    n_classes = 37

class VTAB_svhn(VTABDataset):
    n_classes = 10

class VTAB_sun397(VTABDataset):
    n_classes = 397

class VTAB_pcam(VTABDataset):
    n_classes = 2

class VTAB_eurosat(VTABDataset):
    n_classes = 10

class VTAB_resisc45(VTABDataset):
    n_classes = 45

class VTAB_retinopathy(VTABDataset):
    n_classes = 5

class VTAB_clevr_count(VTABDataset):
    n_classes = 8

class VTAB_clevr_dist(VTABDataset):
    n_classes = 6

class VTAB_dmlab(VTABDataset):
    n_classes = 6

class VTAB_kitti_dist(VTABDataset):
    n_classes = 4

class VTAB_dsprites_loc(VTABDataset):
    n_classes = 16

class VTAB_dsprites_ori(VTABDataset):
    n_classes = 16

class VTAB_smallnorb_azimuth(VTABDataset):
    n_classes = 18

class VTAB_smallnorb_elevation(VTABDataset):
    n_classes = 9


# --------------------------------------------------------------------------- #
# CSV/list-file datasets
# --------------------------------------------------------------------------- #

class _SimpleCsvSet(BaseSet):
    """<root>/<Name>/{train,val,test}.csv with columns filename,label and
    images under <root>/<Name>/images/ (Pneumonia/MIT_Indoor/CUB pattern)."""

    images_subdir = "images"
    filename_col = "filename"
    label_col = "label"

    def get_data_as_list(self):
        df = _read_csv(os.path.join(self.root_dir, f"{self.mode}.csv"))
        return [{
            "img_path": os.path.join(self.root_dir, self.images_subdir,
                                     row[self.filename_col]),
            "label": int(row[self.label_col]),
        } for _, row in df.iterrows()]


class NABirds(BaseSet):
    # reference datasets.py:181-791 — 555 classes, data_info.csv +
    # {train,val,test}_image_ids.txt
    n_classes = 555
    mean = (0.492, 0.508, 0.464)
    std = (0.218, 0.217, 0.264)

    def get_data_as_list(self):
        df = _read_csv(os.path.join(self.root_dir, "data_info.csv"))
        if self.mode == "all":
            sel = df
        else:
            if getattr(self, "train_val", False) and self.mode == "train":
                ids = []
                for fn in ("train_image_ids.txt", "val_image_ids.txt"):
                    ids += read_file_to_list(os.path.join(self.root_dir, fn))
            elif getattr(self, "train_val", False):
                ids = read_file_to_list(
                    os.path.join(self.root_dir, "test_image_ids.txt"))
            else:
                fn = {"train": "train_image_ids.txt",
                      "val": "val_image_ids.txt"}.get(self.mode,
                                                      "test_image_ids.txt")
                ids = read_file_to_list(os.path.join(self.root_dir, fn))
            sel = df[df["image_id"].isin(ids)]
        # class ids are remapped densely by first appearance order of the
        # reference's int_to_labels table; use sorted unique class_id instead
        classes = sorted(df["class_id"].astype(str).unique())
        to_int = {c: i for i, c in enumerate(classes)}
        return [{
            "img_path": os.path.join(self.root_dir, "images", row["imagepath"]),
            "label": to_int[str(row["class_id"])],
        } for _, row in sel.iterrows()]


class DDSM(BaseSet):
    # reference datasets.py:793-874
    n_classes = 2
    target_metric = "roc_auc"
    mean = (0.44, 0.44, 0.44)
    std = (0.25, 0.25, 0.25)

    def get_data_as_list(self):
        df = _read_csv(os.path.join(self.root_dir, f"{self.mode}.csv"))
        return [{"img_path": os.path.join(self.root_dir, row["filename"]),
                 "label": int(row["label"])} for _, row in df.iterrows()]


class _CsvWithSeededSplit(BaseSet):
    """CSV ground truth + persisted seeded split into train/val/test
    (ISIC2019/APTOS2019 pattern, reference datasets.py:897-998)."""

    val_size = 0.2

    def frame(self):
        raise NotImplementedError

    def get_data_as_list(self):
        df = self.frame()
        # frame() returns a dict of columns — the sample count is a
        # COLUMN's length, not len(dict) (which is the number of keys and
        # would collapse the dataset to 2 rows)
        n_samples = len(df["img_path"])
        val_id_json = os.path.join(self.root_dir, "val_ids.json")
        train_ids, test_val_ids = self.get_validation_ids(
            total_size=n_samples, val_size=self.val_size,
            json_path=val_id_json, dataset_name=self.name)
        half = len(test_val_ids) // 2
        val_ids, test_ids = test_val_ids[:half], test_val_ids[half:]
        if getattr(self, "train_val", False) and self.mode == "train":
            ids = train_ids + val_ids
        elif self.mode == "train":
            ids = train_ids
        elif self.mode in ("val", "eval"):
            ids = val_ids
        else:
            ids = test_ids
        return [{"img_path": df["img_path"][i], "label": int(df["label"][i])}
                for i in ids]


class ISIC2019(_CsvWithSeededSplit):
    # reference datasets.py:877-941
    n_classes = 8
    target_metric = "recall"
    mean = (0.66776717, 0.52960888, 0.52434725)
    std = (0.22381877, 0.20363036, 0.21538623)
    val_size = 0.2

    def frame(self):
        df = _read_csv(os.path.join(
            self.root_dir, "ISIC_2019_Training_GroundTruth.csv"))
        labels = df.values[:, 1:].astype(float).argmax(axis=1).tolist()
        paths = [os.path.join(self.root_dir, "train", n + ".jpg")
                 for n in df.values[:, 0].tolist()]
        return {"img_path": paths, "label": labels}


class APTOS2019(_CsvWithSeededSplit):
    # reference datasets.py:944-998
    n_classes = 5
    target_metric = "quadratic_kappa"
    mean = (0.415, 0.221, 0.073)
    std = (0.275, 0.150, 0.081)
    val_size = 0.3

    def frame(self):
        df = _read_csv(os.path.join(self.root_dir, "train.csv"))
        paths = [os.path.join(self.root_dir, "train_images", n + ".png")
                 for n in df["id_code"].tolist()]
        return {"img_path": paths, "label": df["diagnosis"].tolist()}


class Flowers102(_SimpleCsvSet):
    # reference datasets.py:1000-1134; CSV labels start from 1, the parser
    # subtracts 1 (datasets.py:1126-1135)
    n_classes = 102
    target_metric = "mean_per_class_accuracy"
    mean = (0.435, 0.38, 0.292)
    std = (0.293, 0.243, 0.27)

    def get_data_as_list(self):
        csv_file = {"train": "train.csv", "val": "val.csv",
                    "test": "test.csv"}.get(self.mode, "all_labels.csv")
        df = _read_csv(os.path.join(self.root_dir, csv_file))
        return [{
            "img_path": os.path.join(self.root_dir, "images",
                                     row["filename"]),
            "label": int(row["label"]) - 1,
        } for _, row in df.iterrows()]


class SUN397(BaseSet):
    # reference datasets.py:1137-1186 — partition text files
    n_classes = 397
    mean = (0.473, 0.456, 0.42)
    std = (0.258, 0.256, 0.279)

    def get_data_as_list(self):
        train_val = read_file_to_list(
            os.path.join(self.root_dir, "Partitions", "Training_01.txt"))
        test = read_file_to_list(
            os.path.join(self.root_dir, "Partitions", "Testing_01.txt"))
        val = set(read_file_to_list(
            os.path.join(self.root_dir, "val_imagefiles.txt")))
        if self.mode == "train":
            files = [f for f in train_val if f not in val]
        elif self.mode in ("val", "eval"):
            files = sorted(val)
        else:
            files = test
        classes = sorted({"/".join(f.split("/")[:-1]) for f in train_val + test})
        to_int = {c: i for i, c in enumerate(classes)}
        return [{"img_path": os.path.join(self.root_dir, "SUN397", f.lstrip("/")),
                 "label": to_int["/".join(f.split("/")[:-1])]} for f in files]


class CIFAR_10(BaseSet):
    # reference datasets.py:1189-1266 — python pickle batches
    n_classes = 10
    mean = (0.493, 0.484, 0.448)
    std = (0.241, 0.237, 0.256)
    batch_dir = "cifar-10-batches-py"
    train_batches = [f"data_batch_{i}" for i in range(1, 6)]
    test_batches = ["test_batch"]
    label_key = b"labels"

    def _load_batches(self, names):
        images, labels = [], []
        for name in names:
            with open(os.path.join(self.root_dir, self.batch_dir, name),
                      "rb") as f:
                d = pickle.load(f, encoding="bytes")
            arr = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
            images.append(arr)
            labels += list(d[self.label_key])
        return np.concatenate(images), labels

    def get_data_as_list(self):
        if self.mode in ("train", "val", "eval"):
            images, labels = self._load_batches(self.train_batches)
            val_json = os.path.join(self.root_dir, "val_ids.json")
            train_ids, val_ids = self.get_validation_ids(
                total_size=len(labels), val_size=0.1, json_path=val_json,
                dataset_name=self.name)
            ids = train_ids if self.mode == "train" else val_ids
            if getattr(self, "train_val", False) and self.mode == "train":
                ids = train_ids + val_ids
        else:
            images, labels = self._load_batches(self.test_batches)
            ids = range(len(labels))
        return [{"img_arr": images[i], "label": int(labels[i])} for i in ids]


class CIFAR_100(CIFAR_10):
    n_classes = 100
    mean = (0.508, 0.487, 0.441)
    std = (0.263, 0.252, 0.272)
    batch_dir = "cifar-100-python"
    train_batches = ["train"]
    test_batches = ["test"]
    label_key = b"fine_labels"


class Colorectal(_SimpleCsvSet):
    # reference datasets.py:1277-1315
    n_classes = 8
    mean = (0.654, 0.475, 0.586)
    std = (0.252, 0.325, 0.266)


class AID(BaseSet):
    # reference datasets.py:1318-1390 — folder-per-class + csv splits
    n_classes = 30
    mean = (0.401, 0.413, 0.372)
    std = (0.21, 0.187, 0.185)

    def get_data_as_list(self):
        csv_file = {"train": "train.csv", "val": "val.csv",
                    "test": "test.csv"}.get(self.mode, "all_labels.csv")
        df = _read_csv(os.path.join(self.root_dir, csv_file))
        all_files = files_with_suffix(
            os.path.join(self.root_dir, "images"), ".jpg")
        wanted = set(df["filename"].tolist())
        files = [f for f in all_files if os.path.split(f)[-1] in wanted]
        classes = sorted({Path(f).parent.name for f in all_files})
        to_int = {c: i for i, c in enumerate(classes)}
        return [{"img_path": f, "label": to_int[Path(f).parent.name]}
                for f in files]


class RSSCN7(AID):
    # reference datasets.py:1393-1449
    n_classes = 7
    target_metric = "mean_per_class_accuracy"
    mean = (0.402, 0.409, 0.38)
    std = (0.2, 0.18, 0.183)


class Aircraft(BaseSet):
    # reference datasets.py:1452-1599 — fgvc images_variant_{split}.txt
    n_classes = 100
    target_metric = "mean_per_class_accuracy"
    mean = (0.478, 0.509, 0.533)
    std = (0.217, 0.21, 0.242)

    def get_data_as_list(self):
        textfile = {"train": "images_variant_train.txt",
                    "val": "images_variant_val.txt",
                    "test": "images_variant_test.txt"}.get(
                        self.mode, "images_variant_all.txt")
        lines = read_file_to_list(os.path.join(self.root_dir, "data", textfile))
        variants = sorted({line[8:] for line in lines})
        to_int = {v: i for i, v in enumerate(variants)}
        return [{
            "img_path": os.path.join(self.root_dir, "data", "images",
                                     f"{line[:7]}.jpg"),
            "label": to_int[line[8:]],
        } for line in lines]


class StanfordCars(BaseSet):
    """Reference datasets.py:1602-1656: torchvision devkit layout —
    <root>/StanfordCars/stanford_cars/{devkit/cars_train_annos.mat,
    cars_test_annos_withlabels.mat, cars_train/, cars_test/} — with the
    reference's extra `val_imgfiles.txt` carving val out of the train split.
    Parsed natively (scipy.io); no torchvision dependency."""

    n_classes = 196
    mean = (0.469, 0.459, 0.454)
    std = (0.29, 0.289, 0.297)

    def _mat_samples(self, split):
        from scipy.io import loadmat
        base = os.path.join(self.root_dir, "stanford_cars")
        if split == "train":
            mat = os.path.join(base, "devkit", "cars_train_annos.mat")
            img_dir = os.path.join(base, "cars_train")
        else:
            mat = os.path.join(base, "cars_test_annos_withlabels.mat")
            img_dir = os.path.join(base, "cars_test")
        annos = loadmat(mat, squeeze_me=True)["annotations"]
        # torchvision semantics: target = mat class - 1
        return [(os.path.join(img_dir, str(a["fname"])),
                 int(a["class"]) - 1) for a in np.atleast_1d(annos)]

    def get_data_as_list(self):
        train_samples = self._mat_samples("train")
        test_samples = self._mat_samples("test")
        val_files = {os.path.join(self.root_dir, p) for p in
                     read_file_to_list(os.path.join(self.root_dir,
                                                    "val_imgfiles.txt"))}
        if getattr(self, "train_val", False):
            selected = (train_samples if self.mode == "train"
                        else test_samples)
        elif self.mode == "train":
            selected = [s for s in train_samples if s[0] not in val_files]
        elif self.mode in ("val", "eval"):
            selected = [s for s in train_samples if s[0] in val_files]
        elif self.mode == "test":
            selected = test_samples
        else:  # 'all'
            selected = train_samples + test_samples
        return [{"img_path": p, "label": t} for p, t in selected]


class DTD(BaseSet):
    """Reference datasets.py:1659-1705: torchvision layout —
    <root>/DTD/dtd/dtd/{labels/{train,val,test}1.txt, images/<cls>/<file>}.
    Split files hold `class/filename.jpg` lines; labels come from the sorted
    class set (torchvision DTD semantics), partition 1."""

    n_classes = 47
    mean = (0.531, 0.474, 0.425)
    std = (0.265, 0.255, 0.263)
    partition = 1

    def _split_entries(self, split):
        data_dir = os.path.join(self.root_dir, "dtd", "dtd")
        lines = read_file_to_list(os.path.join(
            data_dir, "labels", f"{split}{self.partition}.txt"))
        return [(os.path.join(data_dir, "images", ln.strip()),
                 ln.strip().split("/")[0]) for ln in lines if ln.strip()]

    def get_data_as_list(self):
        splits = (("train", "val", "test") if self.mode == "all"
                  else ({"train": ("train",), "val": ("val",),
                         "eval": ("val",), "test": ("test",)}[self.mode]))
        entries = [e for s in splits for e in self._split_entries(s)]
        classes = sorted({c for _, c in entries})
        to_int = {c: i for i, c in enumerate(classes)}
        return [{"img_path": p, "label": to_int[c]} for p, c in entries]


class StanfordDogs(_SimpleCsvSet):
    # reference datasets.py:1708-1859
    n_classes = 120
    mean = (0.476, 0.452, 0.391)
    std = (0.259, 0.253, 0.258)


class OxfordIII_Pet(BaseSet):
    """Reference datasets.py:1862-1921: torchvision layout —
    <root>/OxfordIII_Pet/oxford-iiit-pet/{images/<id>.jpg,
    annotations/{trainval,test}.txt} (lines `image_id label ...`, label is
    1-based) — with `val_imgfiles.txt` carving val out of trainval."""

    n_classes = 37
    target_metric = "mean_per_class_accuracy"
    mean = (0.482, 0.449, 0.395)
    std = (0.265, 0.26, 0.268)

    def _split_samples(self, split):
        base = os.path.join(self.root_dir, "oxford-iiit-pet")
        lines = read_file_to_list(
            os.path.join(base, "annotations", f"{split}.txt"))
        samples = []
        for ln in lines:
            if not ln.strip() or ln.startswith("#"):
                continue
            image_id, label = ln.split()[:2]
            samples.append((os.path.join(base, "images", image_id + ".jpg"),
                            int(label) - 1))
        return samples

    def get_data_as_list(self):
        trainval = self._split_samples("trainval")
        test = self._split_samples("test")
        val_files = {os.path.join(self.root_dir, p) for p in
                     read_file_to_list(os.path.join(self.root_dir,
                                                    "val_imgfiles.txt"))}
        if self.mode == "train":
            selected = [s for s in trainval if s[0] not in val_files]
        elif self.mode in ("val", "eval"):
            selected = [s for s in trainval if s[0] in val_files]
        elif self.mode == "test":
            selected = test
        else:  # 'all'
            selected = trainval + test
        return [{"img_path": p, "label": t} for p, t in selected]


class CUB_200_2011(_SimpleCsvSet):
    # reference datasets.py:1924-1950
    n_classes = 200
    mean = (0.486, 0.5, 0.43)
    std = (0.228, 0.223, 0.262)
    filename_col = "img_name"


class Birdsnap(_SimpleCsvSet):
    # reference datasets.py:1953-1981
    n_classes = 500
    mean = (0.488, 0.502, 0.456)
    std = (0.224, 0.221, 0.262)


class Caltech_101(BaseSet):
    # reference datasets.py:1984-2023 — folder-per-class with seeded split
    n_classes = 101
    target_metric = "mean_per_class_accuracy"
    mean = (0.547, 0.526, 0.495)
    std = (0.32, 0.316, 0.327)
    images_dirname = "101_ObjectCategories"

    def get_data_as_list(self):
        img_dir = os.path.join(self.root_dir, self.images_dirname)
        files = (files_with_suffix(img_dir, ".jpg")
                 + files_with_suffix(img_dir, ".png"))
        classes = sorted({Path(f).parent.name for f in files})
        classes = [c for c in classes if c != "BACKGROUND_Google"]
        to_int = {c: i for i, c in enumerate(classes)}
        files = [f for f in files if Path(f).parent.name in to_int]
        val_json = os.path.join(self.root_dir, "val_ids.json")
        train_ids, test_val_ids = self.get_validation_ids(
            total_size=len(files), val_size=0.4, json_path=val_json,
            dataset_name=self.name)
        half = len(test_val_ids) // 2
        ids = {"train": train_ids, "val": test_val_ids[:half],
               "eval": test_val_ids[:half]}.get(self.mode,
                                                test_val_ids[half:])
        return [{"img_path": files[i],
                 "label": to_int[Path(files[i]).parent.name]} for i in ids]


class Caltech_256(Caltech_101):
    # reference datasets.py:2026-2033
    n_classes = 257
    images_dirname = "256_ObjectCategories"


class MIT_Indoor(_SimpleCsvSet):
    # reference datasets.py:2036-2062
    n_classes = 67
    target_metric = "mean_per_class_accuracy"
    mean = (0.487, 0.43, 0.372)
    std = (0.263, 0.257, 0.259)
    images_subdir = os.path.join("indoorCVPR_09", "Images")


class Pneumonia(_SimpleCsvSet):
    # reference datasets.py:2065-2093
    n_classes = 2
    target_metric = "roc_auc"
    mean = (0.482, 0.482, 0.482)
    std = (0.236, 0.236, 0.236)


class ImageNet(BaseSet):
    # reference datasets.py:2096-2145 — standard ILSVRC layout
    n_classes = 1000
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)

    def get_data_as_list(self):
        split = "train" if self.mode == "train" else "val"
        split_dir = os.path.join(self.root_dir, split)
        files = (files_with_suffix(split_dir, ".JPEG")
                 + files_with_suffix(split_dir, ".jpg"))
        classes = sorted({Path(f).parent.name for f in files})
        to_int = {c: i for i, c in enumerate(classes)}
        return [{"img_path": f, "label": to_int[Path(f).parent.name]}
                for f in files]


def compute_stats(loader):
    """Per-channel mean/std over a loader's images (reference
    `_utils.compute_stats`) — for populating a new dataset's class attrs."""
    x_tot = x2_tot = None
    n = 0
    for batch in loader:
        imgs = batch["image"].astype(np.float64)
        if x_tot is None:
            x_tot = np.zeros(imgs.shape[-1])
            x2_tot = np.zeros(imgs.shape[-1])
        x_tot += imgs.mean(axis=(0, 1, 2))
        x2_tot += (imgs ** 2).mean(axis=(0, 1, 2))
        n += 1
    mean = x_tot / n
    std = np.sqrt(x2_tot / n - mean ** 2)
    return mean, std


def get_dataset_class(name: str):
    cls = globals().get(name)
    if cls is None or not (isinstance(cls, type) and issubclass(cls, BaseSet)):
        raise KeyError(f"Unknown dataset: {name}")
    return cls
