"""End-to-end training with device-side augmentation
(`dataset_params.device_augment: true`) — host ships resized uint8, the
augmentation tail runs inside the jitted step."""

import os

import numpy as np

from apla_tpu.train.trainer import Trainer
from apla_tpu.utils.config import load_merged_params
from apla_tpu.wrapper import DefaultWrapper

PARAMS = os.path.join(os.path.dirname(__file__), "..", "params", "synthetic",
                      "vit_tiny", "apla.yml")


def test_device_aug_training(tmp_path):
    params = load_merged_params(PARAMS)
    params.dataset_params.device_augment = True
    params.dataset_params.train_transforms.RandomResizedCrop = {
        "apply": True, "size": 32, "scale": [0.8, 1.2]}
    params.training_params.epochs = 2
    params.training_params.log_every = 1
    params.training_params.save_dir = str(tmp_path)
    params.dataset_params.synthetic_size = 128
    wrapper = DefaultWrapper(params)
    wrapper.instantiate()
    assert wrapper.device_aug_cfg is not None
    assert wrapper.dataloaders.trainloader.dataset.raw_mode
    # the loader must emit uint8
    batch = next(iter(wrapper.dataloaders.trainloader))
    assert batch["image"].dtype == np.uint8

    trainer = Trainer(wrapper)
    trainer.train()
    import json
    path = os.path.join(trainer.save_dir,
                        f"{trainer.model_name}.metrics.jsonl")
    losses = [json.loads(l)["train_loss"] for l in open(path)
              if "train_loss" in l]
    assert losses[-1] < losses[0], f"no learning: {losses[0]}->{losses[-1]}"
    # val path still uses host transforms (eval is deterministic)
    assert not wrapper.dataloaders.valloader.dataset.raw_mode
