#!/usr/bin/env python
"""Accuracy-parity harness: NABirds ViT-B APLA-8 fine-tune evaluation
(reference recipe params/finetune/dinov2/NABirds/vit_b/apla.yml).

Round-3 blocker in ROUND_NOTES: real weights/data are not provisioned in
this zero-egress environment.  This harness is READY — point it at the
assets and it produces the top-1 to compare against the paper/reference:

  python experiments/parity_nabirds.py \
      --data_root /data/NABirds \
      --backbone_ckpt /weights/dinov2_vitb14_pretrain.pth \
      [--apla_ckpt <dir with a trained checkpoint to evaluate>]

Without --apla_ckpt it evaluates the imported frozen backbone + a fresh
head (sanity: near-chance), with it the trained model (parity: compare
to the reference's NABirds top-1).  The torch importer used here is
round-trip parity-tested in-repo (tests/test_torch_parity.py).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", required=True)
    p.add_argument("--backbone_ckpt", required=True)
    p.add_argument("--apla_ckpt")
    p.add_argument("--batch_size", type=int, default=64)
    args = p.parse_args()

    for path, what in ((args.data_root, "NABirds data root"),
                       (args.backbone_ckpt, "dinov2 backbone .pth")):
        if not os.path.exists(path):
            print(json.dumps({"status": "missing_asset", "what": what,
                              "path": path}))
            return 1

    from apla_tpu.utils.config import load_merged_params
    from apla_tpu.wrapper import DefaultWrapper
    from apla_tpu.train.trainer import Trainer

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params = load_merged_params(os.path.join(
        root, "params", "finetune", "dinov2", "NABirds", "vit_b",
        "apla.yml"))
    params.dataset_params.data_location = args.data_root
    params.model_params.pretrained = True
    params.model_params.pretrained_checkpoint = args.backbone_ckpt
    if args.apla_ckpt:
        params.transfer_learning_params = {"pretrained_path": args.apla_ckpt}
    for ld in ("trainloader", "valloader", "testloader"):
        params.dataloader_params[ld].batch_size = args.batch_size

    wrapper = DefaultWrapper(params)
    wrapper.instantiate()
    trainer = Trainer(wrapper)
    results = trainer.evaluate(wrapper.dataloaders.testloader, prefix="test")
    print(json.dumps({"status": "ok", "recipe": "NABirds vit_b apla",
                      **results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
