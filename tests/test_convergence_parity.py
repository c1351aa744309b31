"""Convergence-level recipe parity vs the reference's own torch stack.

test_trajectory_parity.py proves EXACT 30-step dynamics on fixed batches
(no augmentation).  This file closes the remaining accuracy-parity gap the
asset-free way (VERDICT r3 item 2): a full supervised recipe — real
config path (YAML merge -> DefaultWrapper -> Trainer), augmentations ON,
400 optimizer steps on a learnable synthetic dataset — run side by side
with the reference's own modules (utils.transformers.vit ViT +
apla.apla_vit.build_apla + DINO param groups + LinearWarmup/Cosine via
MixedLRScheduler, trainer.py:106-151 step order), asserting the loss
curves track and the final val accuracies match to a point.

Aug suite: RandomResizedCrop + HorizontalFlip (geometry only — the
Synthetic classes are brightness-coded, so photometric jitter would
destroy the label signal and turn the test into a comparison of the two
sides' jitter RNGs instead of their training stacks).

The two sides draw their own augmentation randomness (bit-exact parity
through two RNGs is impossible and not the claim); both consume the SAME
deterministic dataset and the SAME recipe distribution (RandomResizedCrop
scale 0.6-1.0 + HFlip 0.5 + Normalize), so agreement here is
convergence-level evidence the frameworks train equivalently.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from PIL import Image  # noqa: E402

IMG, PATCH = 32, 8
DIM, DEPTH, HEADS = 192, 12, 3
N_CLASSES = 10
BATCH = 16
TRAIN_N, VAL_N = 256, 128
EPOCHS = 25
STEPS_PER_EPOCH = TRAIN_N // BATCH
N_STEPS = EPOCHS * STEPS_PER_EPOCH          # 400
LR, WD, CLIP, WARMUP = 1e-3, 1e-5, 1.0, 10
APLA_K = 16
MEAN, STD = (0.5, 0.5, 0.5), (0.25, 0.25, 0.25)

pytestmark = pytest.mark.slow


# ------------------------------------------------------------------ #
# shared data: the package's own Synthetic arrays (deterministic)
# ------------------------------------------------------------------ #

def _synthetic_arrays(mode, size):
    from apla_tpu.utils.config import EDict
    from apla_tpu.data.datasets import Synthetic
    ds = Synthetic(EDict({"synthetic_classes": N_CLASSES,
                          "synthetic_size": size,
                          "synthetic_img_size": IMG,
                          "train_transforms": {"Normalize": True},
                          "val_transforms": {"Normalize": True},
                          "test_transforms": {"Normalize": True}}),
                   mode=mode)
    imgs = np.stack([r["img_arr"] for r in ds.data])
    labels = np.asarray([r["label"] for r in ds.data], np.int64)
    return imgs, labels


# ------------------------------------------------------------------ #
# torch oracle: reference modules + an independent PIL aug pipeline
# ------------------------------------------------------------------ #

def _torch_augment(arr, rng):
    """The recipe's train transform distribution, PIL-backed (torchvision
    is not installed here; these ARE the ops torchvision's PIL backend
    applies): RandomResizedCrop(32, scale .6-1) + HFlip(.5) +
    Normalize."""
    img = Image.fromarray(arr)
    w, h = img.size
    area = w * h
    for _ in range(10):
        ta = area * rng.uniform(0.6, 1.0)
        aspect = np.exp(rng.uniform(np.log(3 / 4), np.log(4 / 3)))
        cw = int(round(np.sqrt(ta * aspect)))
        ch = int(round(np.sqrt(ta / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            left = int(rng.integers(0, w - cw + 1))
            top = int(rng.integers(0, h - ch + 1))
            img = img.crop((left, top, left + cw, top + ch)).resize(
                (IMG, IMG), Image.BICUBIC)
            break
    if rng.random() < 0.5:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    out = np.asarray(img, np.float32) / 255.0
    return (out - MEAN) / STD


def _torch_normalize(arr):
    out = np.asarray(arr, np.float32) / 255.0
    return (out - MEAN) / STD


# reference-import stubbing and param-group rules are shared with the
# 30-step trajectory test (one copy — the stubs must not drift apart)
from tests.test_trajectory_parity import (  # noqa: E402,F401
    EasyDict, _dino_param_groups, _stub, ref_mods)


def _run_torch_side(ref_mods):
    ref_vit, ref_utils, ref_apla = ref_mods

    torch.manual_seed(0)
    model = ref_vit.VisionTransformer(
        img_size=[IMG], patch_size=PATCH, embed_dim=DIM, depth=DEPTH,
        num_heads=HEADS, mlp_ratio=4, qkv_bias=True,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
        pretrained_type="dinov2")
    head = torch.nn.Linear(DIM, N_CLASSES)
    model = ref_apla.build_apla(EasyDict({"partial_size": APLA_K}), model,
                                "apla_attn")
    params = _dino_param_groups(
        list(model.named_parameters()) + list(head.named_parameters()), WD)
    optimizer = torch.optim.AdamW(params, lr=LR, weight_decay=WD)

    # LinearWarmup + CosineAnnealingLR through the reference's own
    # MixedLRScheduler (wrappers.py:240-308 composition)
    class _LinearWarmup(ref_utils.LinearWarmup):
        def __init__(self, optimizer):
            self.warmup_iters = WARMUP
            self.eta_min = 1e-8
            self.max_lr = LR
            for group in optimizer.param_groups:
                group["lr"] = self.eta_min
            torch.optim.lr_scheduler.LRScheduler.__init__(self, optimizer,
                                                          -1)

    sched = ref_utils.MixedLRScheduler(
        [None, _LinearWarmup(optimizer),
         torch.optim.lr_scheduler.CosineAnnealingLR(
             optimizer, T_max=N_STEPS - WARMUP, eta_min=1e-6)],
        [None, "LinearWarmup", "CosineAnnealingLR"],
        steps_per_epoch=STEPS_PER_EPOCH)

    train_x, train_y = _synthetic_arrays("train", TRAIN_N)
    val_x, val_y = _synthetic_arrays("val", VAL_N)
    rng = np.random.default_rng(123)

    losses = []
    model.train()
    head.train()
    for step_i in range(N_STEPS):
        idx = rng.choice(TRAIN_N, BATCH, replace=False)
        xb = np.stack([_torch_augment(train_x[i], rng) for i in idx])
        x = torch.from_numpy(
            xb.astype(np.float32).transpose(0, 3, 1, 2))
        y = torch.from_numpy(train_y[idx])
        optimizer.zero_grad()
        loss = torch.nn.functional.cross_entropy(head(model(x)), y)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(
            list(model.parameters()) + list(head.parameters()), CLIP)
        optimizer.step()
        sched.step()
        losses.append(float(loss.detach()))

    model.eval()
    head.eval()
    correct = 0
    with torch.no_grad():
        for i in range(0, VAL_N, 64):
            xb = np.stack([_torch_normalize(a) for a in val_x[i:i + 64]])
            x = torch.from_numpy(
                xb.astype(np.float32).transpose(0, 3, 1, 2))
            pred = head(model(x)).argmax(-1).numpy()
            correct += int((pred == val_y[i:i + 64]).sum())
    return np.asarray(losses), correct / VAL_N


# ------------------------------------------------------------------ #
# our side: the real config path (YAML merge -> wrapper -> trainer)
# ------------------------------------------------------------------ #

def _run_our_side(tmp_path):
    from apla_tpu.train.trainer import Trainer
    from apla_tpu.utils.config import load_merged_params
    from apla_tpu.wrapper import DefaultWrapper

    params = load_merged_params(os.path.join(
        os.path.dirname(__file__), "..", "params", "synthetic", "vit_tiny",
        "apla.yml"))
    dp = params.dataset_params
    dp.synthetic_size = TRAIN_N
    dp.train_transforms = {
        "RandomResizedCrop": {"apply": True, "size": IMG,
                              "scale": [0.6, 1.0]},
        "HorizontalFlip": {"apply": True, "p": 0.5},
        "Normalize": True,
    }
    for split in ("trainloader", "valloader", "testloader"):
        params.dataloader_params[split].batch_size = BATCH
        params.dataloader_params[split].num_workers = 2
    params.model_params.adaptation.params.partial_size = APLA_K
    tp = params.training_params
    tp.epochs = EPOCHS
    tp.val_every = 1.0
    tp.log_every = 1
    tp.save_dir = str(tmp_path)
    tp.model_name = "conv_parity"
    tp.use_mixed_precision = False   # f32: this is a numerics comparison
    opt = params.optimization_params.default
    opt.optimizer.params.lr = LR
    opt.optimizer.params.weight_decay = WD
    opt.scheduler.params.LinearWarmup.warmup_iters = WARMUP

    wrapper = DefaultWrapper(params)
    wrapper.instantiate()
    trainer = Trainer(wrapper)
    trainer.train()

    log_path = os.path.join(str(tmp_path), "conv_parity.metrics.jsonl")
    losses, val_accs = [], []
    with open(log_path) as f:
        for line in f:
            rec = json.loads(line)
            if "train_loss" in rec:
                losses.append(rec["train_loss"])
            if "val_accuracy" in rec:
                val_accs.append(rec["val_accuracy"])
    return np.asarray(losses), val_accs[-1]


def test_full_recipe_convergence_parity(ref_mods, tmp_path):
    torch_losses, torch_acc = _run_torch_side(ref_mods)
    our_losses, our_acc = _run_our_side(tmp_path)

    # both sides must actually learn the task
    assert torch_acc >= 0.9, torch_acc
    assert our_acc >= 0.9, our_acc
    # final val accuracy parity (the headline assertion)
    assert abs(our_acc - torch_acc) <= 0.02, (our_acc, torch_acc)

    # loss curves track: compare window means at the start, middle, end
    assert len(our_losses) >= N_STEPS - 1
    for sl in (slice(0, 50), slice(N_STEPS // 2 - 25, N_STEPS // 2 + 25),
               slice(-50, None)):
        t = float(np.mean(torch_losses[sl]))
        o = float(np.mean(our_losses[sl]))
        assert abs(t - o) <= max(0.25, 0.2 * t), (sl, t, o)
    # and both end well below where they started
    assert np.mean(our_losses[-50:]) < 0.5 * np.mean(our_losses[:20])
    assert np.mean(torch_losses[-50:]) < 0.5 * np.mean(torch_losses[:20])
