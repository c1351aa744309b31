"""DINOv2 self-supervised adaptation (DINO cls loss + iBOT masked-patch loss
+ KoLeo), with APLA on student AND teacher.

Reference: `src/self_supervised/dinov2/` — `DINOv2` student/teacher
ModuleDicts with multi-crop forward (`models.py:207-441`), `DINOLoss`
(`loss/dino_clstoken_loss.py`), `iBOTPatchLoss` (`loss/ibot_patch_loss.py`),
`KoLeoLoss` (`loss/koleo_loss.py`), iBOT mask collate + MaskingGenerator
(`dinov2_utils.py:21-140`), 4 cosine schedule tables (`trainer.py:7-54`),
foreach-EMA teacher update (`models.py:443-453`).

TPU-native decisions:
- STATIC SHAPES: the reference pads masked-patch buffers to a per-batch
  `upperbound`; here the buffer is a fixed `n_masked_max` (mask_prob *
  ratio_max * tokens), with zero `masks_weight` on padding rows — XLA never
  recompiles.  The reference's own padding (models.py:249-256) shows the
  maths is weight-driven, so padded rows contribute exactly 0.
- The xformers `BlockDiagonalMask.from_tensor_list` trick exists only to
  batch ragged inputs through the (per-token MLP) head — a plain
  concatenation is equivalent and is what we do.
- Centering allreduce (async, `dino_clstoken_loss.py:79-98`) collapses to a
  batch mean under single-controller SPMD.
- EMA covers only trainable leaves; APLA-frozen weights are shared
  student/teacher, so teacher memory ~ APLA rank.
"""

from __future__ import annotations

import math
import random as pyrandom
from copy import deepcopy

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..ops.pallas_apla_attn import accum_scan_trace
from ..parallel.mesh import replicated_sharding
from ..train.optim import build_optimizer, set_lr
from ..utils.config import EDict
from .byol import BYOLTrainer
from .dino import DINOWrapper
from .heads import (dino_head_bottleneck, dino_head_forward,
                    dino_head_last_w, init_dino_head)


# --------------------------------------------------------------------------- #
# schedules (reference dinov2_utils.py:143-163 CosineScheduler + trainer.py
# build_schedulers)
# --------------------------------------------------------------------------- #

class CosineScheduler:
    def __init__(self, base_value, final_value, total_iters, warmup_iters=0,
                 start_warmup_value=0, freeze_iters=0):
        self.final_value = final_value
        self.total_iters = total_iters
        freeze = np.zeros((freeze_iters,))
        warmup = np.linspace(start_warmup_value, base_value, warmup_iters)
        n = max(total_iters - warmup_iters - freeze_iters, 0)
        it = np.arange(n)
        core = final_value + 0.5 * (base_value - final_value) * \
            (1 + np.cos(np.pi * it / max(len(it), 1)))
        self.schedule = np.concatenate((freeze, warmup, core))

    def __getitem__(self, it):
        if it >= self.total_iters:
            return self.final_value
        return float(self.schedule[it])


def build_schedulers(optim_params, training_params, teacher_params,
                     iters_per_epoch, total_iters):
    """The 4+1 schedule tables (reference dinov2/trainer.py:7-54)."""
    lr = CosineScheduler(
        start_warmup_value=0,
        base_value=float(optim_params.optimizer.params.lr),
        final_value=float(optim_params.scheduler.params.CosineAnnealingLR
                          .eta_min),
        total_iters=total_iters,
        warmup_iters=int(optim_params.scheduler.params.LinearWarmup
                         .warmup_epochs) * iters_per_epoch)
    wd = CosineScheduler(
        base_value=float(optim_params.optimizer.params.weight_decay),
        final_value=1e-4, total_iters=total_iters)
    momentum = CosineScheduler(
        base_value=float(teacher_params.momentum_teacher),
        final_value=float(teacher_params.final_momentum_teacher),
        total_iters=total_iters)
    warm_iters = int(teacher_params.warmup_teacher_temp_epochs) \
        * iters_per_epoch
    teacher_temp = CosineScheduler(
        start_warmup_value=float(teacher_params.warmup_teacher_temp),
        base_value=float(teacher_params.teacher_temp),
        final_value=float(teacher_params.teacher_temp),
        total_iters=max(warm_iters, 1), warmup_iters=max(warm_iters, 1))
    last_layer_lr = CosineScheduler(
        start_warmup_value=0,
        base_value=float(optim_params.optimizer.params.lr),
        final_value=float(optim_params.scheduler.params.CosineAnnealingLR
                          .eta_min),
        total_iters=total_iters,
        warmup_iters=int(optim_params.scheduler.params.LinearWarmup
                         .warmup_epochs) * iters_per_epoch)
    freeze_iters = int(training_params.get("freeze_last_layer_epochs", 1)) \
        * iters_per_epoch
    last_layer_lr.schedule[:freeze_iters] = 0
    return lr, wd, momentum, teacher_temp, last_layer_lr


# --------------------------------------------------------------------------- #
# iBOT masking (reference dinov2_utils.py:21-140)
# --------------------------------------------------------------------------- #

class MaskingGenerator:
    """Block-wise mask sampler (reference MaskingGenerator)."""

    def __init__(self, input_size, num_masking_patches=None,
                 min_num_patches=4, max_num_patches=None, min_aspect=0.3,
                 max_aspect=None):
        if not isinstance(input_size, tuple):
            input_size = (input_size,) * 2
        self.height, self.width = input_size
        self.num_patches = self.height * self.width
        self.min_num_patches = min_num_patches
        self.max_num_patches = (num_masking_patches if max_num_patches is None
                                else max_num_patches)
        max_aspect = max_aspect or 1 / min_aspect
        self.log_aspect_ratio = (math.log(min_aspect), math.log(max_aspect))

    def _mask(self, mask, max_mask_patches, rng):
        delta = 0
        for _ in range(10):
            target_area = rng.uniform(
                min(self.min_num_patches, max_mask_patches), max_mask_patches)
            aspect = math.exp(rng.uniform(*self.log_aspect_ratio))
            h = int(round(math.sqrt(target_area * aspect)))
            w = int(round(math.sqrt(target_area / aspect)))
            if w < self.width and h < self.height:
                top = rng.integers(0, self.height - h + 1)
                left = rng.integers(0, self.width - w + 1)
                region = mask[top:top + h, left:left + w]
                num_masked = region.sum()
                if 0 < h * w - num_masked <= max_mask_patches:
                    region[:] = True
                    delta += h * w - num_masked
                if delta > 0:
                    break
        return delta

    def __call__(self, num_masking_patches=0, rng=None):
        rng = rng or np.random.default_rng()
        mask = np.zeros((self.height, self.width), dtype=bool)
        count = 0
        while count < num_masking_patches:
            max_patches = min(num_masking_patches - count,
                              self.max_num_patches or num_masking_patches)
            delta = self._mask(mask, max_patches, rng)
            if delta == 0:
                break
            count += delta
        return mask


def make_ibot_collate(n_global_crops, n_local_crops, mask_ratio_tuple,
                      mask_probability, n_tokens, mask_generator,
                      n_masked_max=None, raw_mode=False, seed=None):
    """Static-shape collate (reference `collate_data_and_cast`):
    returns stacked crops + fixed-size mask index buffers.

    `raw_mode`: samples carry ONE resized uint8 image (device-side
    multi-crop, data/device_augs.device_multicrop); the collate ships
    `raw_images` instead of host-built crops — mask buffers are identical
    (they depend only on B, n_global and the global token grid).

    `seed`: deterministic mask layouts — the per-call RNG derives from
    (seed, call counter).  The reference draws masks from the global RNG
    (dinov2_utils.py collate_data_and_cast), which makes pre-training
    runs irreproducible; the loader calls the collate from ONE producer
    thread in batch order, so the counter is race-free and stable."""
    if n_masked_max is None:
        n_masked_max = int(math.ceil(
            n_tokens * mask_ratio_tuple[1]))  # per sample worst case
    call_counter = [0]

    def collate(samples_list):
        B = len(samples_list)
        if raw_mode:
            raw_images = np.stack([s["image"] for s in samples_list])
            global_crops = local_crops = None
        else:
            raw_images = None
            global_crops = np.stack(
                [s["image"][i] for i in range(n_global_crops)
                 for s in samples_list]).astype(np.float32)
            local_crops = (np.stack(
                [s["image"][i]
                 for i in range(n_global_crops,
                                n_global_crops + n_local_crops)
                 for s in samples_list]).astype(np.float32)
                if n_local_crops else None)
        labels = np.asarray([s["label"] for s in samples_list])

        BG = n_global_crops * B
        if seed is None:
            rng = np.random.default_rng()
        else:
            rng = np.random.default_rng((seed, call_counter[0]))
            call_counter[0] += 1
        n_samples_masked = int(BG * mask_probability)
        probs = np.linspace(*mask_ratio_tuple, n_samples_masked + 1)
        masks_list = []
        for i in range(n_samples_masked):
            n_mask = int(n_tokens * rng.uniform(probs[i], probs[i + 1]))
            masks_list.append(mask_generator(n_mask, rng=rng).flatten())
        for _ in range(n_samples_masked, BG):
            masks_list.append(np.zeros(n_tokens, dtype=bool))
        order = rng.permutation(BG) if seed is not None \
            else np.array(pyrandom.sample(range(BG), BG))
        masks = np.stack([masks_list[i] for i in order])  # [BG, N]

        # fixed-size masked-index buffer: upperbound = BG * n_masked_max
        upper = BG * n_masked_max
        flat_idx = np.flatnonzero(masks.flatten())
        n_masked = len(flat_idx)
        mask_indices = np.zeros(upper, dtype=np.int32)
        mask_indices[:n_masked] = flat_idx[:upper]
        valid = np.zeros(upper, dtype=np.float32)
        valid[:min(n_masked, upper)] = 1.0
        # per-masked-patch weight 1/row_count (reference masks_weight)
        row_counts = np.clip(masks.sum(-1), 1, None)     # [BG]
        weights_full = (1.0 / row_counts)[:, None] * np.ones_like(masks, float)
        masks_weight = np.zeros(upper, dtype=np.float32)
        masks_weight[:n_masked] = weights_full.flatten()[flat_idx][:upper]

        out = {
            "collated_global_crops": global_crops,
            "collated_local_crops": local_crops,
            "collated_masks": masks,
            "mask_indices_list": mask_indices,
            "masks_weight": masks_weight,
            "mask_valid": valid,
            "n_masked_patches": np.asarray([min(n_masked, upper)], np.int32),
            "label": labels,
        }
        if raw_mode:
            out["raw_images"] = raw_images
            del out["collated_global_crops"], out["collated_local_crops"]
        return out

    return collate


# --------------------------------------------------------------------------- #
# losses
# --------------------------------------------------------------------------- #

def softmax_center_teacher(t_out, center, teacher_temp):
    return jax.nn.softmax((t_out - center) / teacher_temp, axis=-1)


def sinkhorn_knopp_teacher(t_out, teacher_temp, n_iterations=3,
                           sample_mask=None):
    """Sinkhorn-Knopp assignment (reference dino_clstoken_loss.py:35-60).
    `sample_mask` [B] zeroes padded rows before normalisation."""
    Q = jnp.exp(t_out.astype(jnp.float32) / teacher_temp).T  # [K, B]
    if sample_mask is not None:
        Q = Q * sample_mask[None, :]
        B = jnp.maximum(jnp.sum(sample_mask), 1.0)
    else:
        B = Q.shape[1]
    K = Q.shape[0]
    def safe_div(q, s):
        # guard EXACT zeros only (padded rows/cols): clamping small-but-
        # real sums (e.g. ~1e-19 at temp 0.07) breaks the normalisation —
        # cost a 0.15 abs divergence vs the reference before round 2
        return q / jnp.where(s == 0.0, 1.0, s)

    Q = Q / jnp.sum(Q)
    for _ in range(n_iterations):
        Q = safe_div(Q, jnp.sum(Q, axis=1, keepdims=True)) / K
        Q = safe_div(Q, jnp.sum(Q, axis=0, keepdims=True)) / B
        if sample_mask is not None:
            Q = Q * sample_mask[None, :]
    return (Q * B).T


def dinov2_dino_loss(student_out_list, teacher_softmaxed_list,
                     student_temp=0.1):
    """Sum of CE over all (student chunk, teacher chunk) pairs (reference
    dino_clstoken_loss.py:62-74 — pairing/skipping is done by the CALLER)."""
    total = 0.0
    for s in student_out_list:
        lsm = jax.nn.log_softmax(s.astype(jnp.float32) / student_temp,
                                 axis=-1)
        for t in teacher_softmaxed_list:
            total = total - jnp.mean(
                jnp.sum(jax.lax.stop_gradient(t) * lsm, axis=-1))
    return total


def ibot_patch_loss(student_masked, teacher_softmaxed_masked, masks_weight,
                    n_images, student_temp=0.1):
    """Masked-patch CE, weight-normalised per image (reference
    ibot_patch_loss.py:100-120 forward_masked).  Padding rows carry weight 0."""
    lsm = jax.nn.log_softmax(
        student_masked.astype(jnp.float32) / student_temp, axis=-1)
    per_patch = jnp.sum(jax.lax.stop_gradient(teacher_softmaxed_masked) * lsm,
                        axis=-1)
    return -jnp.sum(per_patch * masks_weight) / n_images


def koleo_loss(x, eps=1e-8):
    """Kozachenko-Leonenko regulariser (reference koleo_loss.py:15-45)."""
    x = x.astype(jnp.float32)
    x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)
    dots = jnp.dot(x, x.T, preferred_element_type=jnp.float32)
    n = x.shape[0]
    dots = dots - 2.0 * jnp.eye(n)  # exclude self (fill diag with small)
    nn_idx = jnp.argmax(dots, axis=1)
    # eps inside the sqrt: identical neighbours would otherwise give a
    # 0-distance whose sqrt-gradient is NaN
    diff = x - x[nn_idx]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + eps * eps)
    return -jnp.mean(jnp.log(dist + eps))


# --------------------------------------------------------------------------- #
# state + train step
# --------------------------------------------------------------------------- #

@struct.dataclass
class DINOv2TrainState:
    step: jnp.ndarray
    trainable: object       # student {'backbone', 'dino_head'[, 'ibot_head']}
    teacher: object         # EMA twin of trainable
    dino_center: jnp.ndarray
    ibot_center: jnp.ndarray
    opt_state: object


def make_dinov2_train_step(vit_cfg, tx, cfg: EDict, n_global: int,
                           n_local: int, freeze_last_layer: bool,
                           device_crop_cfgs=None, accum_steps: int = 1,
                           pack_local_crops: bool = False,
                           pipeline=None, token_sharding=None):
    """cfg: model_params.dinov2 subtree (dino/ibot weights, centering).

    `device_crop_cfgs`: list of DeviceAugConfig (one per crop) — the batch
    then carries `raw_images` (uint8) and ALL crops are generated on
    device inside this step (data/device_augs.device_multicrop).

    `accum_steps`: the TEACHER (no-grad) runs on the full batch, so
    centering / Sinkhorn statistics keep exact full-batch reference
    semantics; the STUDENT forward+backward runs as a `lax.scan` over
    microbatches with iBOT mask indices rebased per micro, accumulating
    grads before ONE optimizer/EMA update.  Only KoLeo sees smaller
    chunks (it is computed per micro — the same batch-decoupling the
    reference's per-rank KoLeo has under DDP, koleo_loss.py:15-45)."""
    dino_w = float(cfg.dino.loss_weight)
    koleo_w = float(cfg.dino.koleo_loss_weight)
    ibot_w = float(cfg.ibot.loss_weight)
    separate_head = bool(cfg.ibot.get("separate_head", False))
    centering = cfg.get("centering", "centering")
    # bf16 last-layer head matmul (f32 accumulation/logits); the 65536-proto
    # projection is the head's FLOP body and f32 runs it at 1/8 MXU rate
    head_mm_bf16 = bool(cfg.get("head_matmul_bf16", False))
    # fused prototype-CE Pallas kernel: linear + online-softmax CE without
    # ever materialising the [rows, 65536] logits (ops/pallas_proto_ce.py).
    # Softmax-centering only (Sinkhorn's global iterations need the full
    # logit matrix); off-TPU it silently stays on the XLA path.
    # Modes (r5 hardware sweep, r5_proto_ce_tpu.jsonl): the kernel wins 42%
    # at the iBOT row count (R ~ 2048) but loses ~0.15 ms at the tiny
    # dino-global/local sites — true/"all" fuses every site, "ibot" only
    # the winning one (dino sites keep the dense math).
    _fused_mode = cfg.get("fused_proto_ce", False)
    if _fused_mode not in (False, None, True, "all", "ibot"):
        # a typo ("iBOT", quoted "true", ...) must not silently drop the
        # optimization back to dense math
        raise ValueError(
            f"fused_proto_ce: {_fused_mode!r} — expected true/'all' "
            "(fuse every site) or 'ibot' (fuse only the iBOT patch loss)")
    fused_dino = fused_ibot = False
    if _fused_mode:
        from ..ops.pallas_proto_ce import proto_ce, proto_ce_available
        if centering == "centering" and proto_ce_available():
            fused_dino = _fused_mode in (True, "all")
            fused_ibot = _fused_mode in (True, "all", "ibot")
    do_dino, do_ibot = dino_w > 0, ibot_w > 0
    do_koleo = koleo_w > 0
    assert not (pack_local_crops and pipeline is not None), \
        "pack_local_crops + pipeline_parallel unsupported (the packed " \
        "block-diagonal sequence conflicts with the pipeline's batch split)"
    center_momentum = 0.9
    student_temp = 0.1

    def train_step(state: DINOv2TrainState, frozen, batch, lr, wd, momentum,
                   teacher_temp, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        if device_crop_cfgs is not None:
            from ..data.device_augs import device_multicrop
            step_rng, crop_rng = jax.random.split(step_rng)
            g_crops, l_crops = device_multicrop(
                batch["raw_images"], crop_rng, device_crop_cfgs, n_global,
                compute_dtype=vit_cfg.compute_dtype)
        else:
            g_crops = batch["collated_global_crops"]    # [2B, H, W, C]
            l_crops = batch.get("collated_local_crops")  # [LB, h, w, C]
        masks = batch["collated_masks"]                # [2B, N] bool
        mask_idx = batch["mask_indices_list"]          # [U] int32
        masks_weight = batch["masks_weight"]           # [U]
        mask_valid = batch["mask_valid"]               # [U]
        r_g, r_l = jax.random.split(step_rng)
        n_images_global = g_crops.shape[0]

        loss_term_denom = max(n_local * n_global, 1) + (n_global - 1) * n_global

        # ---------------- teacher (no grad) ----------------
        t_bb = jax.lax.stop_gradient(state.teacher.get("backbone"))
        t_heads = jax.lax.stop_gradient(
            {k: v for k, v in state.teacher.items() if k != "backbone"})
        t_tokens = _encode_tokens(t_bb, frozen, g_crops, vit_cfg, None, True,
                                  pipeline=pipeline,
                                  token_sharding=token_sharding)
        t_cls = t_tokens[:, 0]                         # [2B, D]
        t_patches = t_tokens[:, 1 + vit_cfg.num_register_tokens:]
        # swap global chunks so crop A pairs with crop B (models.py:235-238)
        halves = jnp.split(t_cls, n_global)
        t_cls_swapped = jnp.concatenate(halves[::-1], axis=0)
        t_masked_patches = t_patches.reshape(
            -1, t_patches.shape[-1])[mask_idx]          # [U, D]
        ihead = t_heads["ibot_head"] if separate_head else t_heads["dino_head"]

        wt_dino = wt_ibot = None
        if centering == "centering":
            # per-site fused/dense split.  Fused sites never materialise
            # teacher logits: the student CE kernel consumes (bottleneck,
            # last-layer W, center, temp) directly, and the center EMA
            # uses linearity — sum_rows(X @ W) = (sum_rows X) @ W, an
            # O(D*K) matvec.  The loss plumbing carries TEACHER
            # BOTTLENECKS through the same row-sliced channels the
            # softmaxed targets use.
            if fused_dino:
                t_dino_bott = dino_head_bottleneck(t_cls_swapped,
                                                   t_heads["dino_head"])
                wt_dino = jax.lax.stop_gradient(
                    dino_head_last_w(t_heads["dino_head"]))
                new_dino_center = state.dino_center * center_momentum + \
                    jnp.dot(jnp.mean(t_dino_bott, axis=0, keepdims=True),
                            wt_dino) * (1 - center_momentum)
                t_dino_sm = t_dino_bott
            else:
                t_cls_out = dino_head_forward(t_cls_swapped,
                                              t_heads["dino_head"],
                                              matmul_bf16=head_mm_bf16)
                t_dino_sm = softmax_center_teacher(
                    t_cls_out, state.dino_center, teacher_temp)
                new_dino_center = state.dino_center * center_momentum + \
                    jnp.mean(t_cls_out, axis=0, keepdims=True) \
                    * (1 - center_momentum)
            denom = jnp.maximum(jnp.sum(mask_valid), 1.0)
            if fused_ibot:
                t_ibot_bott = dino_head_bottleneck(t_masked_patches, ihead)
                wt_ibot = jax.lax.stop_gradient(dino_head_last_w(ihead))
                new_ibot_center = state.ibot_center * center_momentum + \
                    jnp.dot(jnp.sum(t_ibot_bott * mask_valid[:, None],
                                    axis=0, keepdims=True) / denom,
                            wt_ibot) * (1 - center_momentum)
                t_ibot_sm = t_ibot_bott
            else:
                t_masked_out = dino_head_forward(t_masked_patches, ihead,
                                                 matmul_bf16=head_mm_bf16)
                t_ibot_sm = softmax_center_teacher(t_masked_out,
                                                   state.ibot_center,
                                                   teacher_temp)
                new_ibot_center = state.ibot_center * center_momentum + \
                    (jnp.sum(t_masked_out * mask_valid[:, None], axis=0,
                             keepdims=True) / denom) * (1 - center_momentum)
        else:  # sinkhorn_knopp
            t_cls_out = dino_head_forward(t_cls_swapped,
                                          t_heads["dino_head"],
                                          matmul_bf16=head_mm_bf16)
            t_masked_out = dino_head_forward(t_masked_patches, ihead,
                                             matmul_bf16=head_mm_bf16)
            t_dino_sm = sinkhorn_knopp_teacher(t_cls_out, teacher_temp)
            t_ibot_sm = sinkhorn_knopp_teacher(t_masked_out, teacher_temp,
                                               sample_mask=mask_valid)
            new_dino_center = state.dino_center
            new_ibot_center = state.ibot_center
        t_dino_sm = jax.lax.stop_gradient(t_dino_sm)
        t_ibot_sm = jax.lax.stop_gradient(t_ibot_sm)

        # ---------------- student ----------------
        def student_loss(trainable, g_c, l_c, masks_c, t_dino_c, m_idx,
                         t_ibot_c, m_weight, m_valid, rg, rl, n_imgs_g):
            s_bb = trainable.get("backbone")
            s_tokens_g = _encode_tokens(s_bb, frozen, g_c, vit_cfg, rg,
                                        False, masks=masks_c,
                                        pipeline=pipeline,
                                        token_sharding=token_sharding)
            s_cls_g = s_tokens_g[:, 0]
            s_patches_g = s_tokens_g[:, 1 + vit_cfg.num_register_tokens:]
            head_in = [s_cls_g]
            if n_local:
                # pack_local_crops: the n_local 50-token crops of each image
                # run as ONE block-diagonal sequence — the tiny per-crop
                # attention badly underfills the 128-lane MXU at N=50
                s_cls_l = _encode_tokens(
                    s_bb, frozen, l_c, vit_cfg, rl, False,
                    pack_segments=n_local if pack_local_crops else 0,
                    pipeline=pipeline,
                    token_sharding=token_sharding)[:, 0]
                head_in.append(s_cls_l)
            s_masked = s_patches_g.reshape(
                -1, s_patches_g.shape[-1])[m_idx]
            # masked rows join the shared head pass only when the iBOT
            # loss is on (XLA cannot dead-code rows out of a fused concat
            # + matmul, so gate them here)
            if not separate_head and do_ibot:
                head_in.append(s_masked)
            sizes = [h.shape[0] for h in head_in]
            # norm_last_layer=False: the dinov2 DINOHead's weight-norm
            # magnitude `g` is a TRAINABLE parameter (dino_head.py:28 only
            # fills it with 1, nothing freezes it) — unlike DINO v1's
            # norm_last_layer option
            # ONE shared bottleneck pass for every row; fused sites keep
            # bottlenecks (the prototype projection, softmaxes and CE all
            # happen inside the kernel — the [rows, n_prototypes] logits
            # never exist in HBM), dense sites project their rows only
            bott = dino_head_bottleneck(jnp.concatenate(head_in, axis=0),
                                        trainable["dino_head"])
            ws_dino = dino_head_last_w(trainable["dino_head"],
                                       norm_last_layer=False)

            def _project(x, w):
                if head_mm_bf16:
                    return jnp.dot(x.astype(jnp.bfloat16),
                                   w.astype(jnp.bfloat16),
                                   preferred_element_type=jnp.float32)
                return jnp.dot(x, w, preferred_element_type=jnp.float32)

            splits = np.cumsum(sizes)[:-1]
            parts = jnp.split(bott, splits, axis=0)
            n_cls = sizes[0] + (sizes[1] if n_local else 0)
            if fused_dino or not do_dino:
                s_cls_g_out = parts[0]
                s_cls_l_out = parts[1] if n_local else None
            else:
                cls_logits = _project(bott[:n_cls], ws_dino)
                s_cls_g_out = cls_logits[:sizes[0]]
                s_cls_l_out = cls_logits[sizes[0]:] if n_local else None
            if not do_ibot:
                s_masked_out = None
            elif separate_head:
                b_m = dino_head_bottleneck(s_masked, trainable["ibot_head"])
                ws_ibot = dino_head_last_w(trainable["ibot_head"],
                                           norm_last_layer=False)
                s_masked_out = b_m if fused_ibot else _project(b_m, ws_ibot)
            else:
                ws_ibot = ws_dino
                s_masked_out = (parts[-1] if fused_ibot
                                else _project(parts[-1], ws_dino))

            losses = {}
            total = 0.0
            if do_dino:
                t_list = list(jnp.split(t_dino_c, n_global))
                if n_local:
                    s_local_chunks = list(jnp.split(s_cls_l_out, n_local))
                    if fused_dino:
                        # every (student local chunk, teacher chunk) pair is
                        # row-aligned; stack the pair-expanded bottlenecks
                        # ([n_local*n_global*B', 256] — tiny) for ONE kernel
                        xs_p = jnp.concatenate(
                            [s for s in s_local_chunks for _ in t_list])
                        xt_p = jnp.concatenate(
                            [t for _ in s_local_chunks for t in t_list])
                        ce = proto_ce(xs_p, ws_dino, xt_p, wt_dino,
                                      state.dino_center, teacher_temp,
                                      student_temp)
                        dino_local = (jnp.sum(ce) / s_local_chunks[0].shape[0]
                                      ) / loss_term_denom
                    else:
                        dino_local = dinov2_dino_loss(
                            s_local_chunks, t_list,
                            student_temp=student_temp) / loss_term_denom
                    losses["dino_local_crops_loss"] = dino_local
                    total = total + dino_w * dino_local
                if fused_dino:
                    ce = proto_ce(s_cls_g_out, ws_dino, t_dino_c, wt_dino,
                                  state.dino_center, teacher_temp,
                                  student_temp)
                    dino_global = jnp.mean(ce) * 2 / loss_term_denom
                else:
                    dino_global = dinov2_dino_loss(
                        [s_cls_g_out], [t_dino_c],
                        student_temp=student_temp) * 2 / loss_term_denom
                losses["dino_global_crops_loss"] = dino_global
                total = total + dino_w * dino_global
                if do_koleo:
                    kl = koleo_w * sum(
                        koleo_loss(chunk)
                        for chunk in jnp.split(s_cls_g, n_global))
                    losses["koleo_loss"] = kl / 2
                    total = total + kl
            if do_ibot:
                if fused_ibot:
                    ce = proto_ce(s_masked_out, ws_ibot, t_ibot_c, wt_ibot,
                                  state.ibot_center, teacher_temp,
                                  student_temp)
                    il = jnp.sum(ce * (m_weight * m_valid)) / n_imgs_g \
                        * 2 * (1.0 / n_global)
                else:
                    il = ibot_patch_loss(
                        s_masked_out, t_ibot_c, m_weight * m_valid,
                        n_images=n_imgs_g, student_temp=student_temp) \
                        * 2 * (1.0 / n_global)
                losses["ibot_loss"] = il / 2
                total = total + ibot_w * il
            total = jnp.asarray(total, jnp.float32)
            losses = {k: jnp.asarray(v, jnp.float32)
                      for k, v in losses.items()}
            return total, losses

        if accum_steps == 1:
            (loss, loss_dict), grads = jax.value_and_grad(
                student_loss, has_aux=True)(
                state.trainable, g_crops, l_crops, masks, t_dino_sm,
                mask_idx, t_ibot_sm, masks_weight, mask_valid, r_g, r_l,
                n_images_global)
        else:
            B = g_crops.shape[0] // n_global
            assert B % accum_steps == 0, (B, accum_steps)
            mb = B // accum_steps

            def micro_split(x, n_crops):
                # crop-major [n_crops*B, ...] -> [accum, n_crops*mb, ...]
                x = x.reshape((n_crops, accum_steps, mb) + x.shape[1:])
                x = jnp.moveaxis(x, 1, 0)
                return x.reshape((accum_steps, n_crops * mb) + x.shape[3:])

            g_m = micro_split(g_crops, n_global)
            l_m = micro_split(l_crops, n_local) if n_local else None
            masks_m = micro_split(masks, n_global)
            t_dino_m = micro_split(t_dino_sm, n_global)

            # rebase the flat iBOT mask indices into each micro's local
            # [n_global*mb*n_tok] patch space; foreign entries keep weight 0
            # (they gather an arbitrary in-range row that the loss ignores)
            n_tok = masks.shape[1]
            U = mask_idx.shape[0]
            u_m = U // accum_steps   # exact per-micro upper bound:
            # U = n_global*B*n_masked_max and a micro owns n_global*mb rows
            rows, cols = mask_idx // n_tok, mask_idx % n_tok
            gi, bi = rows // B, rows % B
            # padding entries (valid 0) belong to NO micro — otherwise they
            # all pile into micro 0 and can overflow its u_m slice
            owner = jnp.where(mask_valid > 0, bi // mb, accum_steps)  # [U]
            local_flat = (gi * mb + (bi % mb)) * n_tok + cols
            idx_m, order_m, w_m, valid_m = [], [], [], []
            for m in range(accum_steps):
                order = jnp.argsort(jnp.where(owner == m, 0, 1),
                                    stable=True)[:u_m]
                # the teacher-prototype rows t_ibot_sm[order] are gathered
                # INSIDE the scan body — stacking permuted copies here
                # would materialise accum x [U, n_prototypes] (GBs at the
                # 65536-proto recipe)
                order_m.append(order)
                idx_m.append(local_flat[order])
                w_m.append(jnp.where(owner == m, masks_weight, 0.0)[order])
                valid_m.append(jnp.where(owner == m, mask_valid, 0.0)[order])
            idx_m, order_m, w_m, valid_m = (
                jnp.stack(idx_m), jnp.stack(order_m), jnp.stack(w_m),
                jnp.stack(valid_m))
            rg_m = jax.random.split(r_g, accum_steps)
            rl_m = jax.random.split(r_l, accum_steps)

            zero_ld = {}
            if do_dino:
                if n_local:
                    zero_ld["dino_local_crops_loss"] = 0
                zero_ld["dino_global_crops_loss"] = 0
                if do_koleo:
                    zero_ld["koleo_loss"] = 0
            if do_ibot:
                zero_ld["ibot_loss"] = 0
            zero_ld = {k: jnp.zeros((), jnp.float32) for k in zero_ld}
            zero_g = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.trainable)

            def body(acc, xs):
                acc_loss, acc_ld, acc_g = acc
                if n_local:
                    (g_i, masks_i, t_dino_i, idx_i, order_i, w_i, valid_i,
                     rg_i, rl_i, l_i) = xs
                else:
                    (g_i, masks_i, t_dino_i, idx_i, order_i, w_i, valid_i,
                     rg_i, rl_i) = xs
                    l_i = None
                t_ibot_i = jax.lax.stop_gradient(t_ibot_sm[order_i])
                with accum_scan_trace():
                    (loss_i, ld_i), g_i_grad = jax.value_and_grad(
                        student_loss, has_aux=True)(
                        state.trainable, g_i, l_i, masks_i, t_dino_i, idx_i,
                        t_ibot_i, w_i, valid_i, rg_i, rl_i, n_global * mb)
                return (acc_loss + loss_i,
                        jax.tree.map(jnp.add, acc_ld, ld_i),
                        jax.tree.map(jnp.add, acc_g, g_i_grad)), None

            xs = (g_m, masks_m, t_dino_m, idx_m, order_m, w_m, valid_m,
                  rg_m, rl_m)
            if n_local:
                xs = xs + (l_m,)
            (loss_sum, ld_sum, grads), _ = jax.lax.scan(
                body, (jnp.zeros((), jnp.float32), zero_ld, zero_g), xs)
            loss = loss_sum / accum_steps
            loss_dict = {k: v / accum_steps for k, v in ld_sum.items()}
            grads = jax.tree.map(lambda g: g / accum_steps, grads)
        if freeze_last_layer:
            # reference cancel_gradients("student.dino_head.last_layer")
            # covers BOTH weight-norm leaves (weight_v AND weight_g)
            grads = jax.tree_util.tree_map_with_path(
                lambda path, g: (jnp.zeros_like(g)
                                 if any(getattr(p, "key", None)
                                        in ("last_v", "last_g")
                                        for p in path) else g), grads)
        opt_state = set_lr(state.opt_state, lr, wd)
        updates, opt_state = tx.update(grads, opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        m = jnp.asarray(momentum, jnp.float32)
        teacher = jax.tree.map(
            lambda t, s: t * m + s.astype(t.dtype) * (1.0 - m),
            state.teacher, trainable)
        new_state = state.replace(
            step=state.step + 1, trainable=trainable, teacher=teacher,
            dino_center=jax.lax.stop_gradient(new_dino_center),
            ibot_center=jax.lax.stop_gradient(new_ibot_center),
            opt_state=opt_state)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        metrics.update(loss_dict)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


def _encode_tokens(backbone_trainable, frozen, images, vit_cfg, rng,
                   deterministic, masks=None, pack_segments=0,
                   pipeline=None, token_sharding=None):
    from ..models.classifier import _backbone_params
    from ..models.vit import vit_features
    t = {"backbone": backbone_trainable} if backbone_trainable else {}
    params, apla_t = _backbone_params(t, frozen)
    return vit_features(params, images, vit_cfg, trainable=apla_t, rng=rng,
                        deterministic=deterministic, return_all_tokens=True,
                        masks=masks, pack_segments=pack_segments,
                        pipeline=pipeline, token_sharding=token_sharding)


# --------------------------------------------------------------------------- #
# wrapper + trainer
# --------------------------------------------------------------------------- #

class DINOv2Wrapper(DINOWrapper):
    strategy_name = "dinov2"
    is_supervised = False
    use_momentum = True

    def set_crops_params(self):
        # crop counts/sizes derive from the strategy in effect (a user
        # file wins) — reference set_crops_params reads them from the
        # colocated json (dinov2/wrappers.py:36-49)
        from .multicrop import resolve_strategy_spec
        spec = resolve_strategy_spec(self.parameters, "dinov2")
        ds = self.dataset_params
        self.crops_params = EDict(
            n_global_crops=int(spec["n_global"]),
            n_local_crops=int(spec["n_local"]),
            global_crops_size=int(ds.get("ssl_global_size",
                                         spec["global_size"])),
            local_crops_size=int(ds.get("ssl_local_size",
                                        spec["local_size"] or 0)))

    def init_dataloaders(self):
        self.set_crops_params()
        loaders = super().init_dataloaders()
        # attach the iBOT mask collate to the trainloader
        tp = self.model_params.transformers_params
        patch = int(tp.get("student", tp).get("patch_size", 14))
        img_size = self.crops_params.global_crops_size
        grid = img_size // patch
        n_tokens = grid * grid
        ibot = self.model_params.dinov2.ibot
        gen = MaskingGenerator((grid, grid),
                               max_num_patches=int(0.5 * n_tokens))

        # device-side multi-crop set up by the BYOLWrapper hook
        # (_setup_device_multicrop, strategy_name='dinov2'); here only the
        # collate switches to shipping raw_images
        raw_mode = getattr(self, "ssl_device_crop_cfgs", None) is not None

        loaders.trainloader.collate_fn = make_ibot_collate(
            self.crops_params.n_global_crops, self.crops_params.n_local_crops,
            tuple(ibot.mask_ratio_min_max),
            float(ibot.mask_sample_probability), n_tokens, gen,
            raw_mode=raw_mode,
            seed=int(self.training_params.get("seed", 0)))
        return loaders

    def build_vit_config(self):
        """dinov2 config uses nested transformers_params.student
        (reference __common__.yml model_params schema)."""
        mp = self.model_params
        tp = EDict(mp.get("transformers_params", EDict()))
        sp = EDict(tp.get("student", tp))
        from ..models.vit import VIT_BUILDERS
        import jax.numpy as jnp2
        use_mp = self.training_params.get("use_mixed_precision", True)
        return VIT_BUILDERS[mp.backbone_type](
            img_size=int(sp.get("pre_img_size", 518)),
            patch_size=int(sp.get("patch_size", 14)),
            drop_path_rate=float(sp.get("drop_path_rate", 0.0)),
            has_layerscale=sp.get("layerscale") is not None,
            layerscale_init=float(sp.get("layerscale", 1e-5) or 1e-5),
            num_register_tokens=int(sp.get("num_register_tokens", 0)),
            use_swiglu=sp.get("ffn_layer", "mlp") == "swiglu",
            compute_dtype=jnp2.bfloat16 if use_mp else jnp2.float32,
            # XLA's fused attention + remat('dots') measures FASTER than the
            # Pallas flash kernels at ViT scales on v5e (59.7 vs 22.5 img/s
            # for ViT-B@518 b8) while fitting memory — so the mem-efficient
            # kernel path is opt-in (`is_memory_efficient: true`), not the
            # default as in the reference.
            use_flash=bool(sp.get("is_memory_efficient", False)),
            use_fused_apla=bool(sp.get("use_fused_apla", False)),
            gelu_tanh=bool(sp.get("gelu_tanh", False)),
            remat=sp.get("remat", "dots"),
        )

    def init_model(self, seed: int = 0):
        from ..models.classifier import init_classifier
        self.vit_cfg = self.build_vit_config()
        apla_cfg = self.build_apla_config()
        d2 = self.model_params.dinov2
        key = jax.random.PRNGKey(seed)
        k_bb, k_dh, k_ih, k_mt = jax.random.split(key, 4)
        bb_trainable, bb_frozen = init_classifier(
            k_bb, self.vit_cfg, n_classes=1, apla_cfg=apla_cfg,
            freeze_backbone=bool(self.model_params.get("freeze_backbone",
                                                       False)))
        # iBOT mask token lives with the frozen backbone params
        from ..models.vit import trunc_normal
        if "backbone" in bb_frozen:
            bb_frozen["backbone"]["mask_token"] = trunc_normal(
                k_mt, (1, 1, self.vit_cfg.embed_dim), std=0.02)
        dino = d2.dino
        dino_head = init_dino_head(
            k_dh, self.vit_cfg.embed_dim, int(dino.head_n_prototypes),
            nlayers=int(dino.head_nlayers),
            hidden_dim=int(dino.head_hidden_dim),
            bottleneck_dim=int(dino.head_bottleneck_dim))
        trainable = {"backbone": bb_trainable.get("backbone", {}),
                     "dino_head": dino_head}
        if bool(d2.ibot.get("separate_head", False)):
            ib = d2.ibot
            trainable["ibot_head"] = init_dino_head(
                k_ih, self.vit_cfg.embed_dim, int(ib.head_n_prototypes),
                nlayers=int(ib.head_nlayers),
                hidden_dim=int(ib.head_hidden_dim),
                bottleneck_dim=int(ib.head_bottleneck_dim))
        if self.model_params.get("pretrained"):
            from ..utils.pretrained import maybe_load_pretrained_backbone
            t2 = {"backbone": trainable["backbone"]}
            f2 = {"backbone": bb_frozen["backbone"]} \
                if "backbone" in bb_frozen else {}
            t2, f2 = maybe_load_pretrained_backbone(
                t2, f2, self.model_params, self.vit_cfg)
            trainable["backbone"] = t2.get("backbone", {})
            if "backbone" in f2:
                if "mask_token" not in f2["backbone"]:
                    f2["backbone"]["mask_token"] = \
                        bb_frozen["backbone"]["mask_token"]
                bb_frozen["backbone"] = f2["backbone"]
        # transfer learning: adopt a previous run's checkpoint into
        # the student before the teacher copy (reference
        # DINOV2/wrappers.py pretrained_path block)
        tl_path = self.transfer_learning_params.get("pretrained_path")
        if tl_path:
            from ..train.checkpoint import transfer_into
            trainable, bb_frozen = transfer_into(
                trainable, bb_frozen, tl_path, where="dinov2")
        teacher = deepcopy(trainable)
        repl = replicated_sharding(self.mesh)
        from ..parallel.mesh import shard_params
        policy = self.system_params.get("param_sharding", "replicated")
        if policy == "pp":
            self.trainable = shard_params(trainable, self.mesh, policy="pp")
            self.teacher = shard_params(teacher, self.mesh, policy="pp")
        else:
            self.trainable = jax.device_put(trainable, repl)
            self.teacher = jax.device_put(teacher, repl)
        self.frozen = shard_params(bb_frozen, self.mesh, policy=policy)
        self.n_prototypes = int(dino.head_n_prototypes)
        self.ibot_prototypes = (int(d2.ibot.head_n_prototypes)
                                if d2.ibot.get("separate_head", False)
                                else self.n_prototypes)

    def init_optimization(self):
        opt = self.optimization_params.default
        self.tx = build_optimizer(
            opt.optimizer.type, dict(opt.optimizer.params), self.trainable,
            grad_clip=self.training_params.get("grad_clipping"))
        iters_per_epoch = len(self.dataloaders.trainloader)
        total_iters = iters_per_epoch * int(self.training_params.epochs)
        tp = self.model_params.transformers_params
        # NOTE: last_layer_lr_schedule is kept for reference-parity
        # inspection only — the step implements the first-epoch freeze
        # by ZEROING last_v grads, which is equivalent (post-freeze the
        # two schedules are identical, and weight decay on the
        # weight-normalised last layer is direction-invariant)
        (self.lr_schedule, self.wd_schedule, self.momentum_schedule_tbl,
         self.teacher_temp_schedule, self.last_layer_lr_schedule) = \
            build_schedulers(self.optimization_params.default,
                             self.training_params, tp.teacher,
                             iters_per_epoch, max(total_iters, 1))
        state = DINOv2TrainState(
            step=jnp.zeros((), jnp.int32), trainable=self.trainable,
            teacher=self.teacher,
            dino_center=jnp.zeros((1, self.n_prototypes), jnp.float32),
            ibot_center=jnp.zeros((1, self.ibot_prototypes), jnp.float32),
            opt_state=self.tx.init(self.trainable))
        if self.system_params.get("param_sharding") == "pp":
            self.state = state  # trainable/teacher already stage-sharded
        else:
            self.state = jax.device_put(state,
                                        replicated_sharding(self.mesh))
        # BYOLTrainer compatibility
        from ..train.schedules import LRScheduler
        self.scheduler = LRScheduler(
            opt.scheduler.type, opt.scheduler.get("params", {}),
            max_lr=opt.optimizer.params.lr,
            steps_per_epoch=iters_per_epoch,
            epochs=self.training_params.epochs)


class Dinov2Trainer(BYOLTrainer):
    """Reference Dinov2Trainer (`dinov2/trainer.py:57-162`): schedule tables
    drive lr/wd/momentum/teacher-temp; last-layer frozen for the first
    epoch(s); feature extractor = TEACHER backbone."""

    feature_branch = "teacher"

    def __init__(self, wrapper):
        super().__init__(wrapper, use_momentum=True)
        self.freeze_last_for = int(
            wrapper.training_params.get("freeze_last_layer_epochs", 1))
        self.n_global = wrapper.crops_params.n_global_crops
        self.n_local = wrapper.crops_params.n_local_crops
        self._steps = {}

    def _get_step(self, freeze: bool):
        if freeze not in self._steps:
            self._steps[freeze] = make_dinov2_train_step(
                self.vit_cfg, self.wrapper.tx,
                self.wrapper.model_params.dinov2, self.n_global,
                self.n_local, freeze_last_layer=freeze,
                device_crop_cfgs=getattr(self.wrapper,
                                         "ssl_device_crop_cfgs", None),
                accum_steps=int(self.wrapper.training_params.get(
                    "accum_steps", 1)),
                pack_local_crops=self._pack_local_crops(),
                pipeline=getattr(self.wrapper, "pipeline_spec", None),
                token_sharding=getattr(self.wrapper, "token_sharding",
                                       None))
        return self._steps[freeze]

    def _pack_local_crops(self) -> bool:
        tp = self.wrapper.model_params.get("transformers_params", {})
        sp = tp.get("student", tp)  # same fallback as build_vit_config
        return bool(sp.get("pack_local_crops", False))

    def _device_batch(self, batch):
        from ..parallel.mesh import shard_batch
        keep = {k: v for k, v in batch.items()
                if k not in ("label", "n_masked_patches")
                and v is not None}
        return shard_batch(keep, self.mesh)

    def train(self):
        from ..utils.logging import cyan, gray
        if self.restore_session:
            self.load_session()
        loader = self.wrapper.dataloaders.trainloader
        steps_per_epoch = len(loader)
        val_interval = max(int(self.val_every * steps_per_epoch), 1)
        print(cyan(f"DINOv2 training {self.model_name}: "
                   f"{self.epochs} epochs x {steps_per_epoch}"))
        for epoch in range(self.epoch0, self.epochs):
            loader.set_epoch(epoch)
            self.epoch = epoch
            freeze = self.freeze_last_for and (epoch + 1) <= self.freeze_last_for
            step_fn = self._get_step(bool(freeze))
            from ..data.loader import device_prefetch
            for batch, dbatch in device_prefetch(loader,
                                                 self._device_batch):
                lr = self.wrapper.lr_schedule[self.iters]
                wd = self.wrapper.wd_schedule[self.iters]
                mom = self.wrapper.momentum_schedule_tbl[self.iters]
                t_temp = self.wrapper.teacher_temp_schedule[self.iters]
                self.state, m = step_fn(self.state, self.frozen, dbatch,
                                        lr, wd, mom, t_temp, self.rng)
                self.iters += 1
                if self.iters % self.log_every == 0 or self.iters == 1:
                    logd = {k: float(v) for k, v in m.items()}
                    logd.update(lr=lr, wd=wd, teacher_temp=t_temp,
                                momentum=mom)
                    self.logger.log({"train_" + k if k in
                                     ("loss",) else k: v
                                     for k, v in logd.items()}, self.iters)
                    print(gray(f"it {self.iters:6d} ep {epoch:3d} "
                               f"loss {logd['loss']:.4f} lr {lr:.2e}"))
                if self.iters % val_interval == 0:
                    self.epoch_step(epoch)
                    self._last_val_iter = self.iters
        if getattr(self, "_last_val_iter", -1) != self.iters:
            self.epoch_step(self.epochs - 1)
        self.save_session(self.epochs - 1)
        self.logger.finish()

    def momentum_at(self, it):
        return self.wrapper.momentum_schedule_tbl[it]
