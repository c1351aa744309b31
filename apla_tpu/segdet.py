"""Runnable segmentation / detection side-car training loops.

The reference ships the seg/det path as mm* drop-in backbones plus config
files and tells users to train inside mmseg/mmdet
(`src/segmentation_and_detection/README.md`); this framework's equivalents
are first-class: the APLA backbone + SETR-PUP / FCOS heads, jitted train
steps, dataset readers, and — here — compact end-to-end train/eval loops
with checkpointing, so a reference user has a complete in-repo path.

    python -m apla_tpu.segdet seg --root <ade_root> --epochs 8 ...
    python -m apla_tpu.segdet det --img_dir <dir> --ann <instances.json> ...
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .data.loader import DataLoader


def _mesh_setup(n_devices, param_sharding, batch_size):
    """Optional multi-chip placement for the side-car loops: a 'data'-axis
    mesh with the batch sharded over it (DP) and the frozen backbone either
    replicated or FSDP-sharded (ZeRO-3 — the frozen ViT-L/Swin backbone
    dominates side-car memory).  n_devices<=1 keeps the single-device path
    untouched.  Returns (mesh_or_None, put_batch, place_params)."""
    from .parallel.mesh import shard_batch, make_mesh, shard_params
    if not n_devices or n_devices <= 1:
        asarray = lambda b: jax.tree.map(jnp.asarray, b)
        return None, asarray, lambda tree, policy="replicated": tree
    if batch_size % n_devices:
        raise ValueError(f"batch_size {batch_size} not divisible by "
                         f"n_devices {n_devices}")
    mesh = make_mesh(n_data=n_devices)
    return (mesh, lambda b: shard_batch(b, mesh),
            lambda tree, policy="replicated": shard_params(tree, mesh,
                                                           policy=policy))


def _save(save_dir, name, trainable, frozen, meta, opt_state=None):
    """Atomic checkpoint write (tmp + os.replace: a preemption mid-write —
    the very event --resume exists for — must not corrupt the file).
    `frozen=None` omits the backbone (the per-epoch 'last' checkpoints
    store it once in <task>_frozen.msgpack; best checkpoints stay
    self-contained for the export_seg/export_det CLIs)."""
    from flax import serialization
    os.makedirs(save_dir, exist_ok=True)
    host = {"trainable": trainable}
    if frozen is not None:
        host["frozen"] = frozen
    if opt_state is not None:
        host["opt_state"] = serialization.to_state_dict(opt_state)
    host = jax.tree.map(np.asarray, host)
    path = os.path.join(save_dir, name + ".msgpack")
    with open(path + ".tmp", "wb") as f:
        f.write(serialization.msgpack_serialize(host))
    os.replace(path + ".tmp", path)
    meta_path = os.path.join(save_dir, name + ".json")
    with open(meta_path + ".tmp", "w") as f:
        json.dump(meta, f)
    os.replace(meta_path + ".tmp", meta_path)


def _has_ckpt(save_dir, name):
    return (os.path.exists(os.path.join(save_dir, name + ".msgpack"))
            and os.path.exists(os.path.join(save_dir, name + ".json")))


def _try_resume(save_dir, name, trainable, frozen, opt_state):
    """Restore (trainable, frozen, opt_state, next_epoch) from a `_save`d
    checkpoint if one exists (msgpack round-trips the dict/list param
    trees structurally; optax states go through flax from_state_dict with
    the template).  Checkpoints without a frozen tree (per-epoch 'last')
    pull it from the once-written <task>_frozen.msgpack."""
    from flax import serialization
    if not _has_ckpt(save_dir, name):
        return trainable, frozen, opt_state, 0
    with open(os.path.join(save_dir, name + ".msgpack"), "rb") as f:
        host = serialization.msgpack_restore(f.read())
    trainable = host["trainable"]
    if "frozen" in host:
        frozen = host["frozen"]
    else:
        fr_path = os.path.join(
            save_dir, name.split("_")[0] + "_frozen.msgpack")
        with open(fr_path, "rb") as f:
            frozen = serialization.msgpack_restore(f.read())["frozen"]
    if "opt_state" in host:
        opt_state = serialization.from_state_dict(opt_state,
                                                  host["opt_state"])
    with open(os.path.join(save_dir, name + ".json")) as f:
        start_epoch = int(json.load(f).get("epoch", -1)) + 1
    print(f"Resumed {name} at epoch {start_epoch}")
    return trainable, frozen, opt_state, start_epoch


def _preemption_flag():
    """SIGTERM/SIGINT sets a flag checked at step boundaries (same story
    as the main trainer's install_preemption_handler: TPU pools preempt;
    save a resumable 'last' checkpoint and exit cleanly).  Returns
    (check, restore): `check()` reads the flag; `restore()` reinstates
    the previous handlers — call it on every loop exit so library
    callers (incl. the test suite) keep their Ctrl-C.  Installed only in
    the main thread; no-op elsewhere."""
    import signal
    import threading

    flag = {"hit": False}
    if threading.current_thread() is not threading.main_thread():
        return (lambda: False), (lambda: None)

    def _handler(signum, frame):
        flag["hit"] = True

    old_term = signal.signal(signal.SIGTERM, _handler)
    old_int = signal.signal(signal.SIGINT, _handler)

    def restore():
        signal.signal(signal.SIGTERM, old_term)
        signal.signal(signal.SIGINT, old_int)

    return (lambda: flag["hit"]), restore


def _best_metric(save_dir, name, key):
    """Best-so-far metric from a best checkpoint's meta (resume must not
    reset it to -inf, or the first post-resume eval clobbers a better
    best model)."""
    meta_path = os.path.join(save_dir, name + ".json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return float(json.load(f).get(key, -1.0))
    return -1.0


def train_segmentation(root, epochs=8, img_size=512, batch_size=8, lr=1e-4,
                       weight_decay=1e-4, backbone="vit_large",
                       patch_size=16, partial_size="full", channels=256,
                       save_dir="checkpoints/seg", num_workers=8,
                       log_every=10, eval_batches=None, seed=0,
                       vit_cfg=None, n_devices=1,
                       param_sharding="replicated", resume=False,
                       eval_only=False, eval_img_size=None,
                       eval_stride=None, aux_heads=0, head_lr_mult=1.0,
                       use_fused=False):
    """APLA-SETR-PUP on an ADE20K-layout directory (reference recipe:
    apla_setr_vit-l_pup_8xb2-160k_ade20k-512x512.py — ViT-L backbone,
    'full' APLA = only attn out-projections train)."""
    from .apla.core import AplaConfig
    from .data.segmentation_data import ADE20KSegmentation, segmentation_collate
    from .models.seg import (init_segmenter, make_seg_train_step,
                             segmenter_forward, segmenter_slide_forward)
    from .models.vit import VIT_BUILDERS

    if vit_cfg is not None:
        # an explicit cfg must still honor --use_fused (a silent drop here
        # cost a round-5 review finding)
        cfg = (dataclasses.replace(vit_cfg, use_fused_apla=True)
               if use_fused and not vit_cfg.use_fused_apla else vit_cfg)
    else:
        cfg = VIT_BUILDERS[backbone](img_size=img_size,
                                     patch_size=patch_size,
                                     use_fused_apla=use_fused)
    if use_fused:
        # ViT-L@512 'full' APLA needs the ViT-giant-style VMEM budget for
        # the long kernel's full-k dW_t (~14.9 MB modeled > the 12 MiB
        # default) — without this the flag was a silent XLA no-op unless
        # the user separately exported APLA_FUSED_VMEM_MB=15
        os.environ.setdefault("APLA_FUSED_VMEM_MB", "15")
    train_ds = ADE20KSegmentation(root, "training", img_size=img_size)
    # eval_img_size > img_size: sliding-window eval (the reference seg
    # recipe's test_cfg mode='slide' — train at the crop, eval larger)
    eval_size = int(eval_img_size) if eval_img_size else img_size
    if eval_size < img_size:
        raise ValueError(f"eval_img_size {eval_size} < crop {img_size}")
    val_ds = ADE20KSegmentation(root, "validation", img_size=eval_size)
    loader = DataLoader(train_ds, batch_size=batch_size, shuffle=True,
                        drop_last=True, num_workers=num_workers,
                        collate_fn=segmentation_collate, seed=seed)
    trainable, frozen = init_segmenter(
        jax.random.PRNGKey(seed), cfg, n_classes=train_ds.n_classes,
        apla_cfg=AplaConfig(partial_size=partial_size), channels=channels,
        n_aux_heads=aux_heads)
    mesh, put_batch, place = _mesh_setup(n_devices, param_sharding,
                                         batch_size)
    if head_lr_mult != 1.0:
        # reference recipe: paramwise head lr x10 (apla_setr...py:72)
        labels = {k: jax.tree.map(
                      lambda _: "bb" if k == "backbone" else "head", v)
                  for k, v in trainable.items()}
        tx = optax.multi_transform(
            {"bb": optax.adamw(lr, weight_decay=weight_decay),
             "head": optax.adamw(lr * head_lr_mult,
                                 weight_decay=weight_decay)}, labels)
    else:
        tx = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = tx.init(trainable)
    start_epoch = 0
    if eval_only:
        # the --test analogue: restore the best (fallback: last)
        # checkpoint and report val mIoU without training
        name = "seg_best" if _has_ckpt(save_dir, "seg_best") else "seg_last"
        if not _has_ckpt(save_dir, name):
            raise FileNotFoundError(
                f"--eval_only: no checkpoint under {save_dir}")
        trainable, frozen, _, _ = _try_resume(save_dir, name, trainable,
                                              frozen, opt_state)
    elif resume:
        trainable, frozen, opt_state, start_epoch = _try_resume(
            save_dir, "seg_last", trainable, frozen, opt_state)
    trainable = place(trainable)
    opt_state = place(opt_state)
    frozen = place(frozen, param_sharding)
    step = make_seg_train_step(cfg, tx)

    if eval_size > img_size:
        eval_fwd = jax.jit(lambda t, f, im: jnp.argmax(
            segmenter_slide_forward(t, f, im, cfg, stride=eval_stride),
            axis=-1))
    else:
        eval_fwd = jax.jit(lambda t, f, im: jnp.argmax(
            segmenter_forward(t, f, im, cfg), axis=-1))

    def evaluate():
        from .models.seg import iou_counts, mean_iou_from_counts
        from .parallel.mesh import pad_to_multiple
        inter = union = 0
        vloader = DataLoader(val_ds, batch_size=batch_size, shuffle=False,
                             drop_last=False, num_workers=num_workers,
                             collate_fn=segmentation_collate)
        for i, b in enumerate(vloader):
            if eval_batches is not None and i >= eval_batches:
                break
            n = b["image"].shape[0]
            if n < batch_size:  # pad the tail to the compiled shape
                b, _ = pad_to_multiple(b, batch_size)
            im = put_batch({"image": b["image"]})["image"]
            pred = np.asarray(eval_fwd(trainable, frozen, im))[:n]
            # accumulate pixel counts over the split; divide ONCE —
            # dataset-level mIoU, not a mean of per-batch mIoUs
            bi, bu = iou_counts(pred, b["label"][:n],
                                n_classes=train_ds.n_classes)
            inter = inter + bi
            union = union + bu
        return mean_iou_from_counts(inter, union) \
            if np.ndim(union) else 0.0

    if eval_only:
        miou = evaluate()
        print(f"[seg] eval-only: val mIoU {miou:.4f}")
        return {"best_miou": miou, "iters": 0}

    if not _has_ckpt(save_dir, "seg_frozen"):  # store the backbone ONCE
        _save(save_dir, "seg_frozen", {}, frozen, {})
    from .utils.logging import RunLogger
    preempted, restore_sig = _preemption_flag()
    logger = RunLogger(save_dir, run_name="seg")
    log = lambda rec, step: logger.log(rec, step)
    it, t0 = 0, time.time()
    # under --resume, continue the best-model race from the saved best (a
    # fresh run into the same dir starts the race over, as before)
    best_miou = _best_metric(save_dir, "seg_best", "miou") if resume else -1.0
    for epoch in range(start_epoch, epochs):
        loader.set_epoch(epoch)
        for b in loader:
            batch = put_batch({"image": b["image"], "label": b["label"]})
            trainable, opt_state, m = step(trainable, opt_state, frozen,
                                           batch)
            it += 1
            if it % log_every == 0:
                loss = float(m["loss"])
                rate = it * batch_size / (time.time() - t0)
                print(f"[seg] it {it} ep {epoch} loss {loss:.4f}"
                      f" ({rate:.1f} img/s)")
                log({"epoch": epoch, "train_loss": round(loss, 5),
                     "grad_norm": round(float(m["grad_norm"]), 4),
                     "img_s": round(rate, 1)}, it)
            if preempted():
                # mid-epoch: save resumable state marked at epoch-1 so
                # --resume replays this (partial) epoch from its start
                _save(save_dir, "seg_last", trainable, None,
                      {"epoch": epoch - 1, "miou": best_miou,
                       "preempted": True}, opt_state=opt_state)
                print("[seg] preempted — saved seg_last, exiting")
                restore_sig()
                return {"best_miou": best_miou, "iters": it,
                        "preempted": True}
        miou = evaluate()
        print(f"[seg] epoch {epoch}: val mIoU {miou:.4f}")
        log({"epoch": epoch, "val_miou": round(miou, 5)}, it)
        if miou >= best_miou:
            best_miou = miou
            _save(save_dir, "seg_best", trainable, frozen,
                  {"epoch": epoch, "miou": miou})
        _save(save_dir, "seg_last", trainable, None,
              {"epoch": epoch, "miou": miou}, opt_state=opt_state)
    restore_sig()
    return {"best_miou": best_miou, "iters": it}


def train_detection(img_dir, ann_file, epochs=12, img_size=224,
                    batch_size=8, lr=1e-4, weight_decay=1e-4,
                    window_size=7, embed_dim=96, depths=(2, 2, 6),
                    num_heads=(3, 6, 12), max_boxes=32,
                    save_dir="checkpoints/det", num_workers=8,
                    log_every=10, eval_batches=None, seed=0,
                    swin_ckpt=None, val_img_dir=None, val_ann=None,
                    n_devices=1, param_sharding="replicated",
                    resume=False, eval_only=False, scales=None,
                    masks=False, n_protos=32, use_fused=False, bf16=False):
    """APLA-Swin + FCOS on a COCO-format dataset (reference recipe:
    mask-rcnn_apla_swin-t ... coco.py — Swin backbone with only attn.proj
    trainable).  `masks=True` matches the recipe's `with_mask=True`:
    trains the prototype+coefficient instance-mask branch and reports
    mask mAP@50 beside box mAP@50."""
    from .data.detection_data import CocoDetection, detection_collate
    from .models.detection import (DetectionAP, decode_detections,
                                   fcos_head_forward, init_fcos_head,
                                   init_protonet, protonet_forward,
                                   make_detection_train_step, _conv,
                                   _conv_init)
    from .models.swin import SwinConfig, build_apla_swin, init_swin_params, \
        swin_features

    ds = CocoDetection(img_dir, ann_file, img_size=img_size,
                       max_boxes=max_boxes, with_masks=masks)
    # multi-scale training (reference recipe name: mstrain_480-800): a
    # per-EPOCH scale draw keeps shapes static within each epoch (one
    # compiled step per scale, cached)
    scales = tuple(int(s) for s in scales) if scales else None
    sd = None
    if swin_ckpt:
        # architecture comes from the checkpoint itself
        import torch

        from .utils.pretrained import swin_arch_from_hf_state_dict
        sd = torch.load(swin_ckpt, map_location="cpu", weights_only=True)
        sd = sd.get("state_dict", sd)
        arch = swin_arch_from_hf_state_dict(sd)
        embed_dim = arch["embed_dim"]
        depths = arch["depths"]
        num_heads = arch["num_heads"]
        window_size = arch["window_size"]
        print(f"Swin arch from checkpoint: {arch}")
    # bf16 is the measured-throughput regime (r3_segdet_bench /
    # r5_swin_fused); f32 stays the default for the synthetic-COCO
    # convergence baseline.  use_fused routes window attention + the APLA
    # proj through the fused small-N kernel (interleaved A/B on the chip:
    # det b16 666.7 vs 614.4 img/s XLA, +8.5%; b8 +5.8% — r5_swin_fused).
    cfg = SwinConfig(img_size=img_size, patch_size=4, embed_dim=embed_dim,
                     depths=tuple(depths), num_heads=tuple(num_heads),
                     window_size=window_size,
                     compute_dtype=jnp.bfloat16 if bf16 else jnp.float32,
                     use_fused_apla=use_fused)
    if scales:
        # every stage's feature map must stay window-aligned through the
        # patch mergings (this Swin does not pad): s / (patch * 2^i) must
        # divide by window for all stages i
        align = cfg.patch_size * cfg.window_size * 2 ** (len(depths) - 1)
        bad = [s for s in scales if s % align]
        if bad:
            raise ValueError(f"scales {bad} not divisible by "
                             f"patch*window*2^(stages-1) = {align}")
    loader = DataLoader(ds, batch_size=batch_size, shuffle=True,
                        drop_last=True, num_workers=num_workers,
                        collate_fn=detection_collate, seed=seed)
    key, k_bb = jax.random.split(jax.random.PRNGKey(seed))
    if sd is None:
        swin_params = init_swin_params(k_bb, cfg)
    else:
        # local HF SwinModel checkpoint (torch state_dict) -> our params
        # (oracle-parity-tested importer, tests/test_swin_import.py)
        from .utils.pretrained import convert_swin_hf_state_dict
        swin_params = convert_swin_hf_state_dict(sd, depths=tuple(depths))
        print(f"Imported HF Swin weights from {swin_ckpt}")
    bb_t, bb_f = build_apla_swin(swin_params)
    n_levels = len(depths)
    stage_dims = [embed_dim * (2 ** i) for i in range(n_levels)]
    lat_ch = embed_dim
    keys = jax.random.split(key, n_levels + 1)
    trainable = {
        "backbone": bb_t,
        "head": init_fcos_head(keys[0], lat_ch, ds.n_classes,
                               channels=max(lat_ch // 2, 16),
                               n_levels=n_levels,
                               n_protos=n_protos if masks else 0),
        "laterals": [_conv_init(keys[1 + i], 1, stage_dims[i], lat_ch)
                     for i in range(n_levels)],
    }
    strides = tuple(4 * (2 ** i) for i in range(n_levels))
    if masks:
        trainable["protonet"] = init_protonet(
            jax.random.fold_in(key, 7), lat_ch, n_protos=n_protos)
    mesh, put_batch, place = _mesh_setup(n_devices, param_sharding,
                                         batch_size)
    tx = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = tx.init(trainable)
    start_epoch = 0
    if eval_only:
        name = "det_best" if _has_ckpt(save_dir, "det_best") else "det_last"
        if not _has_ckpt(save_dir, name):
            raise FileNotFoundError(
                f"--eval_only: no checkpoint under {save_dir}")
        trainable, bb_f, _, _ = _try_resume(save_dir, name, trainable,
                                            bb_f, opt_state)
    elif resume:
        trainable, bb_f, opt_state, start_epoch = _try_resume(
            save_dir, "det_last", trainable, bb_f, opt_state)
    trainable = place(trainable)
    opt_state = place(opt_state)
    bb_f = place(bb_f, param_sharding)
    step = make_detection_train_step(cfg, tx, strides=strides,
                                     with_mask=masks)

    def _fwd(t, f, im):
        feats = swin_features(f, im, cfg, trainable=t["backbone"])
        outs = fcos_head_forward(feats, t["head"], t["laterals"])
        protos = (protonet_forward(_conv(feats[0], t["laterals"][0]),
                                   t["protonet"]) if masks else None)
        return outs, protos

    fwd = jax.jit(_fwd)

    # a real validation split when provided; otherwise eval reuses the
    # train set and is LABELLED as such (best-checkpoint selection then
    # follows train fit — supply val assets for honest model selection)
    val_ds = (CocoDetection(val_img_dir, val_ann, img_size=img_size,
                            max_boxes=max_boxes, with_masks=masks)
              if val_img_dir and val_ann else ds)
    eval_name = "val" if val_ds is not ds else "train"

    def evaluate():
        """Box mAP@50 — and, with masks on, instance-mask mAP@50 (the
        metric pair of the reference's Mask R-CNN recipe)."""
        from .parallel.mesh import pad_to_multiple
        metric = DetectionAP(ds.n_classes)
        mask_metric = DetectionAP(ds.n_classes, use_masks=True) \
            if masks else None
        # eval always at the base size (val_ds may BE the train ds, whose
        # img_size the multi-scale draw mutates per epoch)
        prev_size = val_ds.img_size
        val_ds.img_size = img_size
        vloader = DataLoader(val_ds, batch_size=batch_size, shuffle=False,
                             drop_last=False, num_workers=num_workers,
                             collate_fn=detection_collate)
        for i, b in enumerate(vloader):
            if eval_batches is not None and i >= eval_batches:
                break
            n = b["image"].shape[0]
            if n < batch_size:  # pad the tail to the compiled shape
                b, _ = pad_to_multiple(b, batch_size)
            im = put_batch({"image": b["image"]})["image"]
            outs, protos = fwd(trainable, bb_f, im)
            for j in range(n):
                per_img = [tuple(o[j:j + 1] for o in lvl) for lvl in outs]
                keep = b["labels"][j] >= 0
                if masks:
                    boxes, scores, labels, pmasks = decode_detections(
                        per_img, strides, protos=protos[j:j + 1],
                        mask_stride=strides[0])
                    mask_metric.add_image(
                        i * batch_size + j, boxes, scores, labels,
                        b["boxes"][j][keep], b["labels"][j][keep],
                        pred_masks=pmasks, gt_masks=b["masks"][j][keep])
                else:
                    boxes, scores, labels = decode_detections(per_img,
                                                              strides)
                metric.add_image(i * batch_size + j, boxes, scores, labels,
                                 b["boxes"][j][keep], b["labels"][j][keep])
        val_ds.img_size = prev_size
        box_ap = metric.mean_ap()
        return (box_ap, mask_metric.mean_ap()) if masks else (box_ap, None)

    if eval_only:
        ap, mask_ap = evaluate()
        msg = f"[det] eval-only: {eval_name} mAP@50 {ap:.4f}"
        out = {"best_map50": ap, "iters": 0, "eval_set": eval_name}
        if masks:
            msg += f" mask mAP@50 {mask_ap:.4f}"
            out["best_mask_map50"] = mask_ap
        print(msg)
        return out

    if not _has_ckpt(save_dir, "det_frozen"):  # store the backbone ONCE
        _save(save_dir, "det_frozen", {}, bb_f, {})
    from .utils.logging import RunLogger
    preempted, restore_sig = _preemption_flag()
    logger = RunLogger(save_dir, run_name="det")
    log = lambda rec, step: logger.log(rec, step)
    it, t0 = 0, time.time()
    # with masks on, the best-model race runs on mask mAP (the recipe's
    # instance-segmentation target); box mAP is always reported beside it
    best_key = "mask_map50" if masks else "map50"
    best_map = _best_metric(save_dir, "det_best", best_key) if resume \
        else -1.0
    # the best checkpoint's box mAP is reported beside the mask selection
    # metric; on resume it must come from the checkpoint meta, or a run
    # whose resumed epochs never beat the saved best reports -1.0
    best_box = _best_metric(save_dir, "det_best", "map50") if resume \
        else -1.0
    for epoch in range(start_epoch, epochs):
        if scales:
            # per-epoch seed -> the scale sequence is a pure function of
            # (seed, epoch): --resume replays it exactly
            ds.img_size = int(
                np.random.default_rng((seed, epoch)).choice(scales))
            print(f"[det] epoch {epoch}: train scale {ds.img_size}")
        loader.set_epoch(epoch)
        for b in loader:
            dev_b = {"image": b["image"], "boxes": b["boxes"],
                     "labels": b["labels"]}
            if masks:
                dev_b["masks"] = b["masks"]
            batch = put_batch(dev_b)
            trainable, opt_state, m = step(trainable, opt_state, bb_f, batch)
            it += 1
            if it % log_every == 0:
                loss = float(m["total"])
                rate = it * batch_size / (time.time() - t0)
                extra = (f" mask {float(m['mask_loss']):.4f}"
                         if masks else "")
                print(f"[det] it {it} ep {epoch} "
                      f"loss {loss:.4f}{extra} ({rate:.1f} img/s)")
                rec = {"epoch": epoch, "train_loss": round(loss, 5),
                       "cls_loss": round(float(m["cls_loss"]), 5),
                       "img_s": round(rate, 1)}
                if masks:
                    rec["mask_loss"] = round(float(m["mask_loss"]), 5)
                log(rec, it)
            if preempted():
                _save(save_dir, "det_last", trainable, None,
                      {"epoch": epoch - 1, best_key: best_map,
                       "preempted": True}, opt_state=opt_state)
                print("[det] preempted — saved det_last, exiting")
                restore_sig()
                out = {"best_map50": best_box if masks else best_map,
                       "iters": it, "preempted": True,
                       "eval_set": eval_name}
                if masks:
                    out["best_mask_map50"] = best_map
                return out
        ap, mask_ap = evaluate()
        sel = mask_ap if masks else ap
        msg = f"[det] epoch {epoch}: {eval_name} mAP@50 {ap:.4f}"
        rec = {"epoch": epoch, f"{eval_name}_map50": round(ap, 5)}
        if masks:
            msg += f" mask mAP@50 {mask_ap:.4f}"
            rec[f"{eval_name}_mask_map50"] = round(mask_ap, 5)
        print(msg)
        log(rec, it)
        meta = {"epoch": epoch, "map50": ap}
        if masks:
            meta["mask_map50"] = mask_ap
        if sel >= best_map:
            best_map = sel
            best_box = ap
            _save(save_dir, "det_best", trainable, bb_f, meta)
        _save(save_dir, "det_last", trainable, None, meta,
              opt_state=opt_state)
    restore_sig()
    out = {"best_map50": best_box if masks else best_map, "iters": it,
           "eval_set": eval_name}
    if masks:
        out["best_mask_map50"] = best_map
    return out


def main(argv=None):
    p = argparse.ArgumentParser(prog="apla_tpu.segdet")
    sub = p.add_subparsers(dest="task", required=True)
    ps = sub.add_parser("seg")
    ps.add_argument("--root", required=True)
    ps.add_argument("--epochs", type=int, default=8)
    ps.add_argument("--img_size", type=int, default=512)
    ps.add_argument("--batch_size", type=int, default=8)
    ps.add_argument("--lr", type=float, default=1e-4)
    ps.add_argument("--backbone", default="vit_large")
    ps.add_argument("--patch_size", type=int, default=16)
    ps.add_argument("--save_dir", default="checkpoints/seg")
    ps.add_argument("--n_devices", type=int, default=1,
                    help="data-parallel mesh size (1 = single device)")
    ps.add_argument("--param_sharding", default="replicated",
                    choices=("replicated", "fsdp"),
                    help="frozen-backbone placement on the mesh")
    ps.add_argument("--resume", action="store_true",
                    help="continue from <save_dir>/seg_last if present")
    ps.add_argument("--eval_only", action="store_true",
                    help="restore the best checkpoint and report val mIoU")
    ps.add_argument("--eval_img_size", type=int, default=None,
                    help="evaluate at this size with sliding windows of "
                         "the training crop (reference test_cfg "
                         "mode='slide')")
    ps.add_argument("--eval_stride", type=int, default=None,
                    help="slide stride (default 2/3 of the crop)")
    ps.add_argument("--aux_heads", type=int, default=0,
                    help="auxiliary SETR-UP decoders on intermediate "
                         "layers (reference recipe: 3, loss weight 0.4)")
    ps.add_argument("--use_fused", action="store_true",
                    help="route backbone attention through the fused APLA "
                         "kernels (ViT-L@512 lands on the long q-strip "
                         "kernel; sets APLA_FUSED_VMEM_MB=15 for the "
                         "full-k dW_t unless already set; measured "
                         "step-neutral at ViT-L@512 — r5_seg_fused.jsonl)")
    ps.add_argument("--head_lr_mult", type=float, default=1.0,
                    help="decoder-head lr multiplier (reference: 10)")
    pd = sub.add_parser("det")
    pd.add_argument("--img_dir", required=True)
    pd.add_argument("--ann", required=True)
    pd.add_argument("--epochs", type=int, default=12)
    pd.add_argument("--img_size", type=int, default=224)
    pd.add_argument("--batch_size", type=int, default=8)
    pd.add_argument("--lr", type=float, default=1e-4)
    pd.add_argument("--save_dir", default="checkpoints/det")
    pd.add_argument("--swin_ckpt", help="local HF SwinModel state_dict .pth")
    pd.add_argument("--val_img_dir")
    pd.add_argument("--val_ann")
    pd.add_argument("--n_devices", type=int, default=1,
                    help="data-parallel mesh size (1 = single device)")
    pd.add_argument("--param_sharding", default="replicated",
                    choices=("replicated", "fsdp"),
                    help="frozen-backbone placement on the mesh")
    pd.add_argument("--resume", action="store_true",
                    help="continue from <save_dir>/det_last if present")
    pd.add_argument("--eval_only", action="store_true",
                    help="restore the best checkpoint and report mAP@50")
    pd.add_argument("--embed_dim", type=int, default=96)
    pd.add_argument("--depths", default="2,2,6")
    pd.add_argument("--num_heads", default="3,6,12")
    pd.add_argument("--window_size", type=int, default=7)
    pd.add_argument("--scales", default=None,
                    help="comma list for multi-scale training (reference "
                         "mstrain; per-epoch draw, e.g. 196,224,252 — "
                         "must divide by patch*window*2^(stages-1), e.g. 224/448 for the 4-stage w7 recipe)")
    pd.add_argument("--masks", action="store_true",
                    help="train the instance-mask branch and report mask "
                         "mAP@50 (reference recipe with_mask=True)")
    pd.add_argument("--n_protos", type=int, default=32,
                    help="prototype-mask channels for --masks")
    pd.add_argument("--use_fused", action="store_true",
                    help="route Swin window attention + the APLA proj "
                         "through the fused small-N kernel (measured "
                         "+8.5% det b16 / +5.8% b8 at bf16 — "
                         "r5_swin_fused.jsonl; pair with --bf16)")
    pd.add_argument("--bf16", action="store_true",
                    help="bf16 backbone compute (the benchmarked regime; "
                         "default f32 matches the convergence baseline)")
    args = p.parse_args(argv)
    if args.task == "seg":
        out = train_segmentation(
            args.root, epochs=args.epochs, img_size=args.img_size,
            batch_size=args.batch_size, lr=args.lr, backbone=args.backbone,
            patch_size=args.patch_size, save_dir=args.save_dir,
            n_devices=args.n_devices, param_sharding=args.param_sharding,
            resume=args.resume, eval_only=args.eval_only,
            eval_img_size=args.eval_img_size, eval_stride=args.eval_stride,
            aux_heads=args.aux_heads, head_lr_mult=args.head_lr_mult,
            use_fused=args.use_fused)
    else:
        out = train_detection(
            args.img_dir, args.ann, epochs=args.epochs,
            img_size=args.img_size, batch_size=args.batch_size, lr=args.lr,
            save_dir=args.save_dir, swin_ckpt=args.swin_ckpt,
            val_img_dir=args.val_img_dir, val_ann=args.val_ann,
            embed_dim=args.embed_dim,
            depths=tuple(int(d) for d in args.depths.split(",")),
            num_heads=tuple(int(h) for h in args.num_heads.split(",")),
            window_size=args.window_size,
            n_devices=args.n_devices, param_sharding=args.param_sharding,
            resume=args.resume, eval_only=args.eval_only,
            scales=(args.scales.split(",") if args.scales else None),
            masks=args.masks, n_protos=args.n_protos,
            use_fused=args.use_fused, bf16=args.bf16)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
