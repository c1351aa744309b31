"""End-to-end side-car training loops (apla_tpu/segdet.py): tiny ADE/COCO
fixtures through the full train/eval/checkpoint path."""

import json
import os

import jax
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
    # JSONL metrics stream (RunLogger, same surface as the main trainer)
    rows = [json.loads(line)
            for line in open(tmp_path / "ck" / "seg.metrics.jsonl")]
    assert any("train_loss" in r for r in rows)
    assert any("val_miou" in r for r in rows)


def test_seg_step_fsdp_mesh_matches_single_device():
    """One seg train step with the frozen backbone FSDP-sharded on a
    2-device mesh must reproduce the single-device update (the side-car
    analogue of tests/test_parallel.py's supervised fsdp parity)."""
    import jax
    import optax

    from apla_tpu.apla.core import AplaConfig
    from apla_tpu.models.seg import init_segmenter, make_seg_train_step
    from apla_tpu.parallel.mesh import (fsdp_sharding_tree, make_mesh,
                                        shard_batch, shard_params)

    # embed_dim 128 -> stacked fc1 kernel [2,128,512] = 131072 elems, above
    # the fsdp min_size, so the placement genuinely shards
    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=128, depth=2,
                    num_heads=4, compute_dtype=jnp.float32)
    trainable, frozen = init_segmenter(
        jax.random.PRNGKey(0), cfg, n_classes=5,
        apla_cfg=AplaConfig(partial_size=16), channels=16)
    tx = optax.adamw(1e-3)
    step = make_seg_train_step(cfg, tx)
    rng = np.random.default_rng(0)
    batch_np = {"image": rng.standard_normal((4, 32, 32, 3)).astype("f4"),
                "label": rng.integers(0, 5, (4, 32, 32)).astype("i4")}

    t1, o1, m1 = step(trainable, tx.init(trainable), frozen,
                      jax.tree.map(jnp.asarray, batch_np))

    # the step donates (trainable, opt_state) — re-init identically (same
    # PRNGKey) for the mesh run rather than reusing the donated buffers
    trainable, frozen = init_segmenter(
        jax.random.PRNGKey(0), cfg, n_classes=5,
        apla_cfg=AplaConfig(partial_size=16), channels=16)
    mesh = make_mesh(n_data=2, devices=jax.devices()[:2])
    from jax.sharding import PartitionSpec as P
    specs = [s.spec for s in jax.tree.leaves(fsdp_sharding_tree(mesh, frozen))]
    assert any(s != P() for s in specs), "nothing sharded at this scale"
    t2, o2, m2 = step(shard_params(trainable, mesh),
                      shard_params(tx.init(trainable), mesh),
                      shard_params(frozen, mesh, policy="fsdp"),
                      shard_batch(batch_np, mesh))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(t1), jax.tree.leaves(t2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_segmentation_loop_on_mesh(tmp_path):
    """The runnable seg loop end-to-end on a 2-device DP mesh with the
    frozen backbone FSDP-sharded (--n_devices/--param_sharding)."""
    from apla_tpu.segdet import train_segmentation
    root = make_ade(tmp_path)
    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2,
                    num_heads=4, compute_dtype=jnp.float32)
    out = train_segmentation(
        root, epochs=1, img_size=32, batch_size=2, lr=1e-3,
        save_dir=str(tmp_path / "ck"), num_workers=2, log_every=1,
        vit_cfg=cfg, n_devices=2, param_sharding="fsdp")
    assert out["iters"] == 2
    assert 0.0 <= out["best_miou"] <= 1.0
    assert os.path.exists(tmp_path / "ck" / "seg_best.msgpack")


def test_detection_loop_on_mesh(tmp_path):
    from apla_tpu.segdet import train_detection
    img_dir, ann = make_coco(tmp_path)
    out = train_detection(
        img_dir, ann, epochs=1, img_size=56, batch_size=2, lr=1e-3,
        embed_dim=32, depths=(2, 2), num_heads=(2, 4),
        save_dir=str(tmp_path / "ck"), num_workers=2, log_every=1,
        n_devices=2, param_sharding="fsdp")
    assert out["iters"] == 2
    assert 0.0 <= out["best_map50"] <= 1.0


def test_segmentation_resume_matches_uninterrupted(tmp_path):
    """1 epoch + --resume for a 2nd == 2 uninterrupted epochs: seg_last
    carries trainable+opt_state+epoch, loader order is epoch-seeded."""
    from flax import serialization

    from apla_tpu.segdet import train_segmentation
    root = make_ade(tmp_path)
    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2,
                    num_heads=4, compute_dtype=jnp.float32)
    kw = dict(img_size=32, batch_size=2, lr=1e-3, num_workers=2,
              log_every=10, vit_cfg=cfg)

    train_segmentation(root, epochs=2, save_dir=str(tmp_path / "full"), **kw)
    train_segmentation(root, epochs=1, save_dir=str(tmp_path / "part"), **kw)
    out = train_segmentation(root, epochs=2, save_dir=str(tmp_path / "part"),
                             resume=True, **kw)
    assert out["iters"] == 2  # only the second epoch ran

    def last(d):
        with open(tmp_path / d / "seg_last.msgpack", "rb") as f:
            return serialization.msgpack_restore(f.read())

    a, b = last("full"), last("part")
    for x, y in zip(jax.tree.leaves(a["trainable"]),
                    jax.tree.leaves(b["trainable"])):
        np.testing.assert_allclose(x, y, rtol=1e-6, atol=1e-7)


def test_segmentation_resume_on_mesh(tmp_path):
    """--resume composes with the mesh placement: restore happens on host,
    then params are re-placed (fsdp frozen) for the continued epochs."""
    from apla_tpu.segdet import train_segmentation
    root = make_ade(tmp_path)
    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2,
                    num_heads=4, compute_dtype=jnp.float32)
    kw = dict(img_size=32, batch_size=2, lr=1e-3, num_workers=2,
              log_every=10, vit_cfg=cfg, n_devices=2,
              param_sharding="fsdp", save_dir=str(tmp_path / "ck"))
    train_segmentation(root, epochs=1, **kw)
    out = train_segmentation(root, epochs=2, resume=True, **kw)
    assert out["iters"] == 2  # only the resumed epoch ran
    assert 0.0 <= out["best_miou"] <= 1.0


def test_preemption_flag_sets_on_sigterm():
    """The segdet loops' preemption flag trips on SIGTERM (step-boundary
    save semantics are exercised via the --resume path)."""
    import signal
    import time

    from apla_tpu.segdet import _preemption_flag
    old_term = signal.getsignal(signal.SIGTERM)
    old_int = signal.getsignal(signal.SIGINT)
    try:
        flag, restore = _preemption_flag()
        assert not flag()
        os.kill(os.getpid(), signal.SIGTERM)
        time.sleep(0.05)  # let the interpreter deliver the signal
        assert flag()
        restore()
        assert signal.getsignal(signal.SIGTERM) is old_term
    finally:
        signal.signal(signal.SIGTERM, old_term)
        signal.signal(signal.SIGINT, old_int)


def test_segmentation_slide_eval(tmp_path):
    """--eval_img_size: train at the crop, evaluate larger with sliding
    windows (reference test_cfg mode='slide')."""
    from apla_tpu.segdet import train_segmentation
    root = make_ade(tmp_path)
    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2,
                    num_heads=4, compute_dtype=jnp.float32)
    out = train_segmentation(
        root, epochs=1, img_size=32, batch_size=2, lr=1e-3,
        save_dir=str(tmp_path / "ck"), num_workers=2, log_every=1,
        vit_cfg=cfg, eval_img_size=48)
    assert out["iters"] == 2
    assert 0.0 <= out["best_miou"] <= 1.0


def test_segmentation_eval_only(tmp_path):
    """--eval_only restores the best checkpoint and reports mIoU without
    training; errors clearly when no checkpoint exists."""
    import pytest

    from apla_tpu.segdet import train_segmentation
    root = make_ade(tmp_path)
    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2,
                    num_heads=4, compute_dtype=jnp.float32)
    kw = dict(img_size=32, batch_size=2, lr=1e-3, num_workers=2,
              log_every=10, vit_cfg=cfg)
    train_segmentation(root, epochs=1, save_dir=str(tmp_path / "ck"), **kw)
    out = train_segmentation(root, epochs=1, save_dir=str(tmp_path / "ck"),
                             eval_only=True, **kw)
    assert out["iters"] == 0 and 0.0 <= out["best_miou"] <= 1.0
    with pytest.raises(FileNotFoundError, match="eval_only"):
        train_segmentation(root, epochs=1,
                           save_dir=str(tmp_path / "nope"),
                           eval_only=True, **kw)


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


def test_detection_loop_fused_bf16_flags(tmp_path):
    """`--use_fused --bf16` plumbing (the r5_swin_fused-validated regime):
    the loop runs with the fused knob on (off-TPU it falls back to XLA
    automatically — the admission requires a TPU backend) and bf16
    backbone compute, producing finite metrics and a checkpoint."""
    from apla_tpu.segdet import train_detection
    img_dir, ann = make_coco(tmp_path)
    out = train_detection(
        img_dir, ann, epochs=1, img_size=56, batch_size=2, lr=1e-3,
        embed_dim=32, depths=(2, 2), num_heads=(2, 4),
        save_dir=str(tmp_path / "ck"), num_workers=2, log_every=1,
        use_fused=True, bf16=True)
    assert out["iters"] == 2
    assert 0.0 <= out["best_map50"] <= 1.0
    assert os.path.exists(tmp_path / "ck" / "det_best.msgpack")


def test_detection_masks_loop_and_resume(tmp_path):
    """--masks end to end: the loop trains the instance-mask branch,
    reports BOTH metrics, and --resume restores the saved best BOX mAP
    beside the mask selection metric (regression: a resumed run whose
    epochs never beat the saved best used to report best_map50=-1.0)."""
    from apla_tpu.segdet import train_detection
    from tests.test_detection_masks import make_coco_masks
    img_dir, ann = make_coco_masks(tmp_path)
    kw = dict(img_size=56, batch_size=3, lr=1e-3, embed_dim=32,
              depths=(2, 2), num_heads=(2, 4),
              save_dir=str(tmp_path / "ck"), num_workers=2, log_every=1,
              masks=True, n_protos=8)
    out = train_detection(img_dir, ann, epochs=1, **kw)
    assert out["iters"] == 1
    assert 0.0 <= out["best_map50"] <= 1.0
    assert 0.0 <= out["best_mask_map50"] <= 1.0
    # the saved meta carries both metrics for the resume path
    meta = json.loads((tmp_path / "ck" / "det_best.json").read_text())
    assert {"map50", "mask_map50"} <= set(meta)
    # force the saved best to be unbeatable -> the resumed epoch cannot
    # win the best-model race, and the reported bests must come from the
    # checkpoint meta, not -1.0 sentinels
    meta["mask_map50"], meta["map50"] = 2.0, 0.75
    (tmp_path / "ck" / "det_best.json").write_text(json.dumps(meta))
    out = train_detection(img_dir, ann, epochs=2, resume=True, **kw)
    assert out["iters"] == 1  # only the resumed epoch ran
    assert out["best_mask_map50"] == 2.0
    assert out["best_map50"] == 0.75


def test_detection_multi_scale(tmp_path):
    """--scales: per-epoch multi-scale training (mstrain analogue) — the
    step compiles per scale, boxes stay in resized coords, eval runs at
    the base size."""
    import pytest

    from apla_tpu.segdet import train_detection
    img_dir, ann = make_coco(tmp_path)
    out = train_detection(
        img_dir, ann, epochs=2, img_size=56, batch_size=2, lr=1e-3,
        embed_dim=32, depths=(2, 2), num_heads=(2, 4),
        save_dir=str(tmp_path / "ck"), num_workers=2, log_every=1,
        scales=(56, 112))
    assert out["iters"] == 4
    assert 0.0 <= out["best_map50"] <= 1.0
    with pytest.raises(ValueError, match="not divisible"):
        train_detection(img_dir, ann, epochs=1, img_size=56, batch_size=2,
                        embed_dim=32, depths=(2, 2), num_heads=(2, 4),
                        save_dir=str(tmp_path / "ck2"), scales=(84,))


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
