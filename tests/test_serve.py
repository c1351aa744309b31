"""Serving-export round trip: jax.export artifact == live forward.

The artifact must reproduce the live model's logits/embeddings exactly
(same program, same params), chunk requests over the exported batch
sizes without recompiling, and be loadable WITHOUT the model code path
(params restored template-free).  Reference analogue: the --test /
feature-bank eval paths (`src/defaults/trainer.py:247-345,347-455`).
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apla_tpu.apla.core import AplaConfig
from apla_tpu.models.classifier import classifier_forward, init_classifier
from apla_tpu.models.vit import ViTConfig
from apla_tpu.serve import export_classifier, load_predictor


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2,
                    num_heads=4, compute_dtype=jnp.float32)
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg, n_classes=7,
        apla_cfg=AplaConfig(partial_size=8))
    path = str(tmp_path_factory.mktemp("serve") / "artifact")
    meta = export_classifier(path, trainable, frozen, cfg,
                             batch_sizes=(2, 4))
    return path, meta, trainable, frozen, cfg


def test_meta_contents(artifact):
    _, meta, _, _, cfg = artifact
    assert meta["n_classes"] == 7
    assert meta["batch_sizes"] == [2, 4]
    assert meta["img_size"] == cfg.img_size
    assert meta["embed_dim"] == cfg.embed_dim


def test_round_trip_matches_live_forward(artifact):
    path, _, trainable, frozen, cfg = artifact
    pred = load_predictor(path)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3)),
                   np.float32)
    live_logits, live_emb = classifier_forward(
        trainable, frozen, jnp.asarray(x), cfg, return_embedding=True)
    np.testing.assert_allclose(pred.predict(x), np.asarray(live_logits),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(pred.embed(x), np.asarray(live_emb),
                               rtol=1e-5, atol=1e-5)


def test_chunking_and_padding(artifact):
    """Request sizes that hit every chunk path: exact multiple, tail pad,
    below the smallest batch, and empty."""
    path, _, trainable, frozen, cfg = artifact
    pred = load_predictor(path)
    for n in (1, 2, 3, 4, 5, 7):
        x = np.asarray(
            jax.random.normal(jax.random.PRNGKey(n), (n, 32, 32, 3)),
            np.float32)
        live = np.asarray(classifier_forward(
            trainable, frozen, jnp.asarray(x), cfg))
        got = pred.predict(x)
        assert got.shape == (n, 7)
        np.testing.assert_allclose(got, live, rtol=1e-5, atol=1e-5)
    empty = pred.predict(np.zeros((0, 32, 32, 3), np.float32))
    assert empty.shape == (0, 7)


def test_quantized_export_matches_quantized_forward(artifact, tmp_path):
    """--quantize_frozen: the artifact stores int8 frozen kernels (smaller
    params file) and the exported program reproduces the live W8A8
    forward exactly."""
    import os

    from apla_tpu.ops.quant import quantize_frozen_backbone

    base_path, _, trainable, frozen, cfg = artifact
    qpath = str(tmp_path / "artifact_q")
    meta = export_classifier(qpath, trainable, frozen, cfg,
                             batch_sizes=(2, 4), quantize_frozen=True)
    assert meta["quantized_frozen"] is True

    base_sz = os.path.getsize(os.path.join(base_path, "params.msgpack"))
    q_sz = os.path.getsize(os.path.join(qpath, "params.msgpack"))
    assert q_sz < base_sz  # qkv/fc kernels stored int8

    pred = load_predictor(qpath)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (4, 32, 32, 3)),
                   np.float32)
    frozen_q = quantize_frozen_backbone(frozen)
    live = np.asarray(classifier_forward(trainable, frozen_q,
                                         jnp.asarray(x), cfg))
    np.testing.assert_allclose(pred.predict(x), live, rtol=1e-5, atol=1e-5)
    # quantization error is real but bounded: same top-1 as the float path
    float_logits = np.asarray(classifier_forward(trainable, frozen,
                                                 jnp.asarray(x), cfg))
    assert (np.argmax(live, -1) == np.argmax(float_logits, -1)).mean() >= 0.5

    # already-quantized tree: export must not double-quantize
    q2 = str(tmp_path / "artifact_q2")
    export_classifier(q2, trainable, frozen_q, cfg, batch_sizes=(2,),
                      quantize_frozen=True)
    pred2 = load_predictor(q2)
    np.testing.assert_allclose(pred2.predict(x), live, rtol=1e-5, atol=1e-5)


def test_segmenter_export_round_trip(tmp_path):
    """export_segmenter: the artifact reproduces the live SETR-PUP forward,
    chunks over batch sizes, and loads back as a SegPredictor (masks =
    argmax class map).  Also drives the export_seg CLI from a segdet
    checkpoint msgpack."""
    from apla_tpu.models.seg import init_segmenter, segmenter_forward
    from apla_tpu.serve import SegPredictor, export_segmenter

    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2,
                    num_heads=4, compute_dtype=jnp.float32)
    trainable, frozen = init_segmenter(
        jax.random.PRNGKey(0), cfg, n_classes=5, channels=16)
    path = str(tmp_path / "seg_artifact")
    meta = export_segmenter(path, trainable, frozen, cfg, batch_sizes=(2,))
    assert meta["task"] == "segmenter" and meta["n_classes"] == 5

    pred = load_predictor(path)
    assert isinstance(pred, SegPredictor)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (3, 32, 32, 3)),
                   np.float32)
    live = np.asarray(segmenter_forward(trainable, frozen, jnp.asarray(x),
                                        cfg))
    got = pred.predict(x)
    assert got.shape == (3, 32, 32, 5)
    np.testing.assert_allclose(got, live, rtol=1e-5, atol=1e-5)
    m = pred.masks(x)
    assert m.shape == (3, 32, 32) and m.dtype == np.int32
    np.testing.assert_array_equal(m, np.argmax(live, -1))
    with pytest.raises(NotImplementedError):
        pred.embed(x)

    # CLI path: segdet checkpoint msgpack -> artifact
    from apla_tpu.segdet import _save
    from apla_tpu.serve import main as serve_main
    _save(str(tmp_path / "ck"), "seg_best", trainable, frozen, {"epoch": 0})
    from apla_tpu.models.vit import VIT_BUILDERS
    VIT_BUILDERS["_test_seg"] = lambda **kw: ViTConfig(
        embed_dim=64, depth=2, num_heads=4, compute_dtype=jnp.float32, **kw)
    try:
        serve_main(["export_seg", "--ckpt",
                    str(tmp_path / "ck" / "seg_best.msgpack"),
                    "--backbone", "_test_seg", "--img_size", "32",
                    "--patch_size", "8",
                    "--out", str(tmp_path / "cli_artifact"),
                    "--batch_sizes", "2"])
    finally:
        del VIT_BUILDERS["_test_seg"]
    pred2 = load_predictor(str(tmp_path / "cli_artifact"))
    np.testing.assert_allclose(pred2.predict(x), live, rtol=1e-5, atol=1e-5)


def test_detector_export_round_trip(tmp_path):
    """export_detector: raw per-level FCOS maps from the artifact match
    the live forward; `detect` decodes boxes host-side."""
    from apla_tpu.models.detection import (_conv_init, fcos_head_forward,
                                           init_fcos_head)
    from apla_tpu.models.swin import (SwinConfig, build_apla_swin,
                                      init_swin_params, swin_features)
    from apla_tpu.serve import DetPredictor, export_detector

    cfg = SwinConfig(img_size=56, patch_size=4, embed_dim=32,
                     depths=(2, 2), num_heads=(2, 4), window_size=7,
                     compute_dtype=jnp.float32)
    swin_params = init_swin_params(jax.random.PRNGKey(0), cfg)
    bb_t, bb_f = build_apla_swin(swin_params)
    trainable = {
        "backbone": bb_t,
        "head": init_fcos_head(jax.random.PRNGKey(1), 32, 3, channels=16,
                               n_levels=2),
        "laterals": [_conv_init(jax.random.PRNGKey(5), 1, 32, 32),
                     _conv_init(jax.random.PRNGKey(6), 1, 64, 32)],
    }
    strides = (4, 8)
    path = str(tmp_path / "det_artifact")
    meta = export_detector(path, trainable, bb_f, cfg, strides,
                           batch_sizes=(2,))
    assert meta["task"] == "detector"
    assert meta["strides"] == [4, 8] and meta["n_classes"] == 3

    pred = load_predictor(path)
    assert isinstance(pred, DetPredictor)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (3, 56, 56, 3)),
                   np.float32)
    live = fcos_head_forward(
        swin_features(bb_f, jnp.asarray(x), cfg, trainable=bb_t),
        trainable["head"], trainable["laterals"])
    got = pred.predict(x)
    assert len(got) == 2
    for lvl in range(2):
        for j in range(3):
            np.testing.assert_allclose(got[lvl][j],
                                       np.asarray(live[lvl][j]),
                                       rtol=1e-4, atol=1e-4)
    dets = pred.detect(x, score_thresh=0.0, top_k=5)
    assert len(dets) == 3
    boxes, scores, labels = dets[0]
    assert boxes.shape[-1] == 4 and len(scores) == len(labels)
    with pytest.raises(NotImplementedError):
        pred.embed(x)

    # --quantize_frozen on the Swin backbone: smaller params, round-trip
    # matches the quantized live forward
    from apla_tpu.ops.quant import quantize_frozen_backbone
    qpath = str(tmp_path / "det_artifact_q")
    meta_q = export_detector(qpath, trainable, bb_f, cfg, strides,
                             batch_sizes=(2,), quantize_frozen=True)
    assert meta_q["quantized_frozen"] is True
    assert (os.path.getsize(os.path.join(qpath, "params.msgpack"))
            < os.path.getsize(os.path.join(path, "params.msgpack")))
    pred_q = load_predictor(qpath)
    live_q = fcos_head_forward(
        swin_features(quantize_frozen_backbone(bb_f), jnp.asarray(x), cfg,
                      trainable=bb_t),
        trainable["head"], trainable["laterals"])
    got_q = pred_q.predict(x)
    for lvl in range(2):
        for j in range(3):
            np.testing.assert_allclose(got_q[lvl][j],
                                       np.asarray(live_q[lvl][j]),
                                       rtol=1e-4, atol=1e-4)


def test_detector_mask_export_round_trip(tmp_path):
    """A --masks checkpoint (protonet in the trainable tree) exports
    coefficient maps + prototype tensors; `detect` returns instance
    masks (reference recipe `with_mask=True`)."""
    from apla_tpu.models.detection import (_conv, _conv_init,
                                           fcos_head_forward,
                                           init_fcos_head, init_protonet,
                                           protonet_forward)
    from apla_tpu.models.swin import (SwinConfig, build_apla_swin,
                                      init_swin_params, swin_features)
    from apla_tpu.serve import DetPredictor, export_detector

    cfg = SwinConfig(img_size=56, patch_size=4, embed_dim=32,
                     depths=(2, 2), num_heads=(2, 4), window_size=7,
                     compute_dtype=jnp.float32)
    swin_params = init_swin_params(jax.random.PRNGKey(0), cfg)
    bb_t, bb_f = build_apla_swin(swin_params)
    trainable = {
        "backbone": bb_t,
        "head": init_fcos_head(jax.random.PRNGKey(1), 32, 3, channels=16,
                               n_levels=2, n_protos=8),
        "laterals": [_conv_init(jax.random.PRNGKey(5), 1, 32, 32),
                     _conv_init(jax.random.PRNGKey(6), 1, 64, 32)],
        "protonet": init_protonet(jax.random.PRNGKey(7), 32, n_protos=8,
                                  channels=16),
    }
    strides = (4, 8)
    path = str(tmp_path / "det_mask_artifact")
    meta = export_detector(path, trainable, bb_f, cfg, strides,
                           batch_sizes=(2,))
    assert meta["with_masks"] is True

    pred = load_predictor(path)
    assert isinstance(pred, DetPredictor)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (3, 56, 56, 3)),
                   np.float32)
    feats = swin_features(bb_f, jnp.asarray(x), cfg, trainable=bb_t)
    live = fcos_head_forward(feats, trainable["head"],
                             trainable["laterals"])
    live_protos = protonet_forward(
        _conv(feats[0], trainable["laterals"][0]), trainable["protonet"])
    got = pred.predict(x)
    assert all(len(lvl) == 4 for lvl in got)  # coef map per level
    for lvl in range(2):
        for j in range(4):
            np.testing.assert_allclose(got[lvl][j],
                                       np.asarray(live[lvl][j]),
                                       rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(pred.predict_protos(x),
                               np.asarray(live_protos),
                               rtol=1e-4, atol=1e-4)
    dets = pred.detect(x, score_thresh=0.0, top_k=5)
    assert len(dets) == 3
    boxes, scores, labels, masks = dets[0]
    assert masks.shape == (len(boxes), 14, 14) and masks.dtype == bool


def test_cli_predict(artifact, tmp_path, capsys):
    """`python -m apla_tpu.serve predict`: .npy batch and image-file
    inputs through a classifier artifact."""
    from PIL import Image

    from apla_tpu.serve import main as serve_main

    path = artifact[0]
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3)),
                   np.float32)
    npy = str(tmp_path / "batch.npy")
    np.save(npy, x)
    out = str(tmp_path / "logits.npy")
    serve_main(["predict", path, npy, "--top_k", "3", "--out", out])
    printed = capsys.readouterr().out
    assert "image 0:" in printed and "image 1:" in printed
    assert np.load(out).shape == (2, 7)

    imgf = str(tmp_path / "im.png")
    Image.fromarray(np.zeros((40, 50, 3), np.uint8)).save(imgf)
    serve_main(["predict", path, imgf, "--embed"])
    assert "embeddings (1," in capsys.readouterr().out


def test_cli_eval(tmp_path, capsys):
    """`serve eval`: the --test metrics table computed from an artifact
    over the synthetic dataset's test split."""
    from apla_tpu.serve import main as serve_main

    out = str(tmp_path / "eval_artifact")
    serve_main(["export", "--params_path",
                "params/synthetic/vit_tiny/apla.yml", "--out", out,
                "--batch_sizes", "4", "--n_classes", "10"])
    capsys.readouterr()
    serve_main(["eval", out, "--params_path",
                "params/synthetic/vit_tiny/apla.yml", "--knn"])
    printed = capsys.readouterr().out
    assert "EVAL RESULTS (test" in printed
    assert "test_accuracy" in printed and "test_roc_auc" in printed
    # the kNN branch: feature bank from the train split, served embeddings
    assert "knn_test_accuracy" in printed
    # synthetic classes are linearly separable in pixel space — kNN on
    # (even random-init) backbone features beats chance decisively
    knn_acc = float(printed.split("knn_test_accuracy")[1]
                    .split(":")[1].split()[0])
    assert knn_acc > 0.3


def test_segmenter_slide_serving(tmp_path):
    """SegPredictor.predict_slide: host-side sliding windows through the
    fixed-shape programs reproduce the live segmenter_slide_forward."""
    from apla_tpu.models.seg import init_segmenter, segmenter_slide_forward
    from apla_tpu.serve import export_segmenter

    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2,
                    num_heads=4, compute_dtype=jnp.float32)
    trainable, frozen = init_segmenter(
        jax.random.PRNGKey(0), cfg, n_classes=5, channels=16)
    path = str(tmp_path / "seg_art")
    export_segmenter(path, trainable, frozen, cfg, batch_sizes=(2,))
    pred = load_predictor(path)

    x = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (2, 48, 48, 3)),
                   np.float32)
    live = np.asarray(segmenter_slide_forward(trainable, frozen,
                                              jnp.asarray(x), cfg))
    got = pred.predict_slide(x)
    assert got.shape == (2, 48, 48, 5)
    np.testing.assert_allclose(got, live, rtol=1e-4, atol=1e-4)
    m = pred.masks_slide(x)
    np.testing.assert_array_equal(m, np.argmax(live, -1))
    # crop-sized input degrades to the plain path
    x32 = x[:, :32, :32]
    np.testing.assert_allclose(pred.predict_slide(x32), pred.predict(x32),
                               rtol=1e-6, atol=1e-6)
    with pytest.raises(ValueError, match="expected"):
        pred.predict_slide(x[:, :16, :16])


def test_cli_predict_segmenter_autoslide(tmp_path, capsys):
    """predict CLI on a segmenter artifact: crop-sized inputs run the
    plain path; larger .npy batches auto-slide."""
    from apla_tpu.models.seg import init_segmenter
    from apla_tpu.serve import export_segmenter, main as serve_main

    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2,
                    num_heads=4, compute_dtype=jnp.float32)
    trainable, frozen = init_segmenter(
        jax.random.PRNGKey(0), cfg, n_classes=5, channels=16)
    art = str(tmp_path / "seg_art")
    export_segmenter(art, trainable, frozen, cfg, batch_sizes=(2,))

    big = str(tmp_path / "big.npy")
    np.save(big, np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (2, 48, 48, 3)),
        np.float32))
    out = str(tmp_path / "masks.npy")
    serve_main(["predict", art, big, "--out", out])
    printed = capsys.readouterr().out
    assert "mask (48, 48)" in printed
    assert np.load(out).shape == (2, 48, 48)


def test_cli_eval_segmenter(tmp_path, capsys):
    """`serve eval --seg_root`: val mIoU from a segmenter artifact over an
    ADE-layout directory."""
    from test_segdet_loop import make_ade  # shared ADE fixture

    from apla_tpu.models.seg import init_segmenter
    from apla_tpu.serve import export_segmenter, main as serve_main

    make_ade(tmp_path, n=3)

    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2,
                    num_heads=4, compute_dtype=jnp.float32)
    trainable, frozen = init_segmenter(
        jax.random.PRNGKey(0), cfg, n_classes=150, channels=16)
    art = str(tmp_path / "seg_art")
    export_segmenter(art, trainable, frozen, cfg, batch_sizes=(2,))
    serve_main(["eval", art, "--seg_root", str(tmp_path)])
    printed = capsys.readouterr().out
    assert "val_miou" in printed and "3 samples" in printed


def test_cli_eval_detector(tmp_path, capsys):
    """`serve eval --det_img_dir/--det_ann`: mAP@50 from a detector
    artifact over a COCO-layout directory."""
    from test_segdet_loop import make_coco

    from apla_tpu.models.detection import _conv_init, init_fcos_head
    from apla_tpu.models.swin import (SwinConfig, build_apla_swin,
                                      init_swin_params)
    from apla_tpu.serve import export_detector, main as serve_main

    cfg = SwinConfig(img_size=56, patch_size=4, embed_dim=32,
                     depths=(2, 2), num_heads=(2, 4), window_size=7,
                     compute_dtype=jnp.float32)
    bb_t, bb_f = build_apla_swin(init_swin_params(jax.random.PRNGKey(0),
                                                  cfg))
    trainable = {
        "backbone": bb_t,
        "head": init_fcos_head(jax.random.PRNGKey(1), 32, 1, channels=16,
                               n_levels=2),
        "laterals": [_conv_init(jax.random.PRNGKey(5), 1, 32, 32),
                     _conv_init(jax.random.PRNGKey(6), 1, 64, 32)],
    }
    art = str(tmp_path / "det_art")
    export_detector(art, trainable, bb_f, cfg, (4, 8), batch_sizes=(2,))
    img_dir, ann = make_coco(tmp_path)
    serve_main(["eval", art, "--det_img_dir", img_dir, "--det_ann", ann])
    printed = capsys.readouterr().out
    assert "val_map50" in printed and "4 samples" in printed


def test_wrong_resolution_rejected(artifact):
    path = artifact[0]
    pred = load_predictor(path)
    with pytest.raises(ValueError, match="expected"):
        pred.predict(np.zeros((2, 16, 16, 3), np.float32))


def test_cli_export_and_info(tmp_path):
    """The module CLI builds from a params YAML (synthetic recipe) and the
    artifact loads + predicts."""
    out = str(tmp_path / "cli_artifact")
    # Force the CPU platform INSIDE the subprocess (not just the lowering
    # target): `python -m apla_tpu.serve` would otherwise initialize the
    # axon TPU backend, grabbing the single-client TPU tunnel — which
    # wedges any concurrently running TPU job (and this test with it).
    prog = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "from apla_tpu.serve import main; main()")
    cmd = [sys.executable, "-c", prog, "export",
           "--params_path", "params/synthetic/vit_tiny/apla.yml",
           "--out", out, "--batch_sizes", "2", "--n_classes", "10",
           "--platforms", "cpu"]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Exported" in r.stdout
    info = subprocess.run(
        [sys.executable, "-m", "apla_tpu.serve", "info", out],
        capture_output=True, text=True, timeout=120)
    assert info.returncode == 0
    assert '"apla_tpu.serve/1"' in info.stdout

    pred = load_predictor(out)
    img = pred.meta["img_size"]
    got = pred.predict(np.zeros((2, img, img, 3), np.float32))
    assert got.shape == (2, 10)
    assert np.all(np.isfinite(got))
