"""Tests for the analytic FLOP / MFU model (bench.py audit trail)."""
import math

from apla_tpu.models.vit import VIT_BUILDERS
from apla_tpu.utils.flops import mfu, peak_tflops, vit_train_step_flops


def _hand_count_tiny():
    """Independent hand count for a 2-layer toy config, APLA k=4.

    Backward counts only LIVE matmuls: patch-embed has no backward (its
    input is data, its weight frozen); in block 0 — the deepest block —
    nothing below the out-projection is trainable, so qkv/scores/AV
    backward and the projection's dX are dead; the MLP dX is live in every
    block (it carries the cotangent to the residual dW_t reads)."""
    d, L, p, img, C, ncls, k = 32, 2, 8, 32, 3, 10, 4
    n_patch = (img // p) ** 2          # 16
    n = n_patch + 1                    # 17
    h = 4 * d

    fwd = 2 * n_patch * d * (p * p * C)          # patch embed (no bwd)
    bwd = 0
    for i in range(L):
        live = i > 0                                               # block 0: dead attn bwd
        fwd += 2 * n * 3 * d * d                                    # qkv
        bwd += 2 * n * 3 * d * d if live else 0
        fa = 2 * 2 * n * n * d;    fwd += fa                        # scores+AV
        bwd += 2 * fa if live else 0
        fwd += 2 * n * d * d                                        # proj fwd
        bwd += (2 * n * d * d if live else 0) + 2 * n * d * k       # dX? + dW_t
        fwd += 2 * n * h * d;      bwd += 2 * n * h * d             # fc1 dX
        fwd += 2 * n * d * h;      bwd += 2 * n * d * h             # fc2 dX
    fwd += 2 * ncls * d
    bwd += 2 * 2 * ncls * d                                         # dX + dW
    return fwd, bwd


def test_tiny_hand_count():
    cfg = VIT_BUILDERS["vit_tiny"](img_size=32, patch_size=8)
    # vit_tiny is d=192; build a matching toy via the config dataclass
    cfg = cfg.__class__(**{**cfg.__dict__, "embed_dim": 32, "depth": 2,
                           "num_heads": 2, "img_size": 32, "patch_size": 8})
    fl = vit_train_step_flops(cfg, n_classes=10, batch=1, apla_k=4)
    fwd, bwd = _hand_count_tiny()
    assert fl["fwd_flops"] == fwd
    assert fl["bwd_flops"] == bwd
    assert fl["total_flops"] == fwd + bwd


def test_vitb_magnitude_and_orderings():
    cfg = VIT_BUILDERS["vit_base"](img_size=224, patch_size=14)
    apla = vit_train_step_flops(cfg, 1000, batch=1, apla_k=128)
    full = vit_train_step_flops(cfg, 1000, batch=1, apla_k="finetune")
    whole_proj = vit_train_step_flops(cfg, 1000, batch=1, apla_k="full")
    # ViT-B fwd is ~35 GFLOP/img at 224/14 (literature ballpark 2x params x
    # tokens + attention): sanity-check the decade
    assert 20e9 < apla["fwd_flops"] < 60e9
    # same forward cost in every mode
    assert apla["fwd_flops"] == full["fwd_flops"] == whole_proj["fwd_flops"]
    # backward cost strictly ordered: APLA-128 < whole-proj < full fine-tune
    assert apla["bwd_flops"] < whole_proj["bwd_flops"] < full["bwd_flops"]
    # batch scaling is linear
    b8 = vit_train_step_flops(cfg, 1000, batch=8, apla_k=128)
    assert math.isclose(b8["total_flops"], 8 * apla["total_flops"])


def test_swiglu_uses_fused_hidden():
    cfg = VIT_BUILDERS["vit_giant"](img_size=224, patch_size=14)
    fl = vit_train_step_flops(cfg, 1000, batch=1, apla_k=128)
    assert fl["total_flops"] > 0
    # giant >> base
    base = vit_train_step_flops(
        VIT_BUILDERS["vit_base"](img_size=224, patch_size=14), 1000, 1, 128)
    assert fl["total_flops"] > 5 * base["total_flops"]


def test_mfu_math(monkeypatch):
    monkeypatch.setenv("APLA_PEAK_TFLOPS", "200")
    out = mfu(img_per_sec=1000.0, flops_per_image=100e9)
    assert out["model_tflops"] == 100.0
    assert out["mfu_pct"] == 50.0
    assert peak_tflops("anything") == 200.0


def test_peak_lookup():
    assert peak_tflops("TPU v5e") == 197.0
    assert peak_tflops("TPU v5 lite pod") == 197.0
    assert peak_tflops("TPU v4") == 275.0


def test_probe_mode_counts_no_trunk_backward():
    cfg = VIT_BUILDERS["vit_base"](img_size=224, patch_size=14)
    probe = vit_train_step_flops(cfg, 1000, batch=1, apla_k=0)
    apla = vit_train_step_flops(cfg, 1000, batch=1, apla_k=128)
    assert probe["fwd_flops"] == apla["fwd_flops"]
    # probe backward = head dW only
    assert probe["bwd_flops"] == 2 * 1000 * cfg.embed_dim
    assert probe["bwd_flops"] < apla["bwd_flops"] / 100
