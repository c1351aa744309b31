"""Regression pins for the fused APLA-attention kernel's dispatch envelope.

The shipped +9% bench default rides an empirical rule (BASELINE.md
round-3b): forward runs BB<=2 everywhere, backward BB=2 ONLY at micro-b8 —
larger microbatches (and micro-b4) hit XLA's scoped-VMEM staging failure
("scoped allocation > 16M") because the remat-saved qkv operand is staged
next to the kernel.  These tests pin the policy functions and the VMEM
byte model so a silent edit (or a future change in the policy constants)
turns into a red test instead of a bad bench; the on-TPU tier
(tests/test_tpu.py) compiles the envelope on real hardware.
"""

import pytest

from apla_tpu.ops.pallas_apla_attn import (_bwd_bytes, _fwd_bytes,
                                           _vmem_budget, effective_bb_bwd,
                                           effective_bb_fwd, fused_fits,
                                           fused_min_n, FUSED_MIN_N,
                                           small_n_fused_ok, _pad_to)

# the recipe geometry: ViT-B/14 @224 -> N=257 padded, C=768, K=128
NP_VITB = _pad_to(257, 16)
C_VITB = 768
KP_VITB = 128


def test_recipe_envelope_micro_b8():
    """micro-b8 (the accum-8 champion): fwd BB=2, bwd BB=2."""
    assert effective_bb_fwd(8, NP_VITB, C_VITB) == 2
    assert effective_bb_bwd(8, NP_VITB, C_VITB, KP_VITB) == 2


@pytest.mark.parametrize("b", [4, 16, 32, 64])
def test_staging_rule_limits_bwd_to_bb1_off_micro_b8(b):
    """Every batch other than 8 must run bwd BB=1 (both larger batches AND
    micro-b4 hit the staging failure with BB=2 — measured, r3_fused_attn)."""
    assert effective_bb_bwd(b, NP_VITB, C_VITB, KP_VITB) == 1


@pytest.mark.parametrize("b", [16, 32, 64])
def test_fwd_bb2_everywhere_divisible(b):
    assert effective_bb_fwd(b, NP_VITB, C_VITB) == 2


def test_fwd_bb_never_exceeds_two():
    """BB=3+ shapes never compiled on hardware; the ceiling is pinned."""
    import os
    os.environ["APLA_FUSED_BB_FWD"] = "4"
    try:
        assert effective_bb_fwd(12, NP_VITB, C_VITB) <= 2
    finally:
        del os.environ["APLA_FUSED_BB_FWD"]


def test_byte_model_within_budget_at_shipped_envelope():
    """The VMEM byte model must keep the shipped dispatch shapes under the
    12 MB default budget — if someone edits the model or the budget, the
    envelope silently changes; this pins both."""
    budget = _vmem_budget()
    assert budget == 12 * 2 ** 20
    assert _fwd_bytes(2, NP_VITB, C_VITB) <= budget
    assert _bwd_bytes(2, NP_VITB, C_VITB, KP_VITB) <= budget
    # ViT-L geometry at BB=1 also fits (the +3.9% ViT-L win)
    assert _bwd_bytes(1, NP_VITB, 1024, 128) <= budget


def test_vitg_needs_vmem_override():
    """ViT-giant (C=1536) is excluded by the default gate and admitted at
    the documented 15 MB override (BASELINE.md round-3e)."""
    import os
    assert not fused_fits(257, 1536)
    os.environ["APLA_FUSED_VMEM_MB"] = "15"
    try:
        assert fused_fits(257, 1536)
    finally:
        del os.environ["APLA_FUSED_VMEM_MB"]


def test_min_n_gate():
    """Below FUSED_MIN_N the kernel routes only through the small-N fold
    admission; 257-token globals always pass the gate."""
    assert FUSED_MIN_N == 128
    assert fused_min_n() == 128
    assert 50 < FUSED_MIN_N <= 257


def test_small_n_fold_policy():
    """The DINOv2 local-crop regime (b8 recipe -> 64 images of 50 tokens,
    pad 64) folds BB=8 both directions and is admitted — the r4 step-level
    win (162.4 vs 150.4 img/s, r4_smalln_attn.jsonl)."""
    assert effective_bb_fwd(64, 64, C_VITB) == 8
    assert effective_bb_bwd(64, 64, C_VITB, KP_VITB) == 8
    assert small_n_fused_ok(64, 50, C_VITB)


def test_small_n_fold_is_vmem_capped():
    """A requested 16-fold exceeds the 12 MB budget at the ViT-B local-crop
    geometry and must cap back to 8 (the chain_fused_local_bb16 run logged
    effective [8, 8])."""
    import os
    os.environ["APLA_FUSED_BB_FWD_SMALL"] = "16"
    os.environ["APLA_FUSED_BB_BWD_SMALL"] = "16"
    try:
        assert _fwd_bytes(16, 64, C_VITB) > _vmem_budget()
        assert effective_bb_fwd(64, 64, C_VITB) == 8
        assert effective_bb_bwd(64, 64, C_VITB, KP_VITB) == 8
    finally:
        del os.environ["APLA_FUSED_BB_FWD_SMALL"]
        del os.environ["APLA_FUSED_BB_BWD_SMALL"]


def test_small_n_shallow_fold_rejected():
    """Small batches cannot fold deep enough at small N; BB<4 was never
    step-validated as a win, so the admission must refuse them (the XLA
    path serves these shapes)."""
    assert not small_n_fused_ok(2, 50, C_VITB)
    assert not small_n_fused_ok(3, 50, C_VITB)
    # prime batch sizes cannot fold (divisibility), whatever their size
    assert not small_n_fused_ok(61, 50, C_VITB)
