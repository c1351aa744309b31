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
                                           effective_bb_fwd, fused_admitted,
                                           fused_fits, fused_min_n,
                                           FUSED_MIN_N, small_n_fused_ok,
                                           _pad_to)

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


def test_fwd_bb_never_exceeds_two(monkeypatch):
    """BB=3+ shapes never compiled on hardware; the ceiling is pinned."""
    monkeypatch.setenv("APLA_FUSED_BB_FWD", "4")
    assert effective_bb_fwd(12, NP_VITB, C_VITB) <= 2


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


def test_vitg_needs_vmem_override(monkeypatch):
    """ViT-giant (C=1536) is excluded by the default gate and admitted at
    the documented 15 MB override (BASELINE.md round-3e).  monkeypatch
    restores any externally exported override after the test."""
    monkeypatch.delenv("APLA_FUSED_VMEM_MB", raising=False)
    assert not fused_fits(257, 1536)
    monkeypatch.setenv("APLA_FUSED_VMEM_MB", "15")
    assert fused_fits(257, 1536)


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


def test_small_n_fold_is_vmem_capped(monkeypatch):
    """A requested 16-fold exceeds the 12 MB budget at the ViT-B local-crop
    geometry and must cap back to 8 (the chain_fused_local_bb16 run logged
    effective [8, 8])."""
    monkeypatch.setenv("APLA_FUSED_BB_FWD_SMALL", "16")
    monkeypatch.setenv("APLA_FUSED_BB_BWD_SMALL", "16")
    assert _fwd_bytes(16, 64, C_VITB) > _vmem_budget()
    assert effective_bb_fwd(64, 64, C_VITB) == 8
    assert effective_bb_bwd(64, 64, C_VITB, KP_VITB) == 8


def test_small_n_shallow_fold_rejected():
    """Small batches cannot fold deep enough at small N; BB<4 was never
    step-validated as a win, so the admission must refuse them (the XLA
    path serves these shapes)."""
    assert not small_n_fused_ok(2, 50, C_VITB)
    assert not small_n_fused_ok(3, 50, C_VITB)
    # prime batch sizes cannot fold (divisibility), whatever their size
    assert not small_n_fused_ok(61, 50, C_VITB)


def test_small_n_fold_stays_on_validated_ladder():
    """Only fold depths {8, 4, 2, 1} were ever Mosaic-compiled at small N;
    divisibility must never select 5/6/7 (b=20 divides by 5 — the policy
    has to drop to 4, not admit an unvalidated block shape that would
    abort the job on a compile failure instead of falling back to XLA)."""
    for b in (20, 12, 28, 24, 56):
        assert effective_bb_fwd(b, 64, C_VITB) in (8, 4, 2, 1), b
        assert effective_bb_bwd(b, 64, C_VITB, KP_VITB) in (8, 4, 2, 1), b
    assert effective_bb_fwd(20, 64, C_VITB) == 4
    assert effective_bb_bwd(20, 64, C_VITB, KP_VITB) == 4
    # 24 and 56 divide by 8 -> the deep fold is still picked
    assert effective_bb_fwd(24, 64, C_VITB) == 8
    assert effective_bb_fwd(56, 64, C_VITB) == 8


def test_small_n_fold_disable_env(monkeypatch):
    """APLA_FUSED_SMALLN=0 is the measurement control (the round-3 gate):
    every small sequence must be refused regardless of fold depth."""
    monkeypatch.setenv("APLA_FUSED_SMALLN", "0")
    assert not small_n_fused_ok(64, 50, C_VITB)


def test_small_n_bwd_fold_capped_at_validated_batch(monkeypatch):
    """ADVICE r4 #1: total batches above the hardware-validated 128 must
    not reach the small-N bwd fold (scoped-VMEM staging scales with the
    remat-saved qkv operand = the total batch); BB=1 there makes the
    admission decline, so the shape runs XLA instead of risking a compile
    abort.  The validated DINOv2 b8/b16 folds (B=64/128) stay admitted."""
    assert effective_bb_bwd(128, 64, C_VITB, KP_VITB) == 8
    assert effective_bb_bwd(256, 64, C_VITB, KP_VITB) == 1
    assert not small_n_fused_ok(256, 50, C_VITB)
    # hardware-evidence override path
    monkeypatch.setenv("APLA_FUSED_SMALLN_BMAX", "256")
    assert effective_bb_bwd(256, 64, C_VITB, KP_VITB) == 8
    assert small_n_fused_ok(256, 50, C_VITB)


def test_admission_small_pad_requires_fold(monkeypatch):
    """ADVICE r4 #2: N in 113..128 pads to 128 and routes to the small-N BB
    ladder, so the admission must go through the fold check even though
    N >= FUSED_MIN_N — a batch that only folds shallow (the round-3 20x
    dispatch) must fall back to XLA."""
    assert not fused_admitted(2, 128, C_VITB)     # shallow fold -> XLA
    assert not fused_admitted(61, 120, C_VITB)    # prime batch -> XLA
    assert fused_admitted(64, 128, C_VITB)        # deep fold -> kernel
    assert fused_admitted(8, 257, C_VITB)         # recipe N: plain gate
    assert not fused_admitted(3, 50, C_VITB)      # non-folding small batch
    # the experiment force-admit knob bypasses the policy entirely
    monkeypatch.setenv("APLA_FUSED_MIN_N", "0")
    assert fused_admitted(2, 128, C_VITB)


def test_tpu_client_lock_overlapping_holders(tmp_path, monkeypatch):
    """ADVICE r4 #3 + its r5 mirror: overlapping clients are BOTH recorded
    — neither exit path may leave a still-running client invisible to
    tpu_client_busy() pollers (the old single-record file either got
    overwritten, hiding the first client, or left the second client
    unregistered, hiding it once the first exited)."""
    import json
    import os

    from apla_tpu.utils import tpu_client_lock as lock

    path = str(tmp_path / "lock.json")
    monkeypatch.setattr(lock, "LOCK_PATH", path)
    # a live "other" holder in the LEGACY single-record format: pid 1 is
    # always alive
    with open(path, "w") as f:
        json.dump({"pid": 1, "name": "first-job", "ts": 0}, f)
    with lock.tpu_client("second-job"):
        with open(path) as f:
            holders = json.load(f)["holders"]
        assert {h["name"] for h in holders} == {"first-job", "second-job"}
        assert lock.tpu_client_busy() is not None
    # after the second client exits, the first holder is still seen
    assert os.path.exists(path)
    assert lock.tpu_client_busy() == "first-job"
    # a STALE holder (dead pid) is pruned; sole live holder unlinks on exit
    with open(path, "w") as f:
        json.dump({"pid": 2 ** 22 + 12345, "name": "dead-job", "ts": 0}, f)
    with lock.tpu_client("third-job"):
        with open(path) as f:
            holders = json.load(f)["holders"]
        assert [h["pid"] for h in holders] == [os.getpid()]
    assert not os.path.exists(path)


def test_dino_head_matmul_bf16_numerics():
    """head_matmul_bf16 (the dinov2 perf knob): bf16 last-layer matmul with
    f32 accumulation must track the f32 path within bf16 rounding, produce
    f32 logits, and keep grads flowing to last_v/last_g."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from apla_tpu.ssl.heads import dino_head_forward, init_dino_head

    params = init_dino_head(jax.random.PRNGKey(0), in_dim=32, out_dim=512,
                            nlayers=3, hidden_dim=64, bottleneck_dim=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (24, 32), jnp.float32)

    ref = dino_head_forward(x, params, norm_last_layer=False)
    out = dino_head_forward(x, params, norm_last_layer=False,
                            matmul_bf16=True)
    assert out.dtype == jnp.float32
    denom = max(float(jnp.abs(ref).max()), 1e-3)
    assert float(jnp.abs(out - ref).max()) / denom < 2e-2

    def loss(p):
        return jnp.sum(dino_head_forward(x, p, norm_last_layer=False,
                                         matmul_bf16=True) ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["last_v"]).max()) > 0
    assert float(jnp.abs(g["last_g"]).max()) > 0
    gr = jax.grad(lambda p: jnp.sum(dino_head_forward(
        x, p, norm_last_layer=False) ** 2))(params)
    for k in ("last_v", "last_g"):
        d = max(float(jnp.abs(gr[k]).max()), 1e-3)
        assert float(jnp.abs(g[k] - gr[k]).max()) / d < 5e-2, k


def test_fused_dtype_gate(monkeypatch):
    """The kernel VMEM ladders are bf16-calibrated; an f32 request must
    fall back to XLA (r5 review: `det --use_fused` without --bf16 would
    otherwise compile-abort past the bisected Mosaic limit) — except in
    interpret mode (tests) or under the explicit experiment override."""
    import jax.numpy as jnp

    from apla_tpu.ops import pallas_apla_attn as pa

    monkeypatch.setattr(pa, "INTERPRET", False)
    assert pa.fused_dtype_ok(jnp.bfloat16)
    assert not pa.fused_dtype_ok(jnp.float32)
    monkeypatch.setenv("APLA_FUSED_ALLOW_F32", "1")
    assert pa.fused_dtype_ok(jnp.float32)
    monkeypatch.delenv("APLA_FUSED_ALLOW_F32")
    monkeypatch.setattr(pa, "INTERPRET", True)
    assert pa.fused_dtype_ok(jnp.float32)


def test_fused_fallback_warns_once(capsys):
    """A declined use_fused request prints ONE stderr notice per reason
    (silent fallback = user benchmarks the wrong path)."""
    from apla_tpu.ops import pallas_apla_attn as pa

    pa._WARNED_FALLBACKS.discard("unit-test-reason")
    pa.warn_fused_fallback("unit-test-reason")
    pa.warn_fused_fallback("unit-test-reason")
    err = capsys.readouterr().err
    assert err.count("unit-test-reason") == 1
    assert "falling back to XLA" in err


def test_f32_apla_attention_falls_back_to_xla(monkeypatch):
    """End to end through apla_attention: an f32 trace with use_fused=True
    must produce the XLA path's numbers (kernel declined), not die or
    diverge."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from apla_tpu.ops import pallas_apla_attn as pa
    from apla_tpu.ops.attention import apla_attention

    # force the "TPU available" branch so only the dtype gate can decline
    monkeypatch.setattr(pa, "INTERPRET", False)
    import apla_tpu.ops.flash_attention as fa
    monkeypatch.setattr(fa, "_on_tpu", lambda: True)

    rng = np.random.default_rng(0)
    B, N, C, H, k = 4, 64, 64, 4, 16
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    frozen = {
        "qkv": {"kernel": jnp.asarray(
            rng.standard_normal((C, 3 * C)) * 0.05, jnp.float32)},
        "proj": {"kernel": jnp.asarray(
            rng.standard_normal((C, C)) * 0.05, jnp.float32),
            "bias": jnp.zeros((C,), jnp.float32)},
        "inds": jnp.arange(k, dtype=jnp.int32),
    }
    trainable = {"proj_wt": jnp.asarray(
        rng.standard_normal((C, k)) * 0.05, jnp.float32),
        "proj_bt": jnp.zeros((k,), jnp.float32)}
    fused = apla_attention(x, frozen, trainable, H, use_fused=True)
    ref = apla_attention(x, frozen, trainable, H, use_fused=False)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
