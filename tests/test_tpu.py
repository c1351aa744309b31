"""On-TPU test tier — real-hardware numerics and compile envelopes.

Every other test pins the CPU platform (conftest); this file runs the
pieces whose real behaviour only exists on the chip: the fused
attention+APLA-projection Pallas kernel (numerics vs the XLA oracle, and
the scoped-VMEM staging boundary that the byte model in
tests/test_fused_envelope.py can only approximate), one train step per
task family, and a serve-artifact execute.

Run serialized, one TPU client, with the persistent compile cache armed
(conftest does this when the gate env var is set):

    APLA_TPU_TESTS=1 python -m pytest tests/test_tpu.py -q

First run pays remote compiles (~20-40 s each); cached reruns finish in
well under 10 minutes.  Without APLA_TPU_TESTS=1 everything here skips.
"""

import os

import numpy as np
import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(os.environ.get("APLA_TPU_TESTS") != "1",
                       reason="on-TPU tier: set APLA_TPU_TESTS=1 and run "
                              "on the chip"),
]

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _require_tpu():
    if jax.devices()[0].platform != "tpu":
        pytest.skip("no TPU backend available")


# ------------------------------------------------------------------ #
# fused kernel numerics on hardware
# ------------------------------------------------------------------ #

def _recipe_args(B=8, N=257, H=12, Dh=64, k=128, seed=0,
                 dtype=jnp.bfloat16):
    """The shipped bench geometry: ViT-B/14 @224 (N=257, C=768), APLA-128,
    micro-b8 — exactly the envelope where bwd runs BB=2."""
    C = H * Dh
    keys = jax.random.split(jax.random.PRNGKey(seed), 6)
    qkv = (jax.random.normal(keys[0], (B, N, 3 * C), jnp.float32)).astype(
        dtype)
    w_frozen = (jax.random.normal(keys[1], (C, C)) * 0.05).astype(dtype)
    b_frozen = (jax.random.normal(keys[2], (C,)) * 0.05).astype(dtype)
    inds = jax.random.permutation(keys[3], C)[:k].astype(jnp.int32)
    w_t = (jax.random.normal(keys[4], (C, k)) * 0.05).astype(dtype)
    b_t = (jax.random.normal(keys[5], (k,)) * 0.05).astype(dtype)
    return qkv, w_t, b_t, w_frozen, b_frozen, inds, H, Dh ** -0.5


def _xla_oracle(qkv, w_t, b_t, w_frozen, b_frozen, inds, H, scale):
    from apla_tpu.ops.apla_proj import apla_proj
    B, N, C3 = qkv.shape
    C = C3 // 3
    Dh = C // H
    q, k, v = [a.reshape(B, N, H, Dh) for a in jnp.split(qkv, 3, axis=-1)]
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(logits, axis=-1).astype(qkv.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
    return apla_proj(out, w_t, b_t, w_frozen, b_frozen, inds)


def test_fused_forward_parity_on_chip():
    """Fused kernel output vs XLA oracle at the recipe geometry, bf16."""
    _require_tpu()
    from apla_tpu.ops.pallas_apla_attn import (effective_bb_fwd,
                                               fused_apla_attention)
    args = _recipe_args()
    assert effective_bb_fwd(8, 272, 768) == 2  # the shipped dispatch
    out = jax.jit(fused_apla_attention, static_argnums=(6, 7, 8))(*args)
    ref = jax.jit(_xla_oracle, static_argnums=(6, 7))(*args)
    out_f = np.asarray(out, np.float32)
    ref_f = np.asarray(ref, np.float32)
    # bf16 end-to-end: compare at bf16 resolution, scaled to signal size
    denom = max(np.abs(ref_f).max(), 1e-3)
    assert np.abs(out_f - ref_f).max() / denom < 0.05


def test_fused_backward_parity_and_envelope_on_chip():
    """Backward numerics at the micro-b8 envelope (bwd BB=2 — the scoped-
    VMEM staging boundary).  If an XLA upgrade breaks the staging rule,
    this COMPILE fails here, not in the bench."""
    _require_tpu()
    from apla_tpu.ops.pallas_apla_attn import (effective_bb_bwd,
                                               fused_apla_attention)
    qkv, w_t, b_t, w_frozen, b_frozen, inds, H, scale = _recipe_args()
    assert effective_bb_bwd(8, 272, 768, 128) == 2

    def loss_fused(qkv, w_t, b_t):
        o = fused_apla_attention(qkv, w_t, b_t, w_frozen, b_frozen, inds,
                                 H, scale)
        return jnp.sum((o.astype(jnp.float32)) ** 2)

    def loss_ref(qkv, w_t, b_t):
        o = _xla_oracle(qkv, w_t, b_t, w_frozen, b_frozen, inds, H, scale)
        return jnp.sum((o.astype(jnp.float32)) ** 2)

    g1 = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(qkv, w_t, b_t)
    g2 = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(qkv, w_t, b_t)
    for a, b, name in zip(g1, g2, ("d_qkv", "dW_t", "db_t")):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = max(np.abs(b).max(), 1e-3)
        assert np.abs(a - b).max() / denom < 0.08, name


def test_fused_small_n_fold_parity_on_chip():
    """The round-4 small-N policy at the DINOv2 local-crop geometry
    (N=50 -> pad 64, B=64 = b8 x 8 crops, BB=8 fold both directions) —
    fwd + bwd numerics vs the XLA oracle on real hardware.  This is the
    shipped DINOv2 default (attention.small_n_fused_ok); a Mosaic/XLA
    change that breaks the deep-fold dispatch fails HERE, not in the
    DINOv2 bench."""
    _require_tpu()
    from apla_tpu.ops.pallas_apla_attn import (effective_bb_bwd,
                                               effective_bb_fwd,
                                               fused_apla_attention,
                                               small_n_fused_ok)
    qkv, w_t, b_t, w_frozen, b_frozen, inds, H, scale = _recipe_args(
        B=64, N=50)
    assert effective_bb_fwd(64, 64, 768) == 8
    assert effective_bb_bwd(64, 64, 768, 128) == 8
    assert small_n_fused_ok(64, 50, 768)

    out = jax.jit(fused_apla_attention, static_argnums=(6, 7, 8))(
        qkv, w_t, b_t, w_frozen, b_frozen, inds, H, scale)
    ref = jax.jit(_xla_oracle, static_argnums=(6, 7))(
        qkv, w_t, b_t, w_frozen, b_frozen, inds, H, scale)
    out_f, ref_f = np.asarray(out, np.float32), np.asarray(ref, np.float32)
    denom = max(np.abs(ref_f).max(), 1e-3)
    assert np.abs(out_f - ref_f).max() / denom < 0.05

    def loss_fused(qkv, w_t, b_t):
        o = fused_apla_attention(qkv, w_t, b_t, w_frozen, b_frozen, inds,
                                 H, scale)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_ref(qkv, w_t, b_t):
        o = _xla_oracle(qkv, w_t, b_t, w_frozen, b_frozen, inds, H, scale)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g1 = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(qkv, w_t, b_t)
    g2 = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(qkv, w_t, b_t)
    for a, b, name in zip(g1, g2, ("d_qkv", "dW_t", "db_t")):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        denom = max(np.abs(b).max(), 1e-3)
        assert np.abs(a - b).max() / denom < 0.08, name


def test_fused_bwd_conservative_path_compiles():
    """Off-micro-b8 batches must pick bwd BB=1 and still compile+run."""
    _require_tpu()
    from apla_tpu.ops.pallas_apla_attn import (effective_bb_bwd,
                                               fused_apla_attention)
    qkv, w_t, b_t, w_frozen, b_frozen, inds, H, scale = _recipe_args(B=16)
    assert effective_bb_bwd(16, 272, 768, 128) == 1

    def loss(qkv, w_t, b_t):
        o = fused_apla_attention(qkv, w_t, b_t, w_frozen, b_frozen, inds,
                                 H, scale)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(1,)))(qkv, w_t, b_t)
    assert np.isfinite(np.asarray(g[0], np.float32)).all()


# ------------------------------------------------------------------ #
# one train step per task family (tiny models, synthetic data)
# ------------------------------------------------------------------ #

def _params(tmp_path, rel, **over):
    from apla_tpu.utils.config import load_merged_params
    path = os.path.join(os.path.dirname(__file__), "..", "params",
                        "synthetic", rel)
    params = load_merged_params(path)
    params.training_params.epochs = 1
    params.training_params.log_every = 1
    params.training_params.val_every = 1.0
    params.training_params.save_dir = str(tmp_path)
    params.dataset_params.synthetic_size = 32
    for split in ("trainloader", "valloader", "testloader"):
        params.dataloader_params[split].batch_size = 8
    for k, v in over.items():
        params[k] = v
    return params


def test_supervised_trains_on_chip(tmp_path):
    _require_tpu()
    from apla_tpu.train.trainer import Trainer
    from apla_tpu.wrapper import DefaultWrapper
    wrapper = DefaultWrapper(_params(tmp_path, "vit_tiny/apla.yml"))
    wrapper.instantiate()
    trainer = Trainer(wrapper)
    trainer.train()
    assert np.isfinite(float(trainer.best_val_target))


def test_byol_trains_on_chip(tmp_path):
    _require_tpu()
    from apla_tpu.ssl.byol import BYOLTrainer, BYOLWrapper
    p = _params(tmp_path, "vit_tiny/apla.yml")
    p.dataset_params.ssl_global_size = 32
    p.dataset_params.ssl_local_size = 16
    wrapper = BYOLWrapper(p, use_momentum=True)
    wrapper.instantiate()
    trainer = BYOLTrainer(wrapper)
    trainer.train()
    assert np.isfinite(float(trainer.best_val_target))


def test_dinov2_trains_on_chip(tmp_path):
    _require_tpu()
    from apla_tpu.ssl.dinov2 import Dinov2Trainer, DINOv2Wrapper
    p = _params(tmp_path, "vit_tiny/dinov2.yml")
    p.dataset_params.ssl_global_size = 32
    p.dataset_params.ssl_local_size = 16
    wrapper = DINOv2Wrapper(p)
    wrapper.instantiate()
    trainer = Dinov2Trainer(wrapper)
    trainer.train()
    assert np.isfinite(float(trainer.best_val_target))


def test_seg_and_det_steps_on_chip():
    _require_tpu()
    import optax

    from apla_tpu.apla.core import AplaConfig
    from apla_tpu.models.seg import init_segmenter, make_seg_train_step
    from apla_tpu.models.vit import ViTConfig

    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2,
                    num_heads=4, compute_dtype=jnp.float32)
    trainable, frozen = init_segmenter(
        jax.random.PRNGKey(0), cfg, n_classes=5,
        apla_cfg=AplaConfig(partial_size=8), channels=16)
    tx = optax.adamw(1e-3)
    step = make_seg_train_step(cfg, tx)
    batch = {"image": jnp.zeros((2, 32, 32, 3)),
             "label": jnp.zeros((2, 32, 32), jnp.int32)}
    _, _, m = step(trainable, tx.init(trainable), frozen, batch)
    assert np.isfinite(float(m["loss"]))

    from apla_tpu.models.detection import (init_fcos_head, init_protonet,
                                           make_detection_train_step,
                                           _conv_init)
    from apla_tpu.models.swin import SwinConfig, build_apla_swin, \
        init_swin_params

    scfg = SwinConfig(img_size=56, patch_size=4, embed_dim=32,
                      depths=(2, 2), num_heads=(2, 4), window_size=7,
                      compute_dtype=jnp.float32)
    bb_t, bb_f = build_apla_swin(init_swin_params(jax.random.PRNGKey(0),
                                                  scfg))
    t = {"backbone": bb_t,
         "head": init_fcos_head(jax.random.PRNGKey(1), 32, 3, channels=16,
                                n_levels=2, n_protos=8),
         "laterals": [_conv_init(jax.random.PRNGKey(5), 1, 32, 32),
                      _conv_init(jax.random.PRNGKey(6), 1, 64, 32)],
         "protonet": init_protonet(jax.random.PRNGKey(7), 32, n_protos=8,
                                   channels=16)}
    dstep = make_detection_train_step(scfg, tx, strides=(4, 8),
                                      with_mask=True)
    batch = {"image": jnp.zeros((2, 56, 56, 3)),
             "boxes": jnp.asarray([[[4., 4., 40., 40.]] * 4] * 2),
             "labels": jnp.asarray([[0, -1, -1, -1]] * 2),
             "masks": jnp.ones((2, 4, 14, 14), jnp.uint8)}
    _, _, m = dstep(t, tx.init(t), bb_f, batch)
    assert np.isfinite(float(m["total"]))


def test_serve_artifact_executes_on_chip(tmp_path):
    _require_tpu()
    from apla_tpu.apla.core import AplaConfig
    from apla_tpu.models.classifier import init_classifier
    from apla_tpu.models.vit import ViTConfig
    from apla_tpu.serve import export_classifier, load_predictor

    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2,
                    num_heads=4, compute_dtype=jnp.float32)
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg, n_classes=7,
        apla_cfg=AplaConfig(partial_size=8))
    path = str(tmp_path / "artifact")
    export_classifier(path, trainable, frozen, cfg, batch_sizes=(4,))
    pred = load_predictor(path)
    x = np.zeros((3, 32, 32, 3), np.float32)
    logits = pred.predict(x)
    assert logits.shape == (3, 7) and np.isfinite(logits).all()


# ------------------------------------------------------------------ #
# round-5 kernels on hardware
# ------------------------------------------------------------------ #

def test_proto_ce_parity_on_chip():
    """Fused prototype-CE kernel (ops/pallas_proto_ce.py) vs the dense
    separate-ops math ON THE CHIP — forward and (dxs, dws) at the DINOv2
    recipe bottleneck width (the kernel's first-and-only hardware contract;
    VERDICT r4 item 1a)."""
    _require_tpu()
    from apla_tpu.ops.pallas_proto_ce import proto_ce

    R, D, K = 128, 256, 8192
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    xs = jax.random.normal(ks[0], (R, D), jnp.float32)
    xs = xs / jnp.linalg.norm(xs, axis=-1, keepdims=True)
    xt = jax.random.normal(ks[1], (R, D), jnp.float32)
    xt = xt / jnp.linalg.norm(xt, axis=-1, keepdims=True)
    ws = jax.random.normal(ks[2], (D, K), jnp.float32)
    ws = ws / jnp.linalg.norm(ws, axis=0, keepdims=True)
    wt = jax.random.normal(ks[3], (D, K), jnp.float32)
    wt = wt / jnp.linalg.norm(wt, axis=0, keepdims=True)
    center = 0.1 * jax.random.normal(ks[4], (K,), jnp.float32)
    tt = jnp.float32(0.04)

    def dense(xs, ws):
        s = jnp.dot(xs.astype(jnp.bfloat16), ws.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        t = jnp.dot(xt.astype(jnp.bfloat16), wt.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        p_t = jax.nn.softmax((t - center.reshape(1, -1)) / tt, axis=-1)
        return -jnp.sum(jax.lax.stop_gradient(p_t)
                        * jax.nn.log_softmax(s / 0.1, axis=-1), axis=-1)

    lf, gf = jax.jit(jax.value_and_grad(
        lambda xs, ws: jnp.sum(proto_ce(xs, ws, xt, wt, center, tt, 0.1)),
        argnums=(0, 1)))(xs, ws)
    ld, gd = jax.jit(jax.value_and_grad(
        lambda xs, ws: jnp.sum(dense(xs, ws)), argnums=(0, 1)))(xs, ws)
    assert abs(float(lf) - float(ld)) / max(abs(float(ld)), 1e-6) < 2e-2
    for a, b, name in zip(gf, gd, ("dxs", "dws")):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        denom = max(np.abs(b).max(), 1e-4)
        assert np.abs(a - b).max() / denom < 0.08, name


def test_fused_swin_parity_on_chip():
    """Swin window kernel (rel-pos bias + shift mask in-kernel, full APLA
    proj) vs the XLA oracle at the det recipe's stage-1 fold geometry."""
    _require_tpu()
    from apla_tpu.ops.pallas_apla_attn import (fused_swin_attention,
                                               swin_fused_ok)

    B, N, H, Dh, nW = 64, 49, 3, 32, 4
    C = H * Dh
    assert swin_fused_ok(B, N, C, H)
    keys = jax.random.split(jax.random.PRNGKey(0), 6)
    qkv = (jax.random.normal(keys[0], (B, N, 3 * C)) * 0.3).astype(
        jnp.bfloat16)
    w = (jax.random.normal(keys[1], (C, C)) * 0.05).astype(jnp.float32)
    b = jnp.zeros((C,), jnp.float32)
    bias = (jax.random.normal(keys[2], (H, N, N)) * 0.5).astype(jnp.float32)
    blk = jax.random.uniform(keys[3], (nW, N, N)) > 0.7
    blk = blk & jnp.swapaxes(blk, 1, 2) & ~jnp.eye(N, dtype=bool)[None]
    wmask = jnp.where(blk, -1e9, 0.0).astype(jnp.float32)
    scale = Dh ** -0.5

    def oracle(qkv, w, b):
        q, k, v = (qkv.reshape(B, N, 3, H, Dh)[:, :, i] for i in range(3))
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                            preferred_element_type=jnp.float32) * scale
        logits = logits + bias[None] + wmask[jnp.arange(B) % nW][:, None]
        attn = jax.nn.softmax(logits, axis=-1).astype(qkv.dtype)
        o = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                       preferred_element_type=jnp.float32)
        return jnp.dot(o.reshape(B, N, C).astype(qkv.dtype), w,
                       preferred_element_type=jnp.float32) + b

    def loss_fused(qkv, w, b):
        return jnp.sum(fused_swin_attention(qkv, w, b, bias, wmask,
                                            H, scale) ** 2)

    def loss_ref(qkv, w, b):
        return jnp.sum(oracle(qkv, w, b) ** 2)

    (lf, gf) = jax.jit(jax.value_and_grad(
        loss_fused, argnums=(0, 1, 2)))(qkv, w, b)
    (lr, gr) = jax.jit(jax.value_and_grad(
        loss_ref, argnums=(0, 1, 2)))(qkv, w, b)
    assert abs(float(lf) - float(lr)) / max(abs(float(lr)), 1e-3) < 0.05
    for a, r, name in zip(gf, gr, ("dqkv", "dw", "db")):
        a, r = np.asarray(a, np.float32), np.asarray(r, np.float32)
        denom = max(np.abs(r).max(), 1e-3)
        assert np.abs(a - r).max() / denom < 0.08, name


def test_long_kernel_parity_on_chip():
    """The @518 q-strip kernel at the real geometry (N=1370, ViT-B width):
    forward + all three cotangents vs the XLA oracle on hardware."""
    _require_tpu()
    from apla_tpu.ops.pallas_apla_attn_long import (fused_apla_attention_long,
                                                    long_fused_ok)

    assert long_fused_ok(1370, 768)
    qkv, w_t, b_t, w_frozen, b_frozen, inds, H, scale = _recipe_args(
        B=2, N=1370)

    def loss_fused(qkv, w_t, b_t):
        o = fused_apla_attention_long(qkv, w_t, b_t, w_frozen, b_frozen,
                                      inds, H, scale)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_ref(qkv, w_t, b_t):
        o = _xla_oracle(qkv, w_t, b_t, w_frozen, b_frozen, inds, H, scale)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    lf, g1 = jax.jit(jax.value_and_grad(
        loss_fused, argnums=(0, 1, 2)))(qkv, w_t, b_t)
    lr, g2 = jax.jit(jax.value_and_grad(
        loss_ref, argnums=(0, 1, 2)))(qkv, w_t, b_t)
    assert abs(float(lf) - float(lr)) / max(abs(float(lr)), 1e-3) < 0.05
    for a, b, name in zip(g1, g2, ("d_qkv", "dW_t", "db_t")):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        denom = max(np.abs(b).max(), 1e-3)
        assert np.abs(a - b).max() / denom < 0.08, name
