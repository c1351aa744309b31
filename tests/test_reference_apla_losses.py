"""Oracle parity for the APLA CORE and the DINOv2 losses against the
reference's own torch implementations (read-only, executed as numerical
oracles — see test_reference_parity.py for the stubbing approach)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_reference_parity import REF_SRC, ref_vit_module  # noqa: F401,E402


@pytest.fixture(scope="module")
def ref_src(ref_vit_module):  # noqa: F811  (reuses the stubs fixture)
    sys.path.insert(0, REF_SRC)
    yield REF_SRC
    sys.path.remove(REF_SRC)


def _load_ref_file(relpath, name):
    """Import a reference module directly from its file, bypassing package
    __init__ chains that pull unavailable deps (torchvision datasets)."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF_SRC, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_apla_attention_parity_vs_reference(ref_src):
    """Our structural APLA split computes the SAME function as the
    reference's scatter-based APLA_Attention (appla_attn.py:11-85)."""
    import jax
    import jax.numpy as jnp

    from apla_tpu.ops.attention import apla_attention

    sys.modules.pop("apla", None)
    from apla.appla_attn import APLA_Attention
    from easydict import EasyDict

    torch.manual_seed(0)
    dim, heads, k = 64, 4, 16
    perm = torch.randperm(dim)
    ref = APLA_Attention(EasyDict(partial_size=k), dim, indices=perm,
                         num_heads=heads, qkv_bias=True)
    # reference allocates proj_* with torch.empty — initialise explicitly
    with torch.no_grad():
        for p in (ref.proj_weight1, ref.proj_weight2,
                  ref.proj_bias1, ref.proj_bias2):
            p.normal_(0, 0.05)
    ref.eval()

    # map reference params onto our (frozen, trainable) layout:
    # F.linear(x, w1)[.., i] lands at column trainable_inds[i] of the
    # full [d_in, d_out] kernel
    tr_inds = np.asarray(ref.trainable_inds)
    fz_inds = np.asarray(ref.freezed_inds)
    full_kernel = np.zeros((dim, dim), np.float32)
    full_bias = np.zeros((dim,), np.float32)
    full_kernel[:, tr_inds] = ref.proj_weight1.detach().numpy().T
    full_kernel[:, fz_inds] = ref.proj_weight2.detach().numpy().T
    full_bias[tr_inds] = ref.proj_bias1.detach().numpy()
    full_bias[fz_inds] = ref.proj_bias2.detach().numpy()

    frozen = {
        "qkv": {"kernel": jnp.asarray(ref.qkv.weight.detach().numpy().T),
                "bias": jnp.asarray(ref.qkv.bias.detach().numpy())},
        "proj": {"kernel": jnp.asarray(full_kernel),
                 "bias": jnp.asarray(full_bias)},
        "inds": jnp.asarray(tr_inds),
    }
    trainable = {"proj_wt": jnp.asarray(full_kernel[:, tr_inds]),
                 "proj_bt": jnp.asarray(full_bias[tr_inds])}

    x = np.random.default_rng(0).standard_normal((2, 9, dim)) \
        .astype(np.float32)
    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(x))
    ours = np.asarray(apla_attention(
        jnp.asarray(x), frozen, trainable, heads, deterministic=True))
    np.testing.assert_allclose(ours, ref_out.numpy(), rtol=1e-5, atol=1e-5)

    # gradient structure: only the k trainable columns receive nonzero
    # dW through our custom VJP, matching requires_grad in the reference
    def loss(tr):
        return jnp.sum(apla_attention(jnp.asarray(x), frozen, tr, heads,
                                      deterministic=True) ** 2)
    g = jax.grad(loss)(trainable)
    assert g["proj_wt"].shape == (dim, k)
    assert float(jnp.abs(g["proj_wt"]).max()) > 0


def test_dino_loss_parity_vs_reference(ref_src):
    DINOLoss = _load_ref_file(
        "self_supervised/dinov2/loss/dino_clstoken_loss.py",
        "ref_dino_loss").DINOLoss

    import jax.numpy as jnp
    from apla_tpu.ssl.dinov2 import (dinov2_dino_loss,
                                     sinkhorn_knopp_teacher,
                                     softmax_center_teacher)

    torch.manual_seed(0)
    K, B = 32, 8
    ref = DINOLoss(out_dim=K, student_temp=0.1)
    center = torch.randn(1, K) * 0.1
    ref.center = center

    t_out = torch.randn(B, K)
    s1, s2 = torch.randn(B, K), torch.randn(B, K)

    t_sm_ref = ref.softmax_center_teacher(t_out, teacher_temp=0.07)
    t_sm_ours = softmax_center_teacher(jnp.asarray(t_out.numpy()),
                                       jnp.asarray(center.numpy()), 0.07)
    np.testing.assert_allclose(np.asarray(t_sm_ours), t_sm_ref.numpy(),
                               rtol=1e-5, atol=1e-6)

    loss_ref = ref([s1, s2], [t_sm_ref])
    loss_ours = dinov2_dino_loss(
        [jnp.asarray(s1.numpy()), jnp.asarray(s2.numpy())],
        [jnp.asarray(t_sm_ref.numpy())], student_temp=0.1)
    np.testing.assert_allclose(float(loss_ours), float(loss_ref), rtol=1e-5)

    Q_ref = ref.sinkhorn_knopp_teacher(t_out, teacher_temp=0.07)
    Q_ours = sinkhorn_knopp_teacher(jnp.asarray(t_out.numpy()), 0.07)
    np.testing.assert_allclose(np.asarray(Q_ours), Q_ref.numpy(),
                               rtol=1e-4, atol=1e-6)


def test_koleo_loss_parity_vs_reference(ref_src):
    KoLeoLoss = _load_ref_file(
        "self_supervised/dinov2/loss/koleo_loss.py",
        "ref_koleo_loss").KoLeoLoss

    import jax.numpy as jnp
    from apla_tpu.ssl.dinov2 import koleo_loss

    torch.manual_seed(0)
    x = torch.randn(16, 24)
    ref = KoLeoLoss()
    loss_ref = ref(x)
    loss_ours = koleo_loss(jnp.asarray(x.numpy()))
    np.testing.assert_allclose(float(loss_ours), float(loss_ref),
                               rtol=1e-4, atol=1e-5)


def test_ibot_patch_loss_parity_vs_reference(ref_src):
    iBOTPatchLoss = _load_ref_file(
        "self_supervised/dinov2/loss/ibot_patch_loss.py",
        "ref_ibot_loss").iBOTPatchLoss

    import jax.numpy as jnp
    from apla_tpu.ssl.dinov2 import ibot_patch_loss

    torch.manual_seed(0)
    B, N, D = 4, 16, 32  # 4 global-crop images, 16 patches, 32 prototypes
    masks = torch.rand(B, N) < 0.4
    U = int(masks.sum())
    s_masked = torch.randn(U, D)
    t_masked_sm = torch.softmax(torch.randn(U, D), dim=-1)

    ref = iBOTPatchLoss(patch_out_dim=D, student_temp=0.1)
    # reference derives per-patch weights 1/row_count gathered at masked
    # positions; replicate for our call
    w = ((1 / masks.sum(-1).clamp(min=1.0))
         .unsqueeze(-1).expand_as(masks)[masks])
    loss_ref = ref.forward_masked(s_masked, t_masked_sm, masks,
                                  masks_weight=w)
    loss_ours = ibot_patch_loss(
        jnp.asarray(s_masked.numpy()), jnp.asarray(t_masked_sm.numpy()),
        jnp.asarray(w.numpy()), n_images=B, student_temp=0.1)
    np.testing.assert_allclose(float(loss_ours), float(loss_ref),
                               rtol=1e-5)


def test_cosine_scheduler_parity_vs_reference(ref_src):
    ref_mod = _load_ref_file("self_supervised/dinov2/dinov2_utils.py",
                             "ref_dinov2_utils")
    from apla_tpu.ssl.dinov2 import CosineScheduler

    kw = dict(base_value=1e-3, final_value=1e-6, total_iters=100,
              warmup_iters=10, start_warmup_value=0, freeze_iters=5)
    ref = ref_mod.CosineScheduler(**kw)
    ours = CosineScheduler(**kw)
    for it in (0, 3, 7, 12, 50, 99, 120):
        np.testing.assert_allclose(float(ours[it]), float(ref[it]),
                                   rtol=1e-6, err_msg=f"iter {it}")


@pytest.fixture(scope="module")
def ref_ssl_models(ref_src):
    """Import the reference BYOL/DINO(v1) model modules (they pull
    defaults.bases -> torchvision.datasets at import; stub that one name —
    the loss classes under test don't touch it)."""
    import types

    import tests.test_reference_parity as trp
    if "torchvision.datasets" not in sys.modules:
        ds = trp._stub("torchvision.datasets")
        sys.modules["torchvision"].datasets = ds
    from self_supervised.BYOL.models import BYOL_loss, SimSiam_loss
    from self_supervised.DINO.models import DINOLoss as DINOv1Loss
    return BYOL_loss, SimSiam_loss, DINOv1Loss


def test_byol_and_simsiam_loss_parity(ref_ssl_models):
    BYOL_loss, SimSiam_loss, _ = ref_ssl_models
    import jax.numpy as jnp

    from apla_tpu.ssl.byol import byol_loss, simsiam_loss

    torch.manual_seed(0)
    B, D = 8, 32
    preds = [torch.randn(B, D), torch.randn(B, D)]
    targs = [torch.randn(B, D), torch.randn(B, D)]

    ref_b = BYOL_loss()(preds, targs)
    ours_b = byol_loss([jnp.asarray(p.numpy()) for p in preds],
                       [jnp.asarray(t.numpy()) for t in targs])
    np.testing.assert_allclose(float(ours_b), float(ref_b), rtol=1e-5)

    ref_s = SimSiam_loss()(preds, targs)
    ours_s = simsiam_loss([jnp.asarray(p.numpy()) for p in preds],
                          [jnp.asarray(t.numpy()) for t in targs])
    np.testing.assert_allclose(float(ours_s), float(ref_s), rtol=1e-5)


def test_dino_v1_loss_sequence_parity(ref_ssl_models):
    """DINO v1 centering + sharpening over N steps with the reference's own
    DINOLoss (teacher-temp warmup schedule, center EMA inside forward,
    DINO/models.py:8-70) vs our dino_loss recurrence."""
    _, _, DINOv1Loss = ref_ssl_models
    import jax.numpy as jnp

    from apla_tpu.ssl.dino import dino_loss

    torch.manual_seed(1)
    K, B, ncrops, T = 32, 4, 4, 5
    ref = DINOv1Loss(out_dim=K, ncrops=ncrops, warmup_teacher_temp=0.04,
                     teacher_temp=0.07, warmup_teacher_temp_epochs=3,
                     nepochs=6, student_temp=0.1, center_momentum=0.9)
    center = jnp.zeros((1, K), jnp.float32)
    ref_losses, our_losses = [], []
    for t in range(T):
        s_chunks = [torch.randn(B, K) for _ in range(ncrops)]
        t_chunks = [torch.randn(B, K) for _ in range(2)]
        temp = float(ref.teacher_temp_schedule[t])

        ref_losses.append(float(ref(torch.cat(s_chunks), torch.cat(t_chunks),
                                    epoch=t)))
        ours, center = dino_loss(
            [jnp.asarray(s.numpy()) for s in s_chunks],
            [jnp.asarray(c.numpy()) for c in t_chunks],
            center, teacher_temp=temp, student_temp=0.1,
            center_momentum=0.9)
        our_losses.append(float(ours))
    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(center), ref.center.numpy(),
                               rtol=1e-5, atol=1e-7)
