"""N-step TRAINING-TRAJECTORY parity vs the reference's own torch modules.

Forward/loss-level parity is covered by test_reference_parity.py /
test_reference_apla_losses.py; this file closes the remaining gap (VERDICT r2
item 1): the full optimization dynamics.  The oracle is the reference code
itself, run step-for-step —

  * model   : reference `utils.transformers.vit` ViT + the reference's
              `apla.apla_vit.build_apla` (APLA_Attention with proj split
              into trainable weight1 / frozen weight2, appla_attn.py:40-83)
  * trainer : the reference `global_step` order (trainer.py:106-151) —
              zero_grad -> CE -> backward -> clip_grad_norm over ALL params
              -> AdamW step -> MixedLRScheduler.step()
  * groups  : the DINO param-group rule (wrappers.py:204-221) — no weight
              decay for biases / 1-D tensors, requires_grad filter
  * schedule: the reference's own LinearWarmup + torch CosineAnnealingLR
              multiplexed by the reference's MixedLRScheduler
              (_utils.py:123-172, 369-415), including its off-by-one
              warmup overshoot

against our jitted `make_train_step` + optax AdamW + host LRScheduler,
starting from identical weights (imported via `convert_torch_vit_state_dict`
+ the torch model's own sampled APLA indices), on identical batches.
Asserts per-step learning rates, per-step loss trajectories, and final
trainable parameters agree to f32 tolerance.
"""

import copy
import json
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from apla_tpu.apla.core import AplaConfig  # noqa: E402
from apla_tpu.models.vit import ViTConfig  # noqa: E402
from apla_tpu.train.losses import cross_entropy  # noqa: E402
from apla_tpu.train.optim import build_optimizer  # noqa: E402
from apla_tpu.train.schedules import LRScheduler  # noqa: E402
from apla_tpu.train.steps import make_train_step  # noqa: E402
from apla_tpu.train.train_state import TrainState  # noqa: E402
from apla_tpu.utils.pretrained import convert_torch_vit_state_dict  # noqa: E402

REF_SRC = "/root/reference/src"

# --- geometry: ViT-tiny trunk at 64px keeps the torch oracle fast on CPU ---
DIM, DEPTH, HEADS = 192, 12, 3
IMG, PATCH = 64, 16
N_CLASSES, BATCH = 10, 8
APLA_K = 16
LR, WD, CLIP = 1e-3, 0.05, 1.0
STEPS_PER_EPOCH, EPOCHS, WARMUP = 10, 3, 5
N_STEPS = STEPS_PER_EPOCH * EPOCHS


class _C:
    def __init__(self, *a, **k):
        pass


def _stub(name, **attrs):
    import importlib.machinery
    m = types.ModuleType(name)
    m.__file__ = f"<stub {name}>"
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


class EasyDict(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


@pytest.fixture(scope="module")
def ref_mods():
    import os
    if not os.path.isdir(REF_SRC):
        pytest.skip("reference source not available")
    if "torchvision" not in sys.modules:
        transforms = _stub(
            "torchvision.transforms", RandomApply=_C, RandomResizedCrop=_C,
            Compose=_C,
            InterpolationMode=types.SimpleNamespace(BICUBIC=3, BILINEAR=2))
        tv = _stub("torchvision", transforms=transforms)
        tv.__path__ = []
    sys.modules.setdefault("timm", _stub("timm"))
    sys.modules.setdefault("wandb", _stub("wandb"))
    if "easydict" not in sys.modules:
        _stub("easydict", EasyDict=EasyDict)
    sys.path.insert(0, REF_SRC)
    try:
        from utils.transformers import vit as ref_vit
        from utils import _utils as ref_utils
        from apla import apla_vit as ref_apla
    finally:
        sys.path.remove(REF_SRC)
    return ref_vit, ref_utils, ref_apla


def _dino_param_groups(named_params, weight_decay):
    """The reference's get_params_groups rule (wrappers.py:204-221)."""
    regularized, not_regularized = [], []
    for name, p in named_params:
        if not p.requires_grad:
            continue
        if name.endswith(".bias") or len(p.shape) == 1:
            not_regularized.append(p)
        else:
            regularized.append(p)
    return [{"params": regularized, "weight_decay": weight_decay},
            {"params": not_regularized, "weight_decay": 0.0}]


def _build_ref_scheduler(ref_utils, optimizer):
    """Mirror wrappers.init_scheduler for ['LinearWarmup',
    'CosineAnnealingLR'] exactly (wrappers.py:240-308).

    The installed torch (2.x) dropped the positional `verbose` arg the
    reference's LinearWarmup.__init__ passes to its super; shim ONLY the
    constructor plumbing — get_lr (the semantics under test) stays the
    reference's own method."""

    class _LinearWarmup(ref_utils.LinearWarmup):
        def __init__(self, optimizer, max_lr, warmup_iters, steps_per_epoch):
            del steps_per_epoch  # only used for warmup_epochs, not set here
            self.warmup_iters = warmup_iters
            self.eta_min = 1e-8
            self.max_lr = max_lr
            for group in optimizer.param_groups:
                group["lr"] = self.eta_min
            torch.optim.lr_scheduler.LRScheduler.__init__(self, optimizer, -1)

    lw = _LinearWarmup(optimizer, max_lr=LR, warmup_iters=WARMUP,
                       steps_per_epoch=STEPS_PER_EPOCH)
    cos = torch.optim.lr_scheduler.CosineAnnealingLR(
        optimizer, T_max=N_STEPS - WARMUP, eta_min=1e-6)
    return ref_utils.MixedLRScheduler(
        [None, lw, cos], [None, "LinearWarmup", "CosineAnnealingLR"],
        steps_per_epoch=STEPS_PER_EPOCH)


@pytest.fixture(scope="module")
def trajectories(ref_mods, tmp_path_factory):
    ref_vit, ref_utils, ref_apla = ref_mods
    tmp = tmp_path_factory.mktemp("traj")

    # ---------------- torch oracle ----------------
    torch.manual_seed(0)
    model = ref_vit.VisionTransformer(
        img_size=[IMG], patch_size=PATCH, embed_dim=DIM, depth=DEPTH,
        num_heads=HEADS, mlp_ratio=4, qkv_bias=True,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
        pretrained_type="dinov2")
    plain_sd = copy.deepcopy(model.state_dict())  # pre-APLA snapshot
    head = torch.nn.Linear(DIM, N_CLASSES)
    head0_kernel = head.weight.detach().numpy().T.copy()  # pre-training
    head0_bias = head.bias.detach().numpy().copy()

    model = ref_apla.build_apla(EasyDict({"partial_size": APLA_K}), model,
                                "apla_attn")
    # the torch model sampled its own indices (torch.randperm per block,
    # appla_attn.py:27); extract them for our side
    inds = [model.blocks[i].attn.inds[:APLA_K].tolist()
            for i in range(DEPTH)]
    inds_path = tmp / "inds.json"
    inds_path.write_text(json.dumps(
        {f"block_{i}": row for i, row in enumerate(inds)}))

    params = _dino_param_groups(
        list(model.named_parameters()) + list(head.named_parameters()), WD)
    optimizer = torch.optim.AdamW(params, lr=LR, weight_decay=WD)
    scheduler = _build_ref_scheduler(ref_utils, optimizer)

    rng = np.random.default_rng(0)
    batches = [
        (rng.standard_normal((BATCH, IMG, IMG, 3)).astype(np.float32),
         rng.integers(0, N_CLASSES, BATCH).astype(np.int64))
        for _ in range(N_STEPS)
    ]

    torch_losses, torch_lrs = [], []
    model.train()
    head.train()
    for x_np, y_np in batches:
        optimizer.zero_grad()
        x = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        logits = head(model(x))
        loss = torch.nn.functional.cross_entropy(
            logits, torch.from_numpy(y_np))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(
            list(model.parameters()) + list(head.parameters()), CLIP)
        torch_lrs.append(optimizer.param_groups[0]["lr"])
        optimizer.step()
        scheduler.step()
        torch_losses.append(float(loss.detach()))

    # ---------------- our side ----------------
    cfg = ViTConfig(img_size=IMG, patch_size=PATCH, embed_dim=DIM,
                    depth=DEPTH, num_heads=HEADS,
                    compute_dtype=jnp.float32)
    from apla_tpu.apla.core import build_apla as our_build_apla
    vit_params = convert_torch_vit_state_dict(plain_sd, depth=DEPTH)
    vit_params = jax.tree.map(jnp.asarray, vit_params)
    backbone_t, backbone_f = our_build_apla(
        vit_params, cfg, AplaConfig(partial_size=APLA_K,
                                    inds_path=str(inds_path)))
    trainable = {
        "backbone": backbone_t,
        "fc": {"kernel": jnp.asarray(head0_kernel),
               "bias": jnp.asarray(head0_bias)},
    }
    frozen = {"backbone": backbone_f}

    tx = build_optimizer("AdamW", {"lr": LR, "weight_decay": WD},
                         trainable, grad_clip=CLIP)
    state = TrainState.create(trainable, tx)
    step = make_train_step(cfg, tx, cross_entropy)
    sched = LRScheduler(
        ["LinearWarmup", "CosineAnnealingLR"],
        {"LinearWarmup": {"warmup_iters": WARMUP},
         "CosineAnnealingLR": {"eta_min": 1e-6}},
        max_lr=LR, steps_per_epoch=STEPS_PER_EPOCH, epochs=EPOCHS)

    our_losses, our_lrs = [], []
    key = jax.random.PRNGKey(0)
    for i, (x_np, y_np) in enumerate(batches):
        lr = sched.lr(i)
        batch = {"image": jnp.asarray(x_np),
                 "label": jnp.asarray(y_np.astype(np.int32))}
        state, m = step(state, frozen, batch, lr, key)
        our_losses.append(float(m["loss"]))
        our_lrs.append(lr)

    return {
        "torch_losses": np.asarray(torch_losses),
        "our_losses": np.asarray(our_losses),
        "torch_lrs": np.asarray(torch_lrs),
        "our_lrs": np.asarray(our_lrs),
        "torch_model": model,
        "torch_head": head,
        "state": state,
    }


@pytest.mark.slow
def test_lr_sequence_matches_reference_schedulers(trajectories):
    """Our host-side closed-form LR must equal the torch scheduler stack at
    every iteration — including the warmup off-by-one overshoot at it==W."""
    np.testing.assert_allclose(trajectories["our_lrs"],
                               trajectories["torch_lrs"], rtol=1e-10)
    # the overshoot is real: lr at it==WARMUP exceeds max_lr
    assert trajectories["our_lrs"][WARMUP] > LR


@pytest.mark.slow
def test_loss_trajectory_matches(trajectories):
    t, o = trajectories["torch_losses"], trajectories["our_losses"]
    # identical first step (pure forward parity), tight f32 agreement
    # throughout 30 optimization steps
    np.testing.assert_allclose(o[0], t[0], rtol=1e-5)
    np.testing.assert_allclose(o, t, rtol=2e-3, atol=2e-4)
    # and the trajectory is non-trivial (optimizer really moved the params;
    # labels are random per batch so monotone descent is not expected)
    assert np.abs(np.diff(t)).max() > 1e-3


@pytest.mark.slow
def test_final_trainable_params_match(trajectories):
    model = trajectories["torch_model"]
    head = trajectories["torch_head"]
    state = trajectories["state"]
    tb = state.trainable["backbone"]["blocks"]
    wt = np.asarray(tb["proj_wt"])   # [L, d, k]
    bt = np.asarray(tb["proj_bt"])   # [L, k]
    for i in range(DEPTH):
        ref_w1 = model.blocks[i].attn.proj_weight1.detach().numpy()  # [k, d]
        ref_b1 = model.blocks[i].attn.proj_bias1.detach().numpy()    # [k]
        np.testing.assert_allclose(wt[i].T, ref_w1, rtol=5e-3, atol=5e-5)
        np.testing.assert_allclose(bt[i], ref_b1, rtol=5e-3, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(state.trainable["fc"]["kernel"]).T,
        head.weight.detach().numpy(), rtol=5e-3, atol=5e-5)


# --------------------------------------------------------------------------- #
# DINOv2 stateful-sequence parity: the pieces of the SSL step that EVOLVE
# across iterations — DINO/iBOT centering EMA (lazy apply semantics,
# loss/dino_clstoken_loss.py:76-98 / ibot_patch_loss.py:122-145) and the
# teacher momentum update (models.py:443-453) — driven for N steps against
# the reference's own loss modules.  One-call loss parity lives in
# test_reference_apla_losses.py; this covers the recurrences.
# --------------------------------------------------------------------------- #

def _load_ref_file(relpath, name):
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF_SRC, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_dinov2_center_ema_sequence(ref_mods):
    """N steps of teacher centering: softmax_center (which lazily applies the
    previous step's center update) -> loss -> update_center, with a CHANGING
    teacher temperature.  Our in-step recurrence (dinov2.py:404-416) must
    produce the same per-step losses and final center."""
    from apla_tpu.ssl.dinov2 import dinov2_dino_loss, softmax_center_teacher

    DINOLoss = _load_ref_file(
        "self_supervised/dinov2/loss/dino_clstoken_loss.py",
        "ref_dino_loss_seq").DINOLoss

    torch.manual_seed(3)
    K, B, T = 32, 8, 6
    temps = np.linspace(0.04, 0.07, T)
    t_outs = [torch.randn(2 * B, K) for _ in range(T)]
    s_outs = [(torch.randn(B, K), torch.randn(B, K)) for _ in range(T)]

    ref = DINOLoss(out_dim=K, student_temp=0.1, center_momentum=0.9)
    ref_losses = []
    for t in range(T):
        t_sm = ref.softmax_center_teacher(t_outs[t], teacher_temp=temps[t])
        # the model views [2B,K] as the 2 global-crop chunks (models.py:285)
        ref_losses.append(float(ref(list(s_outs[t]),
                                    [t_sm[:B], t_sm[B:]])))
        ref.update_center(t_outs[t])
    ref.apply_center_update()
    ref_center = ref.center.numpy()

    import jax.numpy as jnp
    center = jnp.zeros((1, K), jnp.float32)
    our_losses = []
    for t in range(T):
        out = jnp.asarray(t_outs[t].numpy())
        t_sm = softmax_center_teacher(out, center, float(temps[t]))
        our_losses.append(float(dinov2_dino_loss(
            [jnp.asarray(s.numpy()) for s in s_outs[t]],
            [t_sm[:B], t_sm[B:]], student_temp=0.1)))
        center = center * 0.9 + jnp.mean(out, axis=0, keepdims=True) * 0.1
    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(center), ref_center,
                               rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_ibot_center_ema_sequence(ref_mods):
    """Same recurrence for the iBOT patch-loss center: the reference centers
    over the masked-token set each step (update_center receives the [1,U,K]
    masked head outputs, ibot_patch_loss.py:125-131)."""
    from apla_tpu.ssl.dinov2 import ibot_patch_loss, softmax_center_teacher

    iBOTPatchLoss = _load_ref_file(
        "self_supervised/dinov2/loss/ibot_patch_loss.py",
        "ref_ibot_loss_seq").iBOTPatchLoss

    torch.manual_seed(4)
    B, N, K, T = 4, 16, 32, 5
    ref = iBOTPatchLoss(patch_out_dim=K, student_temp=0.1,
                        center_momentum=0.9)
    import jax.numpy as jnp
    center = jnp.zeros((1, K), jnp.float32)
    ref_losses, our_losses = [], []
    for t in range(T):
        masks = torch.rand(B, N) < 0.4
        U = int(masks.sum())
        s_masked = torch.randn(U, K)
        t_masked = torch.randn(U, K)
        w = ((1 / masks.sum(-1).clamp(min=1.0))
             .unsqueeze(-1).expand_as(masks)[masks])

        t_sm = ref.softmax_center_teacher(
            t_masked.unsqueeze(0), teacher_temp=0.05).squeeze(0)
        ref_losses.append(float(ref.forward_masked(
            s_masked, t_sm, masks, masks_weight=w)))
        ref.update_center(t_masked.unsqueeze(0))

        t_j = jnp.asarray(t_masked.numpy())
        t_sm_j = softmax_center_teacher(t_j, center, 0.05)
        our_losses.append(float(ibot_patch_loss(
            jnp.asarray(s_masked.numpy()), t_sm_j,
            jnp.asarray(w.numpy()), n_images=B, student_temp=0.1)))
        # our in-step update: masked mean with an all-valid mask == the
        # reference's mean-over-masked-tokens
        center = center * 0.9 + jnp.mean(t_j, axis=0, keepdims=True) * 0.1
    ref.apply_center_update()
    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(center), ref.center.numpy()[0],
                               rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_teacher_momentum_sequence(ref_mods):
    """The reference teacher EMA (torch._foreach mul/add, models.py:443-453)
    vs our tree_map lerp (dinov2.py:595-599), over steps with a changing
    momentum schedule and an evolving student."""
    torch.manual_seed(5)
    leaves_t = [torch.randn(4, 4), torch.randn(7)]
    student_t = [torch.randn(4, 4), torch.randn(7)]
    import jax.numpy as jnp
    # .copy(): jnp.asarray can alias the torch-owned buffer on CPU, and the
    # torch side mutates these tensors in place (_foreach_mul_)
    teacher_j = {"a": jnp.asarray(leaves_t[0].numpy().copy()),
                 "b": jnp.asarray(leaves_t[1].numpy().copy())}
    student_j = {"a": jnp.asarray(student_t[0].numpy().copy()),
                 "b": jnp.asarray(student_t[1].numpy().copy())}
    momenta = np.linspace(0.992, 1.0, 5)
    for m in momenta:
        # reference update_teacher body
        torch._foreach_mul_(leaves_t, float(m))
        torch._foreach_add_(leaves_t, student_t, alpha=1 - float(m))
        # our in-step lerp
        mj = jnp.asarray(m, jnp.float32)
        teacher_j = jax.tree.map(lambda tt, s: tt * mj + s * (1.0 - mj),
                                 teacher_j, student_j)
        # student drifts between steps on both sides
        with torch.no_grad():
            for i, p in enumerate(student_t):
                p += 0.01 * (i + 1)
        student_j = jax.tree.map(
            lambda s: s + 0.01 * (1 + (s.ndim == 1)), student_j)
    np.testing.assert_allclose(np.asarray(teacher_j["a"]),
                               leaves_t[0].numpy(), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(teacher_j["b"]),
                               leaves_t[1].numpy(), rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_full_mode_trajectory_parity(ref_mods):
    """partial_size='full' (the shipped ISIC2019 SSL recipe's adaptation):
    the reference realises it as requires_grad on every attn.proj
    (build_apla is_multi_gpu branch, apla_vit.py:65-74).  10 supervised
    steps, constant lr AdamW: loss trajectory + final proj params match."""
    ref_vit, _, ref_apla = ref_mods

    torch.manual_seed(2)
    model = ref_vit.VisionTransformer(
        img_size=[IMG], patch_size=PATCH, embed_dim=DIM, depth=DEPTH,
        num_heads=HEADS, mlp_ratio=4, qkv_bias=True,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
        pretrained_type="dinov2")
    plain_sd = copy.deepcopy(model.state_dict())
    head = torch.nn.Linear(DIM, N_CLASSES)
    head0 = (head.weight.detach().numpy().T.copy(),
             head.bias.detach().numpy().copy())

    model = ref_apla.build_apla(EasyDict({"partial_size": "full"}), model,
                                "apla_attn", is_multi_gpu=True)
    params = _dino_param_groups(
        list(model.named_parameters()) + list(head.named_parameters()), WD)
    optimizer = torch.optim.AdamW(params, lr=1e-3, weight_decay=WD)

    rng = np.random.default_rng(2)
    batches = [(rng.standard_normal((BATCH, IMG, IMG, 3)).astype(np.float32),
                rng.integers(0, N_CLASSES, BATCH).astype(np.int64))
               for _ in range(10)]
    t_losses = []
    model.train(); head.train()
    for x_np, y_np in batches:
        optimizer.zero_grad()
        logits = head(model(torch.from_numpy(x_np.transpose(0, 3, 1, 2))))
        loss = torch.nn.functional.cross_entropy(
            logits, torch.from_numpy(y_np))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(
            list(model.parameters()) + list(head.parameters()), CLIP)
        optimizer.step()
        t_losses.append(float(loss.detach()))

    cfg = ViTConfig(img_size=IMG, patch_size=PATCH, embed_dim=DIM,
                    depth=DEPTH, num_heads=HEADS,
                    compute_dtype=jnp.float32)
    from apla_tpu.apla.core import build_apla as our_build_apla
    vit_params = jax.tree.map(
        jnp.asarray, convert_torch_vit_state_dict(plain_sd, depth=DEPTH))
    bt, bf = our_build_apla(vit_params, cfg, AplaConfig(partial_size="full"))
    trainable = {"backbone": bt,
                 "fc": {"kernel": jnp.asarray(head0[0]),
                        "bias": jnp.asarray(head0[1])}}
    frozen = {"backbone": bf}
    tx = build_optimizer("AdamW", {"lr": 1e-3, "weight_decay": WD},
                         trainable, grad_clip=CLIP)
    state = TrainState.create(trainable, tx)
    step = make_train_step(cfg, tx, cross_entropy)
    o_losses = []
    key = jax.random.PRNGKey(0)
    for x_np, y_np in batches:
        batch = {"image": jnp.asarray(x_np),
                 "label": jnp.asarray(y_np.astype(np.int32))}
        state, m = step(state, frozen, batch, 1e-3, key)
        o_losses.append(float(m["loss"]))
    np.testing.assert_allclose(o_losses, t_losses, rtol=2e-3, atol=2e-4)

    ours_proj = np.asarray(
        state.trainable["backbone"]["blocks"]["attn"]["proj"]["kernel"])
    for i in range(DEPTH):
        ref_w = model.blocks[i].attn.proj.weight.detach().numpy()  # [d,d]
        np.testing.assert_allclose(ours_proj[i].T, ref_w,
                                   rtol=5e-3, atol=5e-5)
