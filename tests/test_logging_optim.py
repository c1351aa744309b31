"""RunLogger wandb wiring (reference main.py:178-199,228-238) and the
weight-decay mask rule (reference wrappers.py:204-221)."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class _FakeRun:
    def __init__(self, **kw):
        self.kw = kw
        self.logged = []
        self.finished = False
        self.id = "fake123"
        self.dir = "/tmp/fake_wandb/wandb/run"

    def log(self, metrics, step=None):
        self.logged.append((step, metrics))

    def finish(self):
        self.finished = True


def _install_fake_wandb(monkeypatch):
    mod = types.ModuleType("wandb")
    mod.runs = []

    def init(**kw):
        run = _FakeRun(**kw)
        mod.runs.append(run)
        return run

    mod.init = init
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return mod


def test_runlogger_attaches_wandb(tmp_path, monkeypatch):
    from apla_tpu.utils.logging import RunLogger

    mod = _install_fake_wandb(monkeypatch)
    logger = RunLogger(str(tmp_path), run_name="r", use_wandb=True,
                       config={"a": 1}, project="APLA", resume=True)
    assert len(mod.runs) == 1
    run = mod.runs[0]
    assert run.kw["project"] == "APLA"
    assert run.kw["name"] == "r"
    assert run.kw["resume"] is True
    logger.log({"loss": 0.5}, step=7)
    assert run.logged == [(7, {"loss": 0.5})]
    logger.finish()
    assert run.finished
    # JSONL stream still primary
    assert (tmp_path / "r.metrics.jsonl").exists()


def test_runlogger_wandb_off_by_flag(tmp_path, monkeypatch):
    from apla_tpu.utils.logging import RunLogger

    mod = _install_fake_wandb(monkeypatch)
    RunLogger(str(tmp_path), run_name="r", use_wandb=False)
    assert mod.runs == []


def test_trainer_passes_log_params(tmp_path, monkeypatch):
    """make_run_logger resolves DEFINED_BY_MODEL_NAME and project_name from
    log_params, offline/restore flags from training_params."""
    from apla_tpu.utils.config import EDict
    from apla_tpu.utils.logging import make_run_logger

    mod = _install_fake_wandb(monkeypatch)

    class T:
        model_name = "my_model"
        save_dir = str(tmp_path)
        is_dry = False
        is_debug = False

    class W:
        log_params = EDict(project_name="PROJ",
                           run_name="DEFINED_BY_MODEL_NAME")
        training_params = EDict(offline=True, restore_session=False)
        parameters = EDict()

    make_run_logger(W(), T())
    run = mod.runs[0]
    assert run.kw["name"] == "my_model"
    assert run.kw["project"] == "PROJ"
    assert run.kw["mode"] == "offline"


def test_wd_mask_exempts_stacked_vectors():
    """Stacked block params are [L, ...]; per-block biases/norm scales/
    LayerScale gammas/proj_bt must NOT be decayed despite ndim >= 2."""
    from apla_tpu.train.optim import wd_mask

    params = {
        "blocks": {
            "norm1": {"scale": jnp.ones((12, 768)),
                      "bias": jnp.zeros((12, 768))},
            "ls1": {"gamma": jnp.ones((12, 768))},
            "attn": {"proj_wt": jnp.ones((12, 768, 128)),
                     "proj_bt": jnp.ones((12, 128)),
                     "qkv": {"kernel": jnp.ones((12, 768, 2304)),
                             "bias": jnp.zeros((12, 2304))}},
        },
        "head": {"fc": {"kernel": jnp.ones((768, 10)),
                        "bias": jnp.zeros((10,))}},
        "cls_token": jnp.ones((1, 1, 768)),
    }
    mask = wd_mask(params)
    b = mask["blocks"]
    assert b["norm1"]["scale"] is False and b["norm1"]["bias"] is False
    assert b["ls1"]["gamma"] is False
    assert b["attn"]["proj_bt"] is False
    assert b["attn"]["qkv"]["bias"] is False
    # kernels and the APLA weight slice DO decay (reference: 2-D non-bias)
    assert b["attn"]["proj_wt"] is True
    assert b["attn"]["qkv"]["kernel"] is True
    assert mask["head"]["fc"]["kernel"] is True
    assert mask["head"]["fc"]["bias"] is False
    assert mask["cls_token"] is True  # torch ndim!=1, not a .bias -> decayed


def test_eval_step_per_sample_losses():
    """eval_step returns per-sample losses so padded val batches don't bias
    val_loss (drives ReduceLROnPlateau)."""
    from apla_tpu.models.vit import ViTConfig
    from apla_tpu.models.classifier import init_classifier
    from apla_tpu.train.losses import cross_entropy
    from apla_tpu.train.steps import make_eval_step

    cfg = ViTConfig(img_size=16, patch_size=8, embed_dim=32, depth=1,
                    num_heads=2, compute_dtype=jnp.float32)
    trainable, frozen = init_classifier(jax.random.PRNGKey(0), cfg,
                                        n_classes=4)
    step = make_eval_step(cfg, cross_entropy)
    batch = {"image": jnp.zeros((6, 16, 16, 3)),
             "label": jnp.arange(6, dtype=jnp.int32) % 4}
    losses, logits = step(trainable, frozen, batch)
    assert losses.shape == (6,)
    assert logits.shape == (6, 4)
    assert np.all(np.isfinite(np.asarray(losses)))


def test_accum_steps_matches_full_batch():
    """accum_steps=2 (lax.scan over microbatches) produces the same update
    as the full-batch step (deterministic path, equal micro sizes)."""
    from apla_tpu.models.vit import ViTConfig
    from apla_tpu.models.classifier import init_classifier
    from apla_tpu.train.losses import cross_entropy
    from apla_tpu.train.optim import build_optimizer
    from apla_tpu.train.steps import make_train_step
    from apla_tpu.train.train_state import TrainState

    cfg = ViTConfig(img_size=16, patch_size=8, embed_dim=32, depth=2,
                    num_heads=2, compute_dtype=jnp.float32)
    trainable, frozen = init_classifier(jax.random.PRNGKey(0), cfg,
                                        n_classes=4)
    batch = {
        "image": jnp.asarray(
            np.random.default_rng(0).standard_normal((8, 16, 16, 3)),
            jnp.float32),
        "label": jnp.asarray(np.arange(8) % 4, jnp.int32),
    }
    rng = jax.random.PRNGKey(1)

    outs = {}
    for accum in (1, 2, 4):
        # fresh optimizer per run: the donated step consumes opt_state,
        # including the inject_hyperparams scalars a shared tx would reuse
        tx = build_optimizer("SGD", {"lr": 0.1, "weight_decay": 0.0},
                             trainable)
        state = TrainState.create(jax.tree.map(jnp.copy, trainable), tx)
        step = make_train_step(cfg, tx, cross_entropy, accum_steps=accum)
        state, m = step(state, frozen, batch, 0.1, rng)
        outs[accum] = (float(m["loss"]),
                       np.asarray(state.trainable["fc"]["kernel"]))
    np.testing.assert_allclose(outs[1][0], outs[2][0], rtol=2e-5)
    np.testing.assert_allclose(outs[1][1], outs[2][1], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(outs[1][1], outs[4][1], rtol=1e-4, atol=1e-6)
    assert outs[2][1].shape == outs[1][1].shape


def test_async_checkpoint_roundtrip(tmp_path):
    """async_save writes on a background thread; load waits for it."""
    from apla_tpu.models.vit import ViTConfig
    from apla_tpu.models.classifier import init_classifier
    from apla_tpu.train.checkpoint import (load_checkpoint, save_checkpoint,
                                           wait_for_async_save)
    from apla_tpu.train.optim import build_optimizer
    from apla_tpu.train.train_state import TrainState

    cfg = ViTConfig(img_size=16, patch_size=8, embed_dim=32, depth=1,
                    num_heads=2, compute_dtype=jnp.float32)
    trainable, frozen = init_classifier(jax.random.PRNGKey(0), cfg,
                                        n_classes=4)
    tx = build_optimizer("SGD", {"lr": 0.1}, trainable)
    state = TrainState.create(trainable, tx)
    path = str(tmp_path / "ck")
    save_checkpoint(path, state=state, frozen=frozen, epoch=3,
                    async_save=True)
    # load_checkpoint joins the pending write internally
    st2, fr2, manifest, _, _ = load_checkpoint(
        path, state_template=state, frozen_template=frozen)
    assert manifest["epoch"] == 3
    np.testing.assert_array_equal(
        np.asarray(st2.trainable["fc"]["kernel"]),
        np.asarray(state.trainable["fc"]["kernel"]))
    wait_for_async_save()  # idempotent


def test_skip_nonfinite_updates():
    """skip_nonfinite guard: a NaN batch must leave params and optimizer
    state untouched while a clean batch updates normally."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from apla_tpu.apla.core import AplaConfig
    from apla_tpu.models.classifier import init_classifier
    from apla_tpu.models.vit import ViTConfig
    from apla_tpu.train.losses import cross_entropy
    from apla_tpu.train.optim import build_optimizer
    from apla_tpu.train.steps import make_train_step
    from apla_tpu.train.train_state import TrainState

    cfg = ViTConfig(img_size=16, patch_size=8, embed_dim=32, depth=1,
                    num_heads=2, compute_dtype=jnp.float32)
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg, n_classes=4,
        apla_cfg=AplaConfig(partial_size=4))
    tx = build_optimizer("AdamW", {"lr": 1e-3, "weight_decay": 0.0},
                         trainable)
    state = TrainState.create(trainable, tx)
    step = make_train_step(cfg, tx, cross_entropy, skip_nonfinite=True)

    good = {"image": jnp.ones((2, 16, 16, 3)),
            "label": jnp.zeros((2,), jnp.int32)}
    bad = {"image": jnp.full((2, 16, 16, 3), jnp.nan),
           "label": jnp.zeros((2,), jnp.int32)}

    w0 = np.asarray(state.trainable["fc"]["kernel"])
    state, m = step(state, frozen, bad, 1e-3, jax.random.PRNGKey(1))
    assert int(m["nonfinite"]) == 1
    np.testing.assert_array_equal(
        np.asarray(state.trainable["fc"]["kernel"]), w0)
    assert int(state.step) == 1  # step counter still advances

    state, m = step(state, frozen, good, 1e-3, jax.random.PRNGKey(1))
    assert int(m["nonfinite"]) == 0
    assert np.abs(np.asarray(state.trainable["fc"]["kernel"]) - w0).max() > 0


def test_bce_binary_no_broadcast():
    """Binary head (logits [B,1], integer labels [B]) must not broadcast
    into a [B,B] loss matrix (silent wrong objective)."""
    import jax.numpy as jnp
    import numpy as np
    import optax
    from apla_tpu.train.losses import bce_with_logits

    logits = jnp.asarray([[2.0], [-1.0], [0.5], [-0.2]])
    labels = jnp.asarray([1, 0, 0, 1])
    got = float(bce_with_logits(logits, labels))
    want = float(optax.sigmoid_binary_cross_entropy(
        logits[:, 0], labels.astype(jnp.float32)).mean())
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_onecycle_with_warmup_reference_composition():
    """OneCycleLR + LinearWarmup, REFERENCE-EXACT: both schedulers are
    iteration-based in MixedLRScheduler, so OneCycle (later in the list)
    overwrites the warmup's lr every step, and wrappers.py:272-276 builds it
    with div_factor=1.0 — the effective schedule is the bare cycle over ALL
    iterations starting at max_lr, with NO actual ramp (verified against the
    live torch composition: flat at max_lr through the up-phase, then
    cosine-anneals to max_lr/final_div_factor)."""
    from apla_tpu.train.schedules import LRScheduler
    s = LRScheduler(["LinearWarmup", "OneCycleLR"],
                    {"LinearWarmup": {"warmup_iters": 100},
                     "OneCycleLR": {"pct_start": 0.3}},
                    max_lr=1.0, steps_per_epoch=100, epochs=10)
    assert s.lr(0) == pytest.approx(1.0)     # div_factor=1: starts at max
    assert s.lr(299) == pytest.approx(1.0, abs=3e-3)  # flat up-phase
    assert s.lr(650) == pytest.approx(0.5, abs=0.01)  # mid-anneal
    assert s.lr(999) < 0.01                  # ends near max_lr/1e4
