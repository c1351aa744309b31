"""Pipeline parallelism correctness (parallel/pipeline.py).

The collective pipeline (stage-sharded stacked blocks, ppermute microbatch
rotation inside one shard_map) must be a pure placement change: losses,
gradients, and N-step training trajectories identical to the plain scanned
trunk.  Beyond the reference (DP only — SURVEY §2.9); the schedule is the
scaling-book collective-pipelining recipe.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apla_tpu.apla.core import AplaConfig
from apla_tpu.models.classifier import classifier_forward, init_classifier
from apla_tpu.models.vit import ViTConfig
from apla_tpu.parallel.mesh import (make_mesh, replicated_sharding,
                                    shard_batch, shard_params)
from apla_tpu.parallel.pipeline import PipelineSpec
from apla_tpu.train.losses import cross_entropy
from apla_tpu.train.optim import build_optimizer
from apla_tpu.train.steps import make_train_step
from apla_tpu.train.train_state import TrainState

CFG = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=4, num_heads=4,
                compute_dtype=jnp.float32)


def _init(apla=True):
    apla_cfg = AplaConfig(partial_size=8) if apla else None
    return init_classifier(jax.random.PRNGKey(0), CFG, n_classes=10,
                           apla_cfg=apla_cfg,
                           freeze_backbone=not apla)


def _batch(rng, b=16):
    return {
        "image": rng.standard_normal((b, 32, 32, 3)).astype(np.float32),
        "label": rng.integers(0, 10, b).astype(np.int64),
    }


def _loss_and_grads(trainable, frozen, batch, pipeline=None):
    def loss_fn(t):
        logits = classifier_forward(t, frozen, batch["image"], CFG,
                                    deterministic=True, pipeline=pipeline)
        return cross_entropy(logits, batch["label"])
    return jax.jit(jax.value_and_grad(loss_fn))(trainable)


@pytest.mark.parametrize("stages,micro", [(2, 2), (4, 4), (4, 2), (2, 4),
                                          (4, 1)])
def test_pipeline_matches_plain_forward_and_grads(stages, micro):
    trainable, frozen = _init()
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    ref_loss, ref_grads = _loss_and_grads(trainable, frozen, batch)

    mesh = make_mesh(n_data=8 // stages, n_model=stages)
    spec = PipelineSpec(mesh, stages, micro)
    t_s = shard_params(trainable, mesh, policy="pp")
    f_s = shard_params(frozen, mesh, policy="pp")
    b_s = shard_batch(batch, mesh)
    loss, grads = _loss_and_grads(t_s, f_s, b_s, pipeline=spec)

    np.testing.assert_allclose(float(loss), float(ref_loss),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def _run_steps(n_steps=3, pipeline_stages=0, micro=2, accum=1):
    trainable, frozen = _init()
    tx = build_optimizer("AdamW", {"lr": 1e-3, "weight_decay": 1e-5},
                         trainable, grad_clip=1.0)
    if pipeline_stages:
        mesh = make_mesh(n_data=8 // pipeline_stages,
                         n_model=pipeline_stages)
        spec = PipelineSpec(mesh, pipeline_stages, micro)
        trainable = shard_params(trainable, mesh, policy="pp")
        frozen = shard_params(frozen, mesh, policy="pp")
        state = TrainState.create(trainable, tx)
    else:
        mesh = make_mesh(n_data=8)
        spec = None
        state = jax.device_put(TrainState.create(trainable, tx),
                               replicated_sharding(mesh))
        frozen = shard_params(frozen, mesh, policy="replicated")
    step = make_train_step(CFG, tx, cross_entropy, accum_steps=accum,
                           pipeline=spec)
    rng = np.random.default_rng(0)
    losses = []
    for _ in range(n_steps):
        state, m = step(state, frozen, shard_batch(_batch(rng), mesh),
                        1e-3, jax.random.PRNGKey(7))
        losses.append(float(m["loss"]))
    wt = np.asarray(state.trainable["backbone"]["blocks"]["proj_wt"])
    return losses, wt


@pytest.mark.slow
def test_pipeline_training_trajectory_matches_plain():
    """3 AdamW steps through the full train_step: the pipeline is a pure
    placement change (same losses, same trainable updates)."""
    l_ref, w_ref = _run_steps()
    l_pp, w_pp = _run_steps(pipeline_stages=4, micro=2)
    np.testing.assert_allclose(l_ref, l_pp, rtol=1e-5)
    np.testing.assert_allclose(w_ref, w_pp, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_pipeline_composes_with_accum():
    l_ref, w_ref = _run_steps(accum=2)
    l_pp, w_pp = _run_steps(pipeline_stages=2, micro=2, accum=2)
    np.testing.assert_allclose(l_ref, l_pp, rtol=1e-5)
    np.testing.assert_allclose(w_ref, w_pp, rtol=1e-4, atol=1e-6)


def test_pipeline_dropout_rng_runs():
    """Non-deterministic mode (drop-path rngs folded per microbatch tick)
    must at least run and produce finite loss — stochastic parity with the
    plain path is not expected (different fold-in structure)."""
    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=4,
                    num_heads=4, compute_dtype=jnp.float32,
                    drop_path_rate=0.2)
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg, n_classes=10,
        apla_cfg=AplaConfig(partial_size=8))
    mesh = make_mesh(n_data=4, n_model=2)
    spec = PipelineSpec(mesh, 2, 2)
    t_s = shard_params(trainable, mesh, policy="pp")
    f_s = shard_params(frozen, mesh, policy="pp")
    rng = np.random.default_rng(0)
    batch = shard_batch(_batch(rng), mesh)

    def loss_fn(t):
        logits = classifier_forward(t, f_s, batch["image"], cfg,
                                    rng=jax.random.PRNGKey(3),
                                    deterministic=False, pipeline=spec)
        return cross_entropy(logits, batch["label"])

    loss = jax.jit(loss_fn)(t_s)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_dinov2_pipeline_matches_plain(tmp_path):
    """The DINOv2 step (teacher + student global + student local trunks)
    consumes the PP placement; one full step on ONE shared collated batch
    (the iBOT mask collate is rng-drawn) matches the plain run."""
    import os as _os

    from apla_tpu.ssl.dinov2 import Dinov2Trainer, DINOv2Wrapper
    from apla_tpu.utils.config import load_merged_params
    shared_batch = {}

    def run(**system):
        params = load_merged_params(_os.path.join(
            _os.path.dirname(__file__), "..", "params", "synthetic",
            "vit_tiny", "dinov2.yml"))
        params.training_params.epochs = 1
        params.training_params.val_every = 10
        params.training_params.save_dir = str(tmp_path / str(len(system)))
        params.training_params.use_mixed_precision = False
        params.dataset_params.synthetic_size = 8
        for ld in ("trainloader", "valloader", "testloader"):
            params.dataloader_params[ld].batch_size = 8
            params.dataloader_params[ld].shuffle = False
        for k, v in system.items():
            params.system_params[k] = v
        wrapper = DINOv2Wrapper(params)
        wrapper.instantiate(seed=0)
        trainer = Dinov2Trainer(wrapper)
        if not shared_batch:
            shared_batch["b"] = next(iter(wrapper.dataloaders.trainloader))
        step_fn = trainer._get_step(True)
        state, m = step_fn(trainer.state, trainer.frozen,
                           trainer._device_batch(shared_batch["b"]), 1e-4,
                           1e-5, 0.99, 0.04, jax.random.PRNGKey(3))
        return state, m

    s_ref, m_ref = run()
    s_pp, m_pp = run(pipeline_parallel=2, pp_microbatches=2)
    # rtol 1e-3: the pipelined program fuses/reassociates differently, and
    # the teacher-temp softmax amplifies f32-level trunk diffs ~1/temp
    # (=25x) into the CE; the trunk itself is BIT-identical pp-vs-plain in
    # isolation (probe in the commit message), so this is reduction-order
    # noise, not a semantic gap
    np.testing.assert_allclose(float(m_ref["loss"]), float(m_pp["loss"]),
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(s_ref.dino_center),
                               np.asarray(s_pp.dino_center), rtol=1e-3,
                               atol=1e-6)
    w_ref = np.asarray(s_ref.trainable["backbone"]["blocks"]["proj_wt"])
    w_pp = np.asarray(s_pp.trainable["backbone"]["blocks"]["proj_wt"])
    np.testing.assert_allclose(w_ref, w_pp, atol=2.5e-4)  # ~2*lr


def test_pp_plus_sp_rejected():
    from apla_tpu.utils.config import EDict
    from apla_tpu.wrapper import DefaultWrapper
    w = DefaultWrapper.__new__(DefaultWrapper)
    w.system_params = EDict({"pipeline_parallel": 2,
                             "sequence_parallel": True})
    with pytest.raises(ValueError, match="composes with tensor_parallel"):
        w.init_mesh()


def _ssl_params(tmp_path, **system):
    import os as _os

    from apla_tpu.utils.config import load_merged_params
    params = load_merged_params(_os.path.join(
        _os.path.dirname(__file__), "..", "params", "synthetic",
        "vit_tiny", "apla.yml"))
    params.training_params.epochs = 1
    params.training_params.save_dir = str(tmp_path)
    # f32: in bf16 the pipeline's different reduction order drifts ~1e-3
    # by step 2, which would force a vacuous tolerance
    params.training_params.use_mixed_precision = False
    params.dataset_params.synthetic_size = 64
    for ld in ("trainloader", "valloader", "testloader"):
        params.dataloader_params[ld].batch_size = 16
    params.dataset_params.ssl_global_size = 32
    params.dataset_params.ssl_local_size = 16
    for k, v in system.items():
        params.system_params[k] = v
    return params


def _byol_two_steps(tmp_path, **system):
    from apla_tpu.ssl.byol import BYOLTrainer, BYOLWrapper
    wrapper = BYOLWrapper(_ssl_params(tmp_path, **system),
                          use_momentum=True)
    wrapper.instantiate()
    trainer = BYOLTrainer(wrapper)
    loader = wrapper.dataloaders.trainloader
    loader.set_epoch(0)
    state, losses = trainer.state, []
    for i, batch in enumerate(loader):
        if i == 2:
            break
        views = trainer._device_views(batch)
        state, m = trainer.train_step(state, trainer.frozen, views,
                                      1e-3, 0.99, trainer.rng)
        losses.append(float(m["loss"]))
    wt = np.asarray(state.trainable["backbone"]["blocks"]["proj_wt"])
    return losses, wt


@pytest.mark.slow
def test_byol_pipeline_matches_plain(tmp_path):
    """The BYOL step consumes the PP placement: two trainer steps through
    the real wrapper produce identical losses/updates with and without
    pipeline_parallel (vit_tiny has zero dropout, so rng folding
    differences are inert)."""
    l_ref, w_ref = _byol_two_steps(tmp_path / "plain")
    l_pp, w_pp = _byol_two_steps(tmp_path / "pp", pipeline_parallel=2,
                                 pp_microbatches=2)
    np.testing.assert_allclose(l_ref, l_pp, rtol=2e-4)
    # early AdamW steps amplify f32 reduction-order grad noise to ~±lr on
    # near-zero-grad coords (update ≈ lr·sign(g) under bias correction), so
    # weights get an absolute tolerance of ~2·lr; the losses above pin the
    # actual computation
    np.testing.assert_allclose(w_ref, w_pp, atol=2.5e-3)


@pytest.mark.slow
def test_dino_pipeline_matches_plain(tmp_path):
    from apla_tpu.ssl.dino import DINOTrainer, DINOWrapper

    def two_steps(path, **system):
        wrapper = DINOWrapper(_ssl_params(path, **system))
        wrapper.instantiate()
        trainer = DINOTrainer(wrapper)
        loader = wrapper.dataloaders.trainloader
        loader.set_epoch(0)
        state, losses = trainer.state, []
        step = trainer._get_step(False)
        for i, batch in enumerate(loader):
            if i == 2:
                break
            g, l = trainer._stack_views(batch)
            state, m = step(state, trainer.frozen, g, l, 1e-3, 1e-5,
                            0.99, 0.04, trainer.rng)
            losses.append(float(m["loss"]))
        wt = np.asarray(state.trainable["backbone"]["blocks"]["proj_wt"])
        return losses, wt

    l_ref, w_ref = two_steps(tmp_path / "plain")
    l_pp, w_pp = two_steps(tmp_path / "pp", pipeline_parallel=2,
                           pp_microbatches=2)
    np.testing.assert_allclose(l_ref, l_pp, rtol=2e-4)
    np.testing.assert_allclose(w_ref, w_pp, rtol=1e-3, atol=1e-6)


def test_pp_sharding_tree_shards_only_blocks():
    from apla_tpu.parallel.mesh import pp_sharding_tree
    trainable, frozen = _init()
    mesh = make_mesh(n_data=2, n_model=4)
    sh = pp_sharding_tree(mesh, frozen)
    flat, _ = jax.tree_util.tree_flatten_with_path(sh)
    assert flat
    for path, s in flat:
        name = jax.tree_util.keystr(path)
        if "blocks" in name:
            assert s.spec == jax.sharding.PartitionSpec("model"), (name, s)
        else:
            assert s.spec == jax.sharding.PartitionSpec(), (name, s)
