"""Data-parallel correctness: the same global batch must produce identical
losses and updates on a 1-device and an 8-device mesh (XLA inserts the
gradient psum from shardings — this pins down that the collective math
matches single-device execution)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apla_tpu.apla.core import AplaConfig
from apla_tpu.models.classifier import init_classifier
from apla_tpu.models.vit import ViTConfig
from apla_tpu.parallel.mesh import make_mesh, replicated_sharding, shard_batch
from apla_tpu.train.losses import cross_entropy
from apla_tpu.train.optim import build_optimizer
from apla_tpu.train.steps import make_train_step
from apla_tpu.train.train_state import TrainState

CFG = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=4,
                compute_dtype=jnp.float32)


def _run_steps(n_devices, n_steps=3, param_sharding="replicated",
               accum=1, n_model=1, sp=False):
    from apla_tpu.parallel.mesh import shard_params
    mesh = make_mesh(n_data=n_devices // n_model, n_model=n_model,
                     devices=jax.devices()[:n_devices])
    token_sharding = None
    if sp:
        from jax.sharding import NamedSharding, PartitionSpec as P
        token_sharding = NamedSharding(mesh, P("data", "model", None))
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), CFG, n_classes=10,
        apla_cfg=AplaConfig(partial_size=8))
    tx = build_optimizer("AdamW", {"lr": 1e-3, "weight_decay": 1e-5},
                         trainable, grad_clip=1.0)
    state = jax.device_put(TrainState.create(trainable, tx),
                           replicated_sharding(mesh))
    frozen = shard_params(frozen, mesh, policy=param_sharding)
    step = make_train_step(CFG, tx, cross_entropy, accum_steps=accum,
                           token_sharding=token_sharding)
    rng = np.random.default_rng(0)
    losses = []
    for i in range(n_steps):
        batch = {
            "image": rng.standard_normal((16, 32, 32, 3)).astype(np.float32),
            "label": rng.integers(0, 10, 16).astype(np.int64),
        }
        state, m = step(state, frozen, shard_batch(batch, mesh), 1e-3,
                        jax.random.PRNGKey(7))
        losses.append(float(m["loss"]))
    wt = np.asarray(state.trainable["backbone"]["blocks"]["proj_wt"])
    return losses, wt


def test_dp_invariance_1_vs_8():
    l1, w1 = _run_steps(1)
    l8, w8 = _run_steps(8)
    np.testing.assert_allclose(l1, l8, rtol=1e-5)
    np.testing.assert_allclose(w1, w8, rtol=1e-5, atol=1e-7)


def test_fsdp_frozen_sharding_matches_replicated():
    """'fsdp' placement (frozen leaves sharded over the data axis) must be
    bit-compatible with replicated execution — XLA's inserted all-gathers
    change data movement, not math."""
    l_rep, w_rep = _run_steps(8)
    l_fsdp, w_fsdp = _run_steps(8, param_sharding="fsdp")
    np.testing.assert_allclose(l_rep, l_fsdp, rtol=1e-5)
    np.testing.assert_allclose(w_rep, w_fsdp, rtol=1e-5, atol=1e-7)


def test_tp_matches_replicated():
    """Megatron-style 'tp' frozen placement on a 2x4 (data x model) mesh is
    numerically the replicated computation — GSPMD inserts the
    block-boundary psums, the math is unchanged."""
    l_rep, w_rep = _run_steps(8)
    l_tp, w_tp = _run_steps(8, param_sharding="tp", n_model=4)
    np.testing.assert_allclose(l_rep, l_tp, rtol=1e-5)
    np.testing.assert_allclose(w_rep, w_tp, rtol=1e-5, atol=1e-7)


def test_tp_sp_matches_replicated():
    """Sequence parallelism (token stream constrained over the model axis
    every layer, Megatron TP+SP) is a pure GSPMD placement change: same
    losses and updates as the replicated run."""
    l_rep, w_rep = _run_steps(8)
    l_sp, w_sp = _run_steps(8, param_sharding="tp", n_model=4, sp=True)
    np.testing.assert_allclose(l_rep, l_sp, rtol=1e-5)
    np.testing.assert_allclose(w_rep, w_sp, rtol=1e-5, atol=1e-7)


def test_tp_sharding_tree_rules():
    from apla_tpu.parallel.mesh import tp_sharding_tree
    mesh = make_mesh(n_data=2, n_model=4)
    _, frozen = init_classifier(jax.random.PRNGKey(0), CFG, n_classes=10,
                                apla_cfg=AplaConfig(partial_size=8))
    sh = tp_sharding_tree(mesh, frozen)
    blocks = sh["backbone"]["blocks"]
    assert blocks["attn"]["qkv"]["kernel"].spec == \
        jax.sharding.PartitionSpec(None, None, "model")   # column-parallel
    assert blocks["attn"]["proj"]["kernel"].spec == \
        jax.sharding.PartitionSpec(None, "model", None)   # row-parallel
    assert blocks["mlp"]["fc1"]["kernel"].spec == \
        jax.sharding.PartitionSpec(None, None, "model")
    assert blocks["mlp"]["fc2"]["kernel"].spec == \
        jax.sharding.PartitionSpec(None, "model", None)
    # row-parallel bias + norms replicated
    assert blocks["attn"]["proj"]["bias"].spec == \
        jax.sharding.PartitionSpec()
    assert blocks["norm1"]["scale"].spec == jax.sharding.PartitionSpec()


def test_fsdp_sharding_tree_shards_large_leaves():
    from apla_tpu.parallel.mesh import fsdp_sharding_tree
    mesh = make_mesh(n_data=8)
    tree = {
        "big": jnp.zeros((2, 64, 1024)),     # sharded (dim 2: 1024 % 8 == 0)
        "stacked": jnp.zeros((12, 768, 64)),  # sharded on dim 1, not depth
        "tiny": jnp.zeros((64,)),            # replicated (below min_size)
        "odd": jnp.zeros((3, 333, 333)),     # replicated (no divisible dim)
    }
    sh = fsdp_sharding_tree(mesh, tree, min_size=1024)
    from jax.sharding import PartitionSpec as P
    assert sh["big"].spec == P(None, None, "data")
    assert sh["stacked"].spec == P(None, "data", None)
    assert sh["tiny"].spec == P()
    assert sh["odd"].spec == P()


def test_uneven_batch_padding():
    from apla_tpu.parallel.mesh import pad_to_multiple
    batch = {"image": np.zeros((13, 4, 4, 3)), "label": np.arange(13)}
    padded, n = pad_to_multiple(batch, 8)
    assert n == 13
    assert padded["image"].shape[0] == 16
    # padded rows repeat the last row (edge mode)
    assert padded["label"][-1] == 12


def test_fsdp_with_accum_matches_replicated():
    """fsdp frozen sharding composed with the accum_steps microbatch scan:
    the all-gathers inside the scanned micro body must still produce the
    replicated update bit-for-bit."""
    l_rep, w_rep = _run_steps(8, param_sharding="replicated", accum=2)
    l_f, w_f = _run_steps(8, param_sharding="fsdp", accum=2)
    np.testing.assert_allclose(l_rep, l_f, rtol=1e-5)
    np.testing.assert_allclose(w_rep, w_f, rtol=1e-5, atol=1e-7)


def test_fsdp_placement_survives_resume(tmp_path):
    """load_session must re-apply the param-sharding policy — a resumed
    fsdp run would otherwise silently replicate the frozen backbone."""
    from jax.sharding import PartitionSpec as P

    from apla_tpu.train.trainer import Trainer
    from apla_tpu.utils.config import load_merged_params
    from apla_tpu.wrapper import DefaultWrapper
    import os

    PARAMS = os.path.join(os.path.dirname(__file__), "..", "params",
                          "synthetic", "vit_tiny", "apla.yml")
    params = load_merged_params(PARAMS)
    params.training_params.save_dir = str(tmp_path)
    params.training_params.model_name = "m"
    params.system_params.param_sharding = "fsdp"
    wrapper = DefaultWrapper(params)
    wrapper.instantiate()
    trainer = Trainer(wrapper)
    trainer.save_session(epoch=0)
    trainer.load_session()
    specs = [leaf.sharding.spec for leaf in jax.tree.leaves(trainer.frozen)]
    assert any(s != P() for s in specs), "frozen lost fsdp placement"
