"""Worker process for test_multihost.py — NOT a test module.

Runs main.py's APLA_MULTIHOST bootstrap (jax.distributed.initialize with an
explicit coordinator), then drives one psum and one supervised APLA train
step over the 2-process x 4-device global mesh.  Prints one MULTIHOST_OK
line the parent asserts on.
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import main as apla_main  # noqa: E402


def run():
    assert apla_main.maybe_init_multihost(), "APLA_MULTIHOST not set?"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from apla_tpu.parallel.mesh import make_mesh, shard_batch, shard_params

    mesh = make_mesh(n_data=8)

    # ---- 1. a psum across the global (cross-process) data axis ----------
    vals = np.arange(8, dtype=np.float32)          # device d holds [d]
    xg = shard_batch({"x": vals}, mesh)["x"]
    psum_fn = jax.jit(jax.shard_map(
        lambda v: jax.lax.psum(jnp.sum(v), "data"),
        mesh=mesh, in_specs=P("data"), out_specs=P()))
    total = float(psum_fn(xg))
    assert total == 28.0, total

    # ---- 2. one supervised APLA train step over the global mesh ---------
    from apla_tpu.apla.core import AplaConfig
    from apla_tpu.models.classifier import init_classifier
    from apla_tpu.models.vit import ViTConfig
    from apla_tpu.train.losses import cross_entropy
    from apla_tpu.train.optim import build_optimizer
    from apla_tpu.train.steps import make_train_step
    from apla_tpu.train.train_state import TrainState

    cfg = ViTConfig(img_size=16, patch_size=8, embed_dim=32, depth=2,
                    num_heads=2, compute_dtype=jnp.float32)
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg, n_classes=4,
        apla_cfg=AplaConfig(partial_size=4))
    tx = build_optimizer("AdamW", {"lr": 1e-3}, trainable, grad_clip=1.0)
    state = shard_params(TrainState.create(trainable, tx), mesh)
    frozen = shard_params(frozen, mesh)

    rng = np.random.default_rng(0)  # same seed on every host (by design)
    batch = shard_batch({
        "image": rng.standard_normal((8, 16, 16, 3)).astype(np.float32),
        "label": (np.arange(8) % 4).astype(np.int32),
    }, mesh)
    step = make_train_step(cfg, tx, cross_entropy)
    state, m = step(state, frozen, batch, 1e-3, jax.random.PRNGKey(1))
    loss = float(m["loss"])            # replicated output: host-addressable
    assert loss == loss

    print(f"MULTIHOST_OK process={jax.process_index()} "
          f"psum={total} loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    run()
