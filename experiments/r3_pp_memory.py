"""Pipeline-parallel memory accounting on an 8-device virtual mesh.

Per-device parameter bytes and compile-time memory_analysis for ViT-B/14
@224 APLA-128 under (a) plain 8-way DP with replicated params and (b)
dp2 x pp4 collective pipelining (stage-sharded stacked blocks,
parallel/pipeline.py).  Stage sharding should cut the per-device block
param bytes ~4x — the blocks hold almost all of a ViT's weights — with
the trainable slices and optimizer state sharded the same way.

Run: python experiments/r3_pp_memory.py
"""

import json
import os
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from apla_tpu.apla.core import AplaConfig  # noqa: E402
from apla_tpu.models.classifier import init_classifier  # noqa: E402
from apla_tpu.models.vit import VIT_BUILDERS  # noqa: E402
from apla_tpu.parallel.mesh import (  # noqa: E402
    batch_sharding, make_mesh, replicated_sharding, shard_params)
from apla_tpu.parallel.pipeline import PipelineSpec  # noqa: E402
from apla_tpu.train.losses import cross_entropy  # noqa: E402
from apla_tpu.train.optim import build_optimizer  # noqa: E402
from apla_tpu.train.steps import make_train_step  # noqa: E402
from apla_tpu.train.train_state import TrainState  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "r3_pp_memory.jsonl")


def bytes_on_device(tree, dev):
    total = 0
    for leaf in jax.tree.leaves(tree):
        for s in leaf.addressable_shards:
            if s.device == dev:
                total += s.data.nbytes
    return total


def run(policy):
    cfg = VIT_BUILDERS["vit_base"](img_size=224, patch_size=14,
                                   has_layerscale=True,
                                   compute_dtype=jnp.bfloat16)
    trainable, frozen = init_classifier(
        jax.random.PRNGKey(0), cfg, n_classes=1000,
        apla_cfg=AplaConfig(partial_size=128))
    tx = build_optimizer("AdamW", {"lr": 1e-3, "weight_decay": 1e-5},
                         trainable, grad_clip=1.0)
    if policy == "pp":
        mesh = make_mesh(n_data=2, n_model=4)
        spec = PipelineSpec(mesh, n_stages=4, n_micro=4)
        trainable = shard_params(trainable, mesh, policy="pp")
        frozen = shard_params(frozen, mesh, policy="pp")
        state = TrainState.create(trainable, tx)
    else:
        mesh = make_mesh(n_data=8)
        spec = None
        trainable = jax.device_put(trainable, replicated_sharding(mesh))
        frozen = shard_params(frozen, mesh, policy="replicated")
        state = jax.device_put(TrainState.create(trainable, tx),
                               replicated_sharding(mesh))
    batch = {
        "image": jax.device_put(jnp.zeros((16, 224, 224, 3), jnp.float32),
                                batch_sharding(mesh)),
        "label": jax.device_put(jnp.zeros((16,), jnp.int32),
                                batch_sharding(mesh)),
    }
    step = make_train_step(cfg, tx, cross_entropy, pipeline=spec)
    compiled = step.lower(state, frozen, batch, 1e-3,
                          jax.random.PRNGKey(1)).compile()
    ma = compiled.memory_analysis()
    dev0 = mesh.devices.flat[0]
    rec = {
        "policy": policy,
        "frozen_MB_per_device": round(bytes_on_device(frozen, dev0) / 2**20, 1),
        "trainable_MB_per_device": round(
            bytes_on_device(state.trainable, dev0) / 2**20, 2),
        "opt_state_MB_per_device": round(
            bytes_on_device(state.opt_state, dev0) / 2**20, 2),
        "argument_MB": (round(ma.argument_size_in_bytes / 2**20, 1)
                        if ma else None),
        "temp_MB": (round(ma.temp_size_in_bytes / 2**20, 1) if ma else None),
        "t": int(time.time()),
    }
    state2, m = compiled(state, frozen, batch, 1e-3, jax.random.PRNGKey(1))
    rec["loss"] = round(float(m["loss"]), 4)
    return rec


def main():
    results = [run("replicated"), run("pp")]
    for r in results:
        print(r)
    with open(OUT, "a") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
