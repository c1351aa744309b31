"""FSDP frozen-param sharding: per-device memory accounting on an 8-device
mesh (virtual CPU devices; XLA memory_analysis is backend-exact for
arguments).  Compares replicated vs fsdp placement of the frozen backbone
for ViT-B/14 @224 APLA-128 (ViT-L aborts on a CPU-emulation
collective rendezvous timeout — an artifact of 8 virtual devices on one
host, not of the sharding; accounting scales linearly with model size) — the ZeRO-3-style policy should cut the frozen
share of per-chip argument bytes by ~8x.

Run: python experiments/r2_fsdp_memory.py
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
from apla_tpu.train.losses import cross_entropy  # noqa: E402
from apla_tpu.train.optim import build_optimizer  # noqa: E402
from apla_tpu.train.steps import make_train_step  # noqa: E402
from apla_tpu.train.train_state import TrainState  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "r2_fsdp_memory.jsonl")


def leaf_bytes_per_device(tree):
    total = 0
    for leaf in jax.tree.leaves(tree):
        sh = leaf.sharding
        n_shards = sh.mesh.shape["data"] if "data" in str(sh.spec) else 1
        total += leaf.nbytes // n_shards
    return total


def main():
    mesh = make_mesh(n_data=8)
    cfg = VIT_BUILDERS["vit_base"](img_size=224, patch_size=14,
                                    has_layerscale=True,
                                    compute_dtype=jnp.bfloat16)
    results = []
    for policy in ("replicated", "fsdp"):
        # fresh params per policy: the donated step call consumes the state
        trainable, frozen = init_classifier(
            jax.random.PRNGKey(0), cfg, n_classes=1000,
            apla_cfg=AplaConfig(partial_size=128))
        tx = build_optimizer("AdamW", {"lr": 1e-3, "weight_decay": 1e-5},
                             trainable, grad_clip=1.0)
        state = jax.device_put(TrainState.create(trainable, tx),
                               replicated_sharding(mesh))
        froz = shard_params(frozen, mesh, policy=policy)
        batch = {
            "image": jax.device_put(
                jnp.zeros((8, 224, 224, 3), jnp.float32),
                batch_sharding(mesh)),
            "label": jax.device_put(jnp.zeros((8,), jnp.int32),
                                    batch_sharding(mesh)),
        }
        step = make_train_step(cfg, tx, cross_entropy)
        lowered = step.lower(state, froz, batch, 1e-3, jax.random.PRNGKey(1))
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        frozen_pd = leaf_bytes_per_device(froz)
        rec = {
            "policy": policy,
            "frozen_bytes_per_device_MB": round(frozen_pd / 2**20, 1),
            "argument_MB": (round(ma.argument_size_in_bytes / 2**20, 1)
                            if ma else None),
            "temp_MB": (round(ma.temp_size_in_bytes / 2**20, 1)
                        if ma else None),
            "t": int(time.time()),
        }
        # run one step to prove it executes, not just compiles
        state2, m = compiled(state, froz, batch, 1e-3, jax.random.PRNGKey(1))
        rec["loss"] = round(float(m["loss"]), 4)
        results.append(rec)
        print(rec)

    with open(OUT, "a") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
