"""Device mesh + sharding helpers.

The reference's only parallelism is single-node data-parallel DDP over NCCL
(`launch.py:49-58`, `wrappers.py:182-184`).  TPU-native equivalent: a
`jax.sharding.Mesh` over ICI with the batch sharded on a 'data' axis and
params replicated — XLA inserts the gradient psum, which under APLA covers
only the trainable slices (collective volume ∝ rank·dim per block, the
memory/latency win the reference README claims).

A 'model' axis is laid out from the start so tensor-parallel shardings can be
added without re-plumbing (post-parity stretch; absent in the reference).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    n = n_data * n_model
    mesh_devices = mesh_utils.create_device_mesh((n_data, n_model),
                                                 devices=devices[:n])
    return Mesh(mesh_devices, ("data", "model"))


def fsdp_sharding_tree(mesh: Mesh, tree, axis: str = "data",
                       min_size: int = 2 ** 16):
    """Per-leaf NamedShardings that shard each large param leaf over `axis`
    (ZeRO-3 / FSDP-style, the GSPMD way: annotate the placement, XLA inserts
    the all-gathers next to each layer's use inside the scan and
    reduce-scatters any grads).

    Under APLA the frozen backbone dominates memory while gradients exist
    only for the tiny trainable slices — sharding the frozen pytree over the
    data axis cuts per-chip HBM by the mesh size with no extra gradient
    collectives.  Rule: shard the largest dim divisible by the axis size
    (skipping tiny leaves, which stay replicated).
    """
    n = mesh.shape[axis]

    def leaf_sharding(x):
        if n == 1 or x.size < min_size:
            return NamedSharding(mesh, P())
        # largest divisible dim (prefer trailing dims on ties: contiguous
        # shards, and the leading dim of stacked block params is the scanned
        # depth axis which must stay whole)
        dims = sorted(range(x.ndim), key=lambda i: (x.shape[i], i))
        for i in reversed(dims):
            if i > 0 and x.shape[i] % n == 0:
                spec = [None] * x.ndim
                spec[i] = axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(leaf_sharding, tree)


def tp_sharding_tree(mesh: Mesh, tree, axis: str = "model"):
    """Megatron-style tensor-parallel NamedShardings for the ViT frozen
    pytree over the mesh's `model` axis (beyond the reference, which has DP
    only — SURVEY §2.9 lists head-TP as the natural post-parity stretch):

      column-parallel (output dim sharded):  qkv / fc1 / w12 kernels+biases
      row-parallel    (input dim sharded):   proj / fc2 / w3 kernels
      everything else (norms, embeddings, LayerScale, inds, biases of
      row-parallel layers) replicated.

    Pure GSPMD: annotate the placements, XLA inserts the collectives.
    Numerically exact (pinned vs replicated in tests).  KNOWN LIMIT: the
    qkv kernel packs [q|k|v] contiguously on its 3C output dim, so the
    contiguous column shard is not head-aligned — GSPMD re-gathers the
    qkv activation before attention rather than partitioning attention
    per head (the MLP halves partition cleanly).  Head-aligned TP needs a
    per-head interleaved qkv layout — future work.  Leaves whose target
    dim is not divisible by the axis size stay replicated.  Kernels are
    stacked [L, d_in, d_out]; biases [L, d]."""
    n = mesh.shape[axis]
    col_names = {"qkv", "fc1", "w12"}
    row_names = {"proj", "fc2", "w3"}

    def decide(path, x):
        if n == 1:
            return NamedSharding(mesh, P())
        names = [str(e.key) for e in path
                 if isinstance(e, jax.tree_util.DictKey)]
        leaf = names[-1] if names else ""
        parent = names[-2] if len(names) > 1 else ""
        if parent in col_names and leaf == "kernel" \
                and x.ndim >= 2 and x.shape[-1] % n == 0:
            spec = [None] * x.ndim
            spec[-1] = axis
            return NamedSharding(mesh, P(*spec))
        if parent in col_names and leaf == "bias" \
                and x.shape[-1] % n == 0:
            spec = [None] * x.ndim
            spec[-1] = axis
            return NamedSharding(mesh, P(*spec))
        if parent in row_names and leaf == "kernel" \
                and x.ndim >= 3 and x.shape[-2] % n == 0:
            spec = [None] * x.ndim
            spec[-2] = axis
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(decide, tree)


def pp_sharding_tree(mesh: Mesh, tree, axis: str = "model"):
    """Pipeline-parallel placement: stacked block leaves ([depth, ...],
    any leaf under a 'blocks' key) sharded over `axis` on the depth dim so
    each stage group holds its depth/S consecutive layers; everything else
    (embeddings, norms, head) replicated.  Matches the shard_map in_specs
    of `parallel.pipeline.pipeline_blocks` — placing the params this way
    makes the step's in-shardings an identity reshard."""
    n = mesh.shape[axis]

    def decide(path, x):
        names = [str(e.key) for e in path
                 if isinstance(e, jax.tree_util.DictKey)]
        if n > 1 and "blocks" in names and x.ndim >= 1 \
                and x.shape[0] % n == 0:
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(decide, tree)


def _global_put(x, sh: NamedSharding):
    """device_put that also works on a MULTI-PROCESS mesh, where a plain
    device_put cannot address other hosts' devices.  Every process holds the
    full host value (this framework keeps host data replicated across
    processes); each contributes the shards its local devices own."""
    if jax.process_count() == 1:
        return jax.device_put(x, sh)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])


def shard_params(tree, mesh: Mesh, policy: str = "replicated",
                 axis: str = "data"):
    """Place a param pytree on the mesh under a sharding policy:
    'replicated' (default; every chip holds a full copy) or 'fsdp'
    (large leaves sharded over the data axis, see `fsdp_sharding_tree`)."""
    if policy == "fsdp":
        sh = fsdp_sharding_tree(mesh, tree, axis=axis)
        return jax.tree.map(_global_put, tree, sh)
    if policy == "tp":
        sh = tp_sharding_tree(mesh, tree)
        return jax.tree.map(_global_put, tree, sh)
    if policy == "pp":
        sh = pp_sharding_tree(mesh, tree)
        return jax.tree.map(_global_put, tree, sh)
    if policy != "replicated":
        raise ValueError(f"unknown param_sharding policy: {policy!r}")
    repl = replicated_sharding(mesh)
    return jax.tree.map(lambda x: _global_put(x, repl), tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host numpy batch onto the mesh, batch-dim sharded.  On a
    multi-process mesh every process supplies the GLOBAL batch (loaders are
    seeded identically across hosts); each host's devices take their
    slices."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: _global_put(x, sh), batch)


def pad_to_multiple(batch, multiple: int):
    """Pad the leading dim of every array to a multiple (for uneven final
    batches under static shapes); returns (padded_batch, true_count)."""
    def pad(x):
        n = x.shape[0]
        rem = (-n) % multiple
        if rem == 0:
            return x
        pad_width = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, pad_width, mode="edge")
    n = jax.tree.leaves(batch)[0].shape[0]
    return jax.tree.map(pad, batch), n
