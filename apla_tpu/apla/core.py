"""APLA pytree surgery: partition a ViT param tree into (trainable, frozen).

Reference behaviour (`src/apla/apla_vit.py:63-101` `build_apla`,
`appla_attn.py:22-45`): freeze every parameter, then for each block make
`partial_size` output channels of the attention projection trainable — either
a random subset sampled once at init, or indices read from an `inds_path`
JSON with keys `block_{i}`.  `partial_size == 'full'` trains the whole
projection.

TPU-native design: instead of `requires_grad` flags, the partition is the
pytree structure itself.  `build_apla` returns

  trainable = {'blocks': {'proj_wt': [L, d, k], 'proj_bt': [L, k]}}
  frozen    = full ViT params + {'blocks': {'attn': {'inds': [L, k]}}}

`jax.grad` is taken w.r.t. `trainable` only, so frozen grads are never
computed, optimizer state is O(L*d*k), and the data-parallel gradient
allreduce moves only the APLA slices.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class AplaConfig:
    # int rank, or "full" for whole-projection training
    partial_size: Any = 32
    # optional path to a JSON of pre-defined trainable indices per block
    inds_path: Optional[str] = None
    seed: int = 0


def load_indices(inds_path: str, depth: int, dim: int) -> np.ndarray:
    """Load per-block trainable indices from the reference's JSON format
    (`apla_vit.py:20-27`): {'block_0': [...], 'block_1': [...], ...}.
    Returns int32 [depth, k]."""
    with open(inds_path) as f:
        inds_dict = json.load(f)
    rows = []
    for i in range(depth):
        row = inds_dict[f"block_{i}"]
        assert max(row) < dim, f"index {max(row)} out of range for dim {dim}"
        rows.append(row)
    k = len(rows[0])
    assert all(len(r) == k for r in rows), "ragged per-block index lists"
    return np.asarray(rows, dtype=np.int32)


def sample_indices(seed: int, depth: int, dim: int, k: int) -> np.ndarray:
    """Sample k distinct trainable output-channels per block (reference
    `appla_attn.py:27` `torch.randperm` per block), reproducibly."""
    rng = np.random.default_rng(seed)
    return np.stack(
        [rng.permutation(dim)[:k].astype(np.int32) for _ in range(depth)])


def save_indices(inds: np.ndarray, path: str) -> None:
    """Write indices in the reference JSON schema (inds-*.json files)."""
    d = {f"block_{i}": [int(v) for v in row] for i, row in enumerate(inds)}
    with open(path, "w") as f:
        json.dump(d, f, indent=4)


def build_apla(params: dict, vit_cfg, apla_cfg: AplaConfig):
    """Split full ViT `params` into (trainable, frozen) pytrees.

    The trainable columns are COPIED out of the full projection kernel; their
    stored values inside `frozen` become shadowed (the forward scatter in
    `apla_proj` overwrites them), so no zeroing is needed.
    """
    depth, dim = vit_cfg.depth, vit_cfg.embed_dim
    frozen = jax.tree.map(lambda x: x, params)  # shallow-ish copy of structure

    if apla_cfg.partial_size == "full":
        # whole projection trainable (reference build_apla 'full' branch,
        # apla_vit.py:65-74): move proj kernel+bias into the trainable tree.
        proj = frozen["blocks"]["attn"].pop("proj")
        trainable = {"blocks": {"attn": {"proj": proj}}}
        return trainable, frozen

    k = int(apla_cfg.partial_size)
    if apla_cfg.inds_path:
        inds = load_indices(apla_cfg.inds_path, depth, dim)
        assert inds.shape[1] >= k, (
            f"inds file provides {inds.shape[1]} indices, need {k}")
        inds = inds[:, :k]
    else:
        inds = sample_indices(apla_cfg.seed, depth, dim, k)
    inds_j = jnp.asarray(inds)  # [L, k]

    proj_kernel = params["blocks"]["attn"]["proj"]["kernel"]  # [L, d, d]
    proj_bias = params["blocks"]["attn"]["proj"]["bias"]      # [L, d]
    # gather trainable columns per layer: [L, d, k] / [L, k]
    proj_wt = jnp.take_along_axis(proj_kernel, inds_j[:, None, :], axis=2)
    proj_bt = jnp.take_along_axis(proj_bias, inds_j, axis=1)

    trainable = {"blocks": {"proj_wt": proj_wt, "proj_bt": proj_bt}}
    frozen["blocks"]["attn"]["inds"] = inds_j
    return trainable, frozen


def merge_apla_params(trainable: dict, frozen: dict) -> dict:
    """Re-assemble a plain full ViT param tree (for export / checkpoint
    interop / teacher EMA full-weight views)."""
    params = jax.tree.map(lambda x: x, frozen)
    if "blocks" not in trainable:
        return params
    tb = trainable["blocks"]
    if "attn" in tb and "proj" in tb["attn"]:  # 'full' mode
        params["blocks"]["attn"]["proj"] = tb["attn"]["proj"]
        return params
    inds = params["blocks"]["attn"].pop("inds")
    kernel = params["blocks"]["attn"]["proj"]["kernel"]
    bias = params["blocks"]["attn"]["proj"]["bias"]
    kernel = _scatter_cols(kernel, tb["proj_wt"], inds)
    bias = jax.vmap(lambda b, t, i: b.at[i].set(t))(bias, tb["proj_bt"], inds)
    params["blocks"]["attn"]["proj"] = {"kernel": kernel, "bias": bias}
    return params


def _scatter_cols(kernel, wt, inds):
    """kernel [L,d,d] <- wt [L,d,k] at columns inds [L,k], per layer."""
    return jax.vmap(lambda K, W, I: K.at[:, I].set(W))(kernel, wt, inds)


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))
