"""Collective helpers — the reference `src/utils/dist_utills.py` analogue.

Under single-controller SPMD most of the reference's collectives vanish
(metrics/feature banks arrive globally batched on host).  What remains are
in-program collectives for shard_map/pjit code paths, and host-level gathers
for multi-process (multi-host) runs:

  reference                      here
  ---------                      ----
  dist_average_tensor         -> pmean inside shard_map / jit
  dist_gather_tensor          -> all_gather inside shard_map
  dist_gather (CPU objects)   -> host_allgather (multihost_utils)
  synchronize (barrier)       -> sync_global_devices
  is_rank0 / print_ddp        -> is_rank0 / print_once
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def psum(x, axis_name: str = "data"):
    return jax.lax.psum(x, axis_name)


def pmean(x, axis_name: str = "data"):
    return jax.lax.pmean(x, axis_name)


def all_gather(x, axis_name: str = "data", axis: int = 0):
    return jax.lax.all_gather(x, axis_name, axis=axis, tiled=True)


def mesh_average(mesh, x):
    """Average a batch-sharded array over the data axis, returning a
    replicated result (the reference's dist_average_tensor)."""
    from jax.experimental.shard_map import shard_map

    @partial(shard_map, mesh=mesh, in_specs=P("data"), out_specs=P())
    def _avg(local):
        return jax.lax.pmean(jnp.mean(local, axis=0), "data")

    return _avg(x)


def mesh_all_gather(mesh, x):
    """Gather a batch-sharded array to a replicated full array (feature-bank
    gather, reference dist_gather_tensor)."""
    from jax.experimental.shard_map import shard_map

    @partial(shard_map, mesh=mesh, in_specs=P("data"), out_specs=P(),
             check_rep=False)
    def _gather(local):
        return jax.lax.all_gather(local, "data", axis=0, tiled=True)

    return _gather(x)


def host_allgather(x):
    """Host-level object gather across processes (reference's Gloo-group
    CPU gather); identity in single-process runs."""
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(x)


def synchronize():
    """Cross-process barrier (reference `synchronize`)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("apla_tpu_barrier")


def is_rank0() -> bool:
    return jax.process_index() == 0


def print_once(*args, **kwargs):
    if is_rank0():
        print(*args, **kwargs)
