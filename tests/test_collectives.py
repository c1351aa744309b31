"""Collective helpers over the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from apla_tpu.parallel.collectives import (
    host_allgather, is_rank0, mesh_all_gather, mesh_average, synchronize)
from apla_tpu.parallel.mesh import batch_sharding, make_mesh


def test_mesh_average():
    mesh = make_mesh(n_data=8)
    x = jnp.arange(16.0)
    xs = jax.device_put(x, batch_sharding(mesh))
    avg = mesh_average(mesh, xs)
    np.testing.assert_allclose(float(avg), x.mean(), rtol=1e-6)


def test_mesh_all_gather():
    mesh = make_mesh(n_data=8)
    x = jnp.arange(32.0).reshape(16, 2)
    xs = jax.device_put(x, batch_sharding(mesh))
    full = mesh_all_gather(mesh, xs)
    np.testing.assert_allclose(np.asarray(full), np.asarray(x))


def test_host_helpers_single_process():
    assert is_rank0()
    synchronize()  # no-op, must not raise
    assert host_allgather([1, 2]) == [1, 2]
