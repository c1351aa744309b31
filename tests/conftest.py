"""Test config: force an 8-device virtual CPU platform.

The axon TPU plugin registers itself in sitecustomize and overrides
JAX_PLATFORMS from the environment, so we must switch the platform via
jax.config AFTER import (and set the host-device-count XLA flag before the
backend initialises).  This gives every test a deterministic 8-way mesh —
the TPU-native analogue of the reference's "multi-GPU without a cluster".
"""

import os

os.environ.setdefault("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
