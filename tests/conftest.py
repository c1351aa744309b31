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

if os.environ.get("APLA_TPU_TESTS") == "1":
    # on-TPU tier (tests/test_tpu.py, `-m tpu`): keep the real backend and
    # arm the persistent compile cache (remote compiles are minutes cold,
    # ~10 s cached).  Run ONLY the tpu-marked tests in this mode — the
    # CPU-mesh suite needs the 8-device virtual platform:
    #   APLA_TPU_TESTS=1 python -m pytest tests/test_tpu.py -q
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
else:
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
