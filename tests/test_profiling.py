"""utils/profiling: StepTimer statistics and compile-time HBM accounting."""

import time

import jax
import jax.numpy as jnp

from apla_tpu.utils.profiling import (StepTimer, compiled_memory_analysis,
                                      device_memory_stats)


def test_step_timer_percentiles_and_skip():
    t = StepTimer(sync_every=100, skip_first=2)
    for _ in range(10):
        t.tick()
        time.sleep(0.005)
    s = t.summary()
    # intervals recorded from tick skip_first+1 onward (none before tick 1)
    assert len(t.samples) == 10 - 2
    assert 2.0 < s["step_time_mean_ms"] < 50.0
    assert s["step_time_p50_ms"] <= s["step_time_p95_ms"]
    assert s["steps_per_sec"] > 0
    t.reset()
    assert t.summary() == {}


def test_step_timer_sync_fetch():
    """sync_value is fetched on sync steps (true barrier through remote
    transports)."""
    fetched = []

    class Val:
        def __float__(self):
            fetched.append(1)
            return 0.0

    t = StepTimer(sync_every=3, skip_first=0)
    for _ in range(9):
        t.tick(sync_value=Val())
    assert len(fetched) == 3  # steps 3, 6, 9


def test_compiled_memory_analysis_fields():
    f = jax.jit(lambda x: x @ x.T)
    x = jnp.zeros((256, 256), jnp.float32)
    mem = compiled_memory_analysis(f, x)
    # CPU backend may or may not expose memory_analysis; when it does the
    # fields must be present and sane
    if mem:
        assert mem["hbm_args_gb"] >= 0
        assert mem["hbm_total_gb"] >= mem["hbm_args_gb"]
    # device_memory_stats degrades to {} on backends without memory_stats
    assert isinstance(device_memory_stats(), dict)


def test_tpu_client_lock_register_and_stale(tmp_path, monkeypatch):
    """Advisory single-TPU-client lock: a live holder is visible, the exit
    path clears its own lock, and a dead pid's lock is ignored as stale."""
    import json
    import os

    from apla_tpu.utils import tpu_client_lock as tcl

    path = str(tmp_path / "client.lock")
    monkeypatch.setattr(tcl, "LOCK_PATH", path)

    assert tcl.tpu_client_busy() is None
    with tcl.tpu_client("bench"):
        assert tcl.tpu_client_busy() == "bench"
    assert tcl.tpu_client_busy() is None
    assert not os.path.exists(path)

    # stale lock from a dead pid is ignored and removed
    with open(path, "w") as f:
        json.dump({"pid": 2 ** 22 + 12345, "name": "ghost"}, f)
    assert tcl.tpu_client_busy() is None

    # a foreign live holder's lock is reported and NOT removed on exit
    with open(path, "w") as f:
        json.dump({"pid": os.getppid() or os.getpid(), "name": "other"}, f)
    assert tcl.tpu_client_busy() == "other"
