"""Step-time / throughput observability.

The reference has no profiling subsystem (SURVEY §5: tqdm rates +
nvidia-smi dumps).  Here: a host-side step timer with percentile summaries —
robust against the async-dispatch pitfall (a device sync is injected every
`sync_every` steps via a value fetch, because through remote-PJRT transports
`block_until_ready` may return before execution finishes).
`jax.profiler.trace` can be layered on top where the backend supports it.
"""

from __future__ import annotations

import time

import numpy as np


class StepTimer:
    def __init__(self, sync_every: int = 50, skip_first: int = 3):
        self.sync_every = sync_every
        self.skip_first = skip_first
        self._t_last = None
        self._count = 0
        self.samples: list[float] = []

    def tick(self, sync_value=None):
        """Call once per step; pass a device scalar (e.g. the loss) — it is
        fetched on sync steps to create a true barrier."""
        now = time.perf_counter()
        self._count += 1
        if sync_value is not None and self._count % self.sync_every == 0:
            float(sync_value)
            now = time.perf_counter()
        if self._t_last is not None and self._count > self.skip_first:
            self.samples.append(now - self._t_last)
        self._t_last = now

    def summary(self) -> dict:
        if not self.samples:
            return {}
        arr = np.asarray(self.samples)
        return {
            "step_time_mean_ms": round(float(arr.mean()) * 1e3, 2),
            "step_time_p50_ms": round(float(np.percentile(arr, 50)) * 1e3, 2),
            "step_time_p95_ms": round(float(np.percentile(arr, 95)) * 1e3, 2),
            "steps_per_sec": round(1.0 / max(float(arr.mean()), 1e-9), 2),
        }

    def reset(self):
        self.samples.clear()
        self._t_last = None
        self._count = 0


def compiled_memory_analysis(jitted_fn, *args, **kwargs) -> dict:
    """Compile-time HBM footprint of a jitted function (XLA
    `memory_analysis`): argument + output − aliased(donated) + temp
    (activations/workspace).  Deterministic and available even where the
    runtime doesn't expose `memory_stats` (e.g. through the axon tunnel,
    which returns None)."""
    try:
        ma = jitted_fn.lower(*args, **kwargs).compile().memory_analysis()
        if ma is None:
            return {}
        total = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                 - ma.alias_size_in_bytes + ma.temp_size_in_bytes)
        return {
            "hbm_args_gb": round(ma.argument_size_in_bytes / 2**30, 3),
            "hbm_temp_gb": round(ma.temp_size_in_bytes / 2**30, 3),
            "hbm_total_gb": round(total / 2**30, 3),
        }
    except Exception:
        return {}


def device_memory_stats(device=None) -> dict:
    """Peak/current HBM usage of one device, in bytes.  Returns {} where the
    backend doesn't expose memory_stats (CPU).  The reference's analog is
    nvidia-smi snapshots; here it's a first-class metric — BASELINE.md's
    memory claim (peak HBM scales with APLA rank, not model size) is
    tracked from this."""
    import jax

    dev = device or jax.local_devices()[0]
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        return {}
    out = {}
    if "peak_bytes_in_use" in stats:
        out["peak_hbm_gb"] = round(stats["peak_bytes_in_use"] / 2**30, 3)
    if "bytes_in_use" in stats:
        out["hbm_in_use_gb"] = round(stats["bytes_in_use"] / 2**30, 3)
    return out
