"""Advisory single-TPU-client lock.

The axon tunnel serves ONE client process at a time: a second process that
merely calls ``jax.devices()`` initializes the backend, contends with a
running job, and can wedge the tunnel for every later client (see
CLAUDE.md "Environment gotchas").  Long-running TPU consumers (bench.py,
experiment rows) register themselves here; pollers (the r4_scaling
``--watch`` loop) check ``tpu_client_busy()`` and defer their probe while
a registered client is alive.

Advisory and best-effort: nothing enforces it — it exists so that our own
tooling never creates the second-client pathology by accident.
"""

from __future__ import annotations

import contextlib
import json
import os
import time

LOCK_PATH = os.environ.get("APLA_TPU_LOCK", "/tmp/apla_tpu_client.lock")


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def tpu_client_busy() -> str | None:
    """Name of a live registered TPU client, or None (stale locks from
    dead pids are ignored and removed)."""
    try:
        with open(LOCK_PATH) as f:
            rec = json.load(f)
        pid = int(rec.get("pid", -1))
        if pid > 0 and _pid_alive(pid):
            return str(rec.get("name", f"pid {pid}"))
        os.unlink(LOCK_PATH)
    except (OSError, ValueError):
        pass
    return None


@contextlib.contextmanager
def tpu_client(name: str):
    """Register this process as the TPU client for the duration.

    Does NOT block on an existing holder (the holder may be this same
    logical job's parent); callers that must not contend should check
    ``tpu_client_busy()`` first.  If a DIFFERENT live pid already holds the
    record, this process runs unregistered instead of overwriting it —
    otherwise our exit would unlink the file and hide the still-running
    first client from ``tpu_client_busy()`` pollers (ADVICE r4 #3).
    """
    registered = False
    try:
        with open(LOCK_PATH) as f:
            rec = json.load(f)
        pid = int(rec.get("pid", -1))
        other_live = pid > 0 and pid != os.getpid() and _pid_alive(pid)
    except (OSError, ValueError):
        other_live = False
    if not other_live:
        try:
            with open(LOCK_PATH, "w") as f:
                json.dump({"pid": os.getpid(), "name": name,
                           "ts": time.time()}, f)
            registered = True
        except OSError:
            pass
    try:
        yield
    finally:
        if registered:
            try:
                with open(LOCK_PATH) as f:
                    if int(json.load(f).get("pid", -1)) == os.getpid():
                        os.unlink(LOCK_PATH)
            except (OSError, ValueError):
                pass
