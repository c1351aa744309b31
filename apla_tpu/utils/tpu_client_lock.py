"""Advisory single-TPU-client lock.

The axon tunnel serves ONE client process at a time: a second process that
merely calls ``jax.devices()`` initializes the backend, contends with a
running job, and can wedge the tunnel for every later client (see
CLAUDE.md "Environment gotchas").  Long-running TPU consumers (bench.py,
experiment rows) register themselves here; pollers (the r4_scaling
``--watch`` loop) check ``tpu_client_busy()`` and defer their probe while
a registered client is alive.

The record is a LIST of holders: overlapping clients (a parent that
launched a child row, or an accidental overlap) each stay visible until
their own pid dies, so a poller never sees "idle" while any registered
client is still running (the ADVICE r4 #3 overwrite hole and its r5
mirror — an unregistered second client outliving the first — are both
closed by registering everyone).

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


def _read_live_holders() -> list[dict]:
    """Live holder records from the lock file (dead pids pruned; the
    legacy single-record format reads as one holder)."""
    try:
        with open(LOCK_PATH) as f:
            rec = json.load(f)
    except (OSError, ValueError):
        return []
    if not isinstance(rec, dict):
        return []
    holders = rec.get("holders")
    if holders is None:
        holders = [rec] if "pid" in rec else []
    live = []
    for h in holders:
        if not isinstance(h, dict):
            continue
        try:
            pid = int(h.get("pid", -1))
        except (TypeError, ValueError):
            continue
        if pid > 0 and _pid_alive(pid):
            live.append({"pid": pid, "name": str(h.get("name", f"pid {pid}")),
                         "ts": h.get("ts", 0.0)})
    return live


def _write_holders(holders: list[dict]) -> bool:
    """Atomically replace the lock file (unlink when no holders remain)."""
    try:
        if not holders:
            try:
                os.unlink(LOCK_PATH)
            except FileNotFoundError:
                pass
            return True
        tmp = f"{LOCK_PATH}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            json.dump({"holders": holders}, f)
        os.replace(tmp, LOCK_PATH)
        return True
    except OSError:
        return False


def tpu_client_busy() -> str | None:
    """Name of a live registered TPU client, or None (records from dead
    pids are pruned)."""
    live = _read_live_holders()
    if live:
        return live[0]["name"]
    # prune a fully-stale file so the next reader is fast
    if os.path.exists(LOCK_PATH):
        _write_holders([])
    return None


@contextlib.contextmanager
def tpu_client(name: str):
    """Register this process as A TPU client for the duration.

    Does NOT block on an existing holder (the holder may be this same
    logical job's parent); callers that must not contend should check
    ``tpu_client_busy()`` first.  Overlapping clients are all recorded —
    each stays visible to pollers until its own pid exits.
    """
    me = {"pid": os.getpid(), "name": name, "ts": time.time()}
    live = _read_live_holders()
    if not any(h["pid"] == me["pid"] for h in live):
        _write_holders(live + [me])
    try:
        yield
    finally:
        remaining = [h for h in _read_live_holders()
                     if h["pid"] != os.getpid()]
        _write_holders(remaining)
