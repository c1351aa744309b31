"""Multi-host bootstrap test (VERDICT r2 item 6): 2 processes x 4 CPU
devices each, wired by main.py's APLA_MULTIHOST path
(`main.maybe_init_multihost` -> jax.distributed.initialize), then one psum
and one APLA train step over the 8-device global mesh.

The workers run in SUBPROCESSES (the distributed runtime can only be
initialised once per process, and this test must not poison the in-process
8-device test backend).  Serialized within the suite by being a single
test (CLAUDE.md: concurrent virtual-mesh process groups can hit collective
rendezvous timeouts — these two processes are one group, which is fine).
"""

import os
import re
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_bootstrap_psum_and_train_step():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["APLA_MULTIHOST"] = f"127.0.0.1:{port},2,{pid}"
        env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
    losses = []
    for i, out in enumerate(outs):
        m = re.search(r"MULTIHOST_OK process=(\d) psum=28\.0 "
                      r"loss=([0-9.]+)", out)
        assert m, f"worker {i} missing MULTIHOST_OK:\n{out[-4000:]}"
        losses.append(m.group(2))
    # both processes computed the identical global step
    assert losses[0] == losses[1]
