"""Two-process host-collective test (SURVEY §2.3 host-side patterns).

Spawns 2 real processes that jax.distributed-initialize against a local
coordinator and run tests/multiproc_worker.py: global mesh over 4 virtual
CPU devices, host_local_array_to_global_array, string-list allgather,
object broadcast, and barrier. This is the only place the multi-host
branches of parallel/mesh.py execute for real.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multiproc_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_host_collectives():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("JAX_COMPILATION_CACHE_DIR", None)

    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", coordinator],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, (out[-500:], err[-2000:])
        assert "WORKER_OK" in out, out
