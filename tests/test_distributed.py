"""Multi-host path: 2-process jax.distributed over localhost.

Spawns two real processes (tests/distributed_worker.py), each a simulated
host with 4 virtual CPU devices, joined through
parallel.distributed.initialize — then drives host-sharded indexing and one
globally-sharded eval step across the 2x4 global mesh. This exercises the
code path a TPU pod would take (DCN coordinator + GSPMD collectives); the
reference had no distributed story at all (SURVEY.md §2.3).
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_eval():
    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = []
    for pid in (0, 1):
        procs.append(subprocess.Popen(
            [sys.executable, worker],
            env={**env, "WORKER_COORD": coord, "WORKER_PROC_ID": str(pid),
                 "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_cache"},
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outputs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"worker {pid} ok" in out
