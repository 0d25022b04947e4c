"""REAL multi-process distributed execution (the honest stand-in for
N>=2 hosts this environment allows, BASELINE.md "N>=2 hosts"): two OS
processes, each with 4 virtual CPU devices, coordinate through
`jax.distributed` (`asset_asrl_tpu.distributed.initialize`), build the
global ("host", "chip") mesh, run the hierarchical sharded KKT
factor+solve with true cross-process collectives, and must reproduce the
dense solution and exact inertia."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_hier_sharded_solve():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tools", "_mp_worker.py")
    port = _free_port()
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               JAX_PLATFORMS="cpu")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(rank), "2", str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, cwd=root) for rank in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]
        assert "MP-OK" in out, out[-4000:]
