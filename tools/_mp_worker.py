"""Worker for tests/test_multiprocess.py: one of N processes running the
hierarchical (host x chip) sharded KKT factor+solve over a REAL
multi-process mesh (jax.distributed + cross-process collectives) and
checking the result against the dense solution.

Usage: python tools/_mp_worker.py <rank> <nproc> <port>
(XLA_FLAGS=--xla_force_host_platform_device_count=4 must be in the env.)
"""
import os
import sys

rank, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import asset_asrl_tpu as ast  # noqa: E402

ast.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                           process_id=rank)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc, len(jax.devices())

mesh = ast.distributed.host_chip_mesh()
assert mesh.shape["host"] == nproc and mesh.shape["chip"] == 4

from asset_asrl_tpu.Solvers.kkt_sharded import (  # noqa: E402
    pad_chain, sharded_factor_hier, sharded_solve_hier)
from tests.test_kkt_block import make_block_tridiag  # noqa: E402

K, W, b = 40, 4, 2
D = nproc * 4
diag, lower, B, C, A = make_block_tridiag(K, W, b, seed=3, spd=True)
rng = np.random.default_rng(7)
r = rng.normal(size=(K, W))
rb = rng.normal(size=(b,))

rep = NamedSharding(mesh, P())


@jax.jit
def pipeline(dg, lo, Bm, Cm, rr, rz):
    dgp, lop, Bp, Cp, L = pad_chain(dg, lo, Bm, Cm, D)
    fac, neigs = sharded_factor_hier(dgp, lop, Bp, Cp, mesh)
    rp = jnp.concatenate(
        [rr, jnp.zeros((dgp.shape[0] - rr.shape[0], W), rr.dtype)])
    y, z = sharded_solve_hier(fac, rp, rz, mesh)
    return y, z, neigs


args = [jax.device_put(jnp.asarray(v), rep)
        for v in (diag, lower, B, C, r, rb)]
y, z, neigs = jax.jit(pipeline, out_shardings=(rep, rep, rep))(*args)

sol = np.linalg.solve(A, np.concatenate([r.ravel(), rb]))
got = np.concatenate([np.asarray(y)[:K].ravel(), np.asarray(z)])
err = np.abs(got - sol).max()
w = np.linalg.eigvalsh(A)
assert int(neigs) == int(np.sum(w < 0)), (int(neigs), int(np.sum(w < 0)))
assert err < 1e-8, err
print(f"MP-OK rank={rank} err={err:.2e} neigs={int(neigs)}", flush=True)
