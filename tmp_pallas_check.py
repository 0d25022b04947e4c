import os
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from asset_asrl_tpu.Solvers.kkt_block import _inv_gj_pivots
from asset_asrl_tpu.Solvers.pallas_kernels import batched_gj_inverse

print("backend:", jax.default_backend())
rng = np.random.default_rng(0)

for (K, W) in [(250, 8), (250, 16), (250, 21), (2500, 16), (2500, 21),
               (125, 21), (63, 21), (32, 21), (16, 21), (8, 21), (4, 21)]:
    A = rng.normal(size=(K, W, W))
    A = (A + A.transpose(0, 2, 1)) / 2
    # make quasi-definite-ish: shift diagonal randomly +/-
    sgn = np.sign(rng.normal(size=(K, W)))
    A[:, np.arange(W), np.arange(W)] += sgn * (3.0 + W)
    D = jnp.asarray(A, jnp.float32)
    inv_p, piv_p = jax.jit(batched_gj_inverse)(D)
    inv_x, piv_x = jax.jit(_inv_gj_pivots)(D)
    inv_p, piv_p, inv_x, piv_x = map(np.asarray, (inv_p, piv_p, inv_x, piv_x))
    neg_p = int((piv_p < 0).sum())
    neg_x = int((piv_x < 0).sum())
    true_neg = int(sum((np.linalg.eigvalsh(A[k]) < 0).sum()
                       for k in range(K)))
    err = np.abs(inv_p - inv_x).max()
    print(f"K={K} W={W}: maxdiff_inv={err:.2e} negpiv pallas={neg_p} "
          f"xla={neg_x} true={true_neg}", flush=True)
