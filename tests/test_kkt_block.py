"""Block cyclic-reduction KKT: factor/solve/inertia vs dense reference."""

import numpy as np
import pytest
import jax.numpy as jnp

from asset_asrl_tpu.Solvers.kkt_block import bcr_factor, bcr_solve


def make_block_tridiag(K, W, b, seed=0, spd=False):
    rng = np.random.default_rng(seed)
    diag = rng.normal(size=(K, W, W))
    diag = (diag + diag.transpose(0, 2, 1)) / 2
    if spd:
        for k in range(K):
            diag[k] += W * np.eye(W)
    lower = rng.normal(size=(K, W, W)) * 0.3
    lower[-1] = 0.0
    B = rng.normal(size=(K, W, b)) * 0.2
    C = rng.normal(size=(b, b))
    C = (C + C.T) / 2 - b * np.eye(b)

    dim = K * W + b
    A = np.zeros((dim, dim))
    for k in range(K):
        A[k * W:(k + 1) * W, k * W:(k + 1) * W] = diag[k]
        if k + 1 < K:
            A[(k + 1) * W:(k + 2) * W, k * W:(k + 1) * W] = lower[k]
            A[k * W:(k + 1) * W, (k + 1) * W:(k + 2) * W] = lower[k].T
        A[k * W:(k + 1) * W, K * W:] = B[k]
        A[K * W:, k * W:(k + 1) * W] = B[k].T
    A[K * W:, K * W:] = C
    return diag, lower, B, C, A


@pytest.mark.parametrize("K,W,b", [(1, 3, 2), (2, 3, 2), (5, 4, 3),
                                   (8, 4, 0), (13, 5, 4), (16, 2, 1)])
def test_bcr_solve_matches_dense(K, W, b):
    diag, lower, B, C, A = make_block_tridiag(K, W, b, seed=K + W, spd=True)
    nlevels = max(1, int(np.ceil(np.log2(max(K, 2)))))
    fac, neigs = bcr_factor(jnp.asarray(diag), jnp.asarray(lower),
                            jnp.asarray(B), jnp.asarray(C), nlevels)
    rng = np.random.default_rng(1)
    r = rng.normal(size=(K, W))
    rb = rng.normal(size=(b,))
    y, z = bcr_solve(fac, jnp.asarray(r), jnp.asarray(rb), nlevels)
    sol = np.linalg.solve(A, np.concatenate([r.ravel(), rb]))
    got = np.concatenate([np.asarray(y).ravel(), np.asarray(z)])
    assert np.allclose(got, sol, atol=1e-8), np.abs(got - sol).max()


@pytest.mark.parametrize("K,W,b", [(4, 3, 2), (7, 4, 3), (16, 3, 0)])
def test_bcr_inertia(K, W, b):
    """Negative-eigenvalue count must match the dense eigendecomposition
    (this drives PSIOPT's perturbation ladder)."""
    for seed in range(4):
        diag, lower, B, C, A = make_block_tridiag(K, W, b, seed=seed,
                                                  spd=False)
        nlevels = max(1, int(np.ceil(np.log2(max(K, 2)))))
        fac, neigs = bcr_factor(jnp.asarray(diag), jnp.asarray(lower),
                                jnp.asarray(B), jnp.asarray(C), nlevels)
        w = np.linalg.eigvalsh(A)
        assert int(neigs) == int(np.sum(w < 0)), \
            f"seed {seed}: bcr {int(neigs)} vs dense {int(np.sum(w < 0))}"
