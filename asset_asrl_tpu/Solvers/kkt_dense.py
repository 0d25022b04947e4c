"""Dense KKT provider: reference/correctness backend for small problems.

Same API as `kkt_block.BlockKKT`, but assembles the condensed system

    K = [ H + J_I^T Sigma~ J_I + delta I   J_E^T ]
        [ J_E                              -gammaE I ]

densely and factorizes by eigendecomposition (exact inertia, robust
indefinite solve).  Inequalities are condensed exactly as in the block
backend so both produce identical steps.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import DEFAULT_DTYPE


class DenseKKT:

    def __init__(self, nlp):
        nlp.freeze()
        self.nlp = nlp
        self._jit_factor = jax.jit(self._factor_impl)
        self._jit_solve = jax.jit(self._solve_impl)

    def eval_resid(self, x, lamE, lamI, sigma):
        obj, gradf, cE, cI, H, JE, JI = self.nlp.eval_kkt(
            x, lamE, lamI, jnp.asarray(sigma))
        rd = gradf + JE.T @ lamE + JI.T @ lamI
        return obj, gradf, cE, cI, rd

    def _factor_impl(self, x, lamE, lamI, sigma, sig_tilde, delta, gammaE,
                     consts):
        nlp = self.nlp
        obj, gradf, cE, cI, H, JE, JI = nlp.eval_kkt_impl(
            x, lamE, lamI, sigma, consts)
        n, mE = nlp.numPrimal, nlp.numEq
        Hc = H + JI.T @ (sig_tilde[:, None] * JI) \
            + delta * jnp.eye(n, dtype=DEFAULT_DTYPE)
        dim = n + mE
        K = jnp.zeros((dim, dim), DEFAULT_DTYPE)
        K = K.at[:n, :n].set(Hc)
        K = K.at[n:, :n].set(JE)
        K = K.at[:n, n:].set(JE.T)
        K = K.at[jnp.arange(n, dim), jnp.arange(n, dim)].set(-gammaE)
        w, V = jnp.linalg.eigh(K)
        neigs = jnp.sum(w < 0)
        return dict(w=w, V=V, JI=JI), neigs

    def factor(self, x, lamE, lamI, sigma, sig_tilde, delta,
               gammaE, gammaI=None):
        fac, neigs = self._jit_factor(
            x, lamE, lamI, jnp.asarray(sigma), sig_tilde,
            jnp.asarray(delta), jnp.asarray(gammaE),
            self.nlp.consts_dev())
        return fac, int(neigs)

    def _solve_impl(self, fac, rhs_x, rhs_E):
        w, V = fac["w"], fac["V"]
        r = jnp.concatenate([rhs_x, rhs_E])
        sol = V @ ((V.T @ r) / w)
        n = self.nlp.numPrimal
        return sol[:n], sol[n:]

    def solve(self, fac, rhs_x, rhs_E):
        return self._jit_solve(fac, rhs_x, rhs_E)

    def iq_matvec(self, fac, dx):
        return fac["JI"] @ dx

    def iq_rmatvec(self, fac, v):
        return fac["JI"].T @ v
