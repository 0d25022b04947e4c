"""PyVectorFunction: wrap an arbitrary Python callable as a VectorFunction
with finite-difference derivatives.

Reference: `src/VectorFunctions/CommonFunctions/PythonFunctions.h` (template
args FDiffFwd/FDiffFwd).  We use central differences for the Jacobian (same
step-size API, tighter error) and FD-of-adjoint-gradient for the Hessian.
Under jit the callable runs through jax.pure_callback with a custom_jvp whose
tangent is the FD Jacobian, so PyVectorFunctions compose into expressions and
can appear in solver constraints (at a host-callback cost per evaluation,
mirroring the reference's GIL round-trip).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_DTYPE
from .function import VectorFunction

__all__ = ["PyVectorFunction", "PyScalarFunction"]


class PyVectorFunction(VectorFunction):

    def __init__(self, irows, orows, func, jstepsize=1.0e-6, hstepsize=1.0e-6,
                 args=()):
        irows, orows = int(irows), int(orows)
        self._pyfunc = func
        self._extra = tuple(args)
        self._jstep = float(jstepsize)
        self._hstep = float(hstepsize)

        def host_eval(x):
            out = np.asarray(self._pyfunc(np.asarray(x, dtype=np.float64),
                                          *self._extra),
                             dtype=np.float64).ravel()
            if out.shape[0] != orows:
                raise ValueError(
                    f"PyVectorFunction returned size {out.shape[0]}, "
                    f"expected {orows}")
            return out

        self._host_eval = host_eval

        def host_jac(x):
            return self._fd_jacobian(np.asarray(x, dtype=np.float64))

        @jax.custom_jvp
        def traced(x):
            return jax.pure_callback(
                host_eval, jax.ShapeDtypeStruct((orows,), DEFAULT_DTYPE), x,
                vmap_method="sequential")

        @traced.defjvp
        def traced_jvp(primals, tangents):
            (x,), (dx,) = primals, tangents
            y = traced(x)
            jac = jax.pure_callback(
                host_jac, jax.ShapeDtypeStruct((orows, irows), DEFAULT_DTYPE),
                x, vmap_method="sequential")
            return y, jac @ dx

        super().__init__(traced, irows, orows, name="PyVectorFunction")

    # ------------------------------------------------------- finite difference
    def _fd_jacobian(self, x, step=None):
        step = self._jstep if step is None else step
        n, m = self.IRows(), self.ORows()
        jac = np.zeros((m, n))
        for i in range(n):
            xp = x.copy(); xp[i] += step
            xm = x.copy(); xm[i] -= step
            jac[:, i] = (self._host_eval(xp) - self._host_eval(xm)) / (2 * step)
        return jac

    def compute(self, x):
        return self._host_eval(np.asarray(x, dtype=np.float64).ravel())

    def jacobian(self, x):
        return self._fd_jacobian(np.asarray(x, dtype=np.float64).ravel())

    def adjointgradient(self, x, l):
        jac = self.jacobian(x)
        return jac.T @ np.asarray(l, dtype=np.float64).ravel()

    def adjointhessian(self, x, l):
        x = np.asarray(x, dtype=np.float64).ravel()
        l = np.asarray(l, dtype=np.float64).ravel()
        n = self.IRows()
        step = self._hstep
        hess = np.zeros((n, n))
        for i in range(n):
            xp = x.copy(); xp[i] += step
            xm = x.copy(); xm[i] -= step
            gp = self._fd_jacobian(xp, step=step).T @ l
            gm = self._fd_jacobian(xm, step=step).T @ l
            hess[:, i] = (gp - gm) / (2 * step)
        return 0.5 * (hess + hess.T)

    def computeall(self, x, l):
        return (self.compute(x), self.jacobian(x),
                self.adjointgradient(x, l), self.adjointhessian(x, l))


def PyScalarFunction(irows, func, jstepsize=1.0e-6, hstepsize=1.0e-6, args=()):
    return PyVectorFunction(irows, 1, func, jstepsize, hstepsize, args=args)
