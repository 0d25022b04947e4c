"""LGLInterpTable / InterpFunction: differentiable trajectory interpolation.

Reference: `src/OptimalControl/LGLInterpTable.{h,cpp}` + the
`InterpFunction_N` bindings.  The table stores trajectory rows and exposes
time-interpolation; InterpFunction wraps it as a VectorFunction of time so
interpolated trajectories can appear inside expressions (controller closures,
link targets).  Interpolation is cubic Hermite (Catmull-Rom tangents, or ODE
tangents when an ODE is supplied), implemented in jnp so jax provides exact
derivatives of the interpolant.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import DEFAULT_DTYPE
from ..VectorFunctions.function import VectorFunction

__all__ = ["LGLInterpTable", "InterpFunction"]


class LGLInterpTable:

    def __init__(self, *args):
        """Forms (reference bindings):
        LGLInterpTable(odevf, XV, UV, traj)      — tangents from the ODE
        LGLInterpTable(traj)                      — time in last column
        LGLInterpTable(ncols, data, nrows_or_ts)  — raw value rows + time last
        """
        ode = None
        if len(args) == 4:
            ode, xv, uv, traj = args
            rows = np.asarray([np.asarray(r).ravel() for r in traj])
            self.tcol = int(xv)
        elif len(args) == 1:
            rows = np.asarray([np.asarray(r).ravel() for r in args[0]])
            self.tcol = rows.shape[1] - 1
        elif len(args) in (2, 3):
            ncols = int(args[0])
            rows = np.asarray([np.asarray(r).ravel() for r in args[1]])
            self.tcol = ncols
        else:
            raise TypeError("LGLInterpTable: bad arguments")
        self._ode = ode
        ts = rows[:, self.tcol]
        order = np.argsort(ts)
        rows = rows[order]
        self.ts = rows[:, self.tcol].copy()
        self.vals = np.delete(rows, self.tcol, axis=1)
        self.rows = rows
        self.TotalT = float(self.ts[-1] - self.ts[0])
        self.T0 = float(self.ts[0])
        self.TF = float(self.ts[-1])
        # Catmull-Rom tangents (one-sided at the ends)
        t = self.ts
        v = self.vals
        n = len(t)
        dv = np.zeros_like(v)
        if n > 1:
            dv[1:-1] = (v[2:] - v[:-2]) / (t[2:] - t[:-2])[:, None]
            dv[0] = (v[1] - v[0]) / (t[1] - t[0])
            dv[-1] = (v[-1] - v[-2]) / (t[-1] - t[-2])
        if ode is not None:
            # exact tangents for the state columns from the ODE RHS
            for i in range(n):
                dv[i, :ode.ORows()] = np.asarray(ode.compute(rows[i]))
        self.tangents = dv
        self._jts = np.asarray(self.ts)
        self._jvals = np.asarray(self.vals)
        self._jtan = np.asarray(self.tangents)

    # -------------------------------------------------------------- queries
    def interp_traced(self, t):
        """Traced cubic-Hermite interpolation at scalar time t -> row of
        all value columns.  The table data are numpy closure constants
        (cheap jit lowering); convert here so traced indexing works."""
        ts = jnp.asarray(self._jts)
        vs = jnp.asarray(self._jvals)
        dvs = jnp.asarray(self._jtan)
        t = jnp.clip(t, ts[0], ts[-1])
        k = jnp.clip(jnp.searchsorted(ts, t, side="right") - 1, 0,
                     len(self.ts) - 2)
        t0, t1 = ts[k], ts[k + 1]
        h = t1 - t0
        s = (t - t0) / h
        h00 = 2 * s ** 3 - 3 * s ** 2 + 1
        h10 = s ** 3 - 2 * s ** 2 + s
        h01 = -2 * s ** 3 + 3 * s ** 2
        h11 = s ** 3 - s ** 2
        return (h00 * vs[k] + h10 * h * dvs[k]
                + h01 * vs[k + 1] + h11 * h * dvs[k + 1])

    def Interpolate(self, t):
        out = np.asarray(self.interp_traced(jnp.asarray(float(t))))
        return np.insert(out, self.tcol, float(t))

    def InterpolateDeriv(self, t):
        import jax
        g = jax.jacfwd(self.interp_traced)(jnp.asarray(float(t)))
        return np.asarray(g)

    def __call__(self, t):
        return self.Interpolate(t)

    def InterpRange(self, n, t0=None, tf=None):
        t0 = self.T0 if t0 is None else t0
        tf = self.TF if tf is None else tf
        return [self.Interpolate(t) for t in np.linspace(t0, tf, int(n))]

    def InterpWholeRange(self, n):
        return self.InterpRange(n)

    def makePeriodic(self):
        pass  # clamped interpolation already wraps at ends


def InterpFunction(tab: LGLInterpTable, idx):
    """VectorFunction of time: t -> selected interpolated columns
    (reference InterpFunction_N bindings)."""
    idx = np.asarray(list(idx), dtype=np.int64)
    idxj = np.asarray(idx)

    def impl(x):
        row = tab.interp_traced(x[0])
        return row[idxj]

    f = VectorFunction(impl, 1, len(idx), name="InterpFunction")
    return f


def InterpFunction_1(tab):
    return InterpFunction(tab, range(1))


def InterpFunction_3(tab):
    return InterpFunction(tab, range(3))


def InterpFunction_6(tab):
    return InterpFunction(tab, range(6))
