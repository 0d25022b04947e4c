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

    @classmethod
    def from_phase(cls, phase):
        """Scheme-order table from a transcribed phase (reference
        `LGLInterpTable.cpp` interpolates at the transcription's own
        order): per segment, the states use the SAME degree-(2cs-1)
        Hermite interpolant the LGL defects are built on (values + ODE
        tangents at the cs cardinal nodes) and the controls use the
        scheme's degree-(cs-1) Lagrange interpolant — so table lookups,
        setTraj re-sampling, and controller closures keep the mesh's
        h^(2cs-2) accuracy instead of degrading to cubic."""
        import jax
        sch = phase._scheme
        cs = phase._cs
        XV, UV = phase.XV, phase.UV
        traj = phase._traj
        T = phase.tf - phase.t0
        if not T > 0:
            # _seg_t must be strictly increasing for the searchsorted /
            # clip lookup below; a backward phase would silently return
            # wrong samples (corrupting resampleTraj output)
            raise ValueError(
                f"LGLInterpTable.from_phase: phase time must be forward "
                f"(t0={phase.t0}, tf={phase.tf})")
        S = phase.numSegs
        deg = 2 * cs - 1

        rows_full = np.concatenate(
            [traj, np.tile(phase._odeparams, (traj.shape[0], 1))], axis=1)
        fs_all = np.asarray(
            jax.vmap(phase.ode.vf().trace)(rows_full))[:, :XV]

        A = np.zeros((2 * cs, deg + 1))
        for j, tc in enumerate(sch.cardinal_tau):
            A[j] = tc ** np.arange(deg + 1)
            r = np.zeros(deg + 1)
            r[1:] = np.arange(1, deg + 1) * tc ** np.arange(deg)
            A[cs + j] = r
        Ainv = np.linalg.inv(A)

        hs = np.diff(phase.seg_bounds) * T
        xs = traj[phase.seg_nodes, :XV]
        fs = fs_all[phase.seg_nodes]
        rhs = np.concatenate([xs, hs[:, None, None] * fs], axis=1)
        coef = np.einsum("ij,sjx->six", Ainv, rhs)       # (S, deg+1, XV)
        # control Lagrange coefficients in sigma (degree cs-1)
        Au = np.stack([tc ** np.arange(cs) for tc in sch.cardinal_tau])
        us = traj[phase.seg_nodes, XV + 1:]              # (S, cs, UV)
        ucoef = np.einsum("ij,sju->siu", np.linalg.inv(Au), us) \
            if UV else np.zeros((S, cs, 0))

        tab = cls.__new__(cls)
        tab._ode = None
        tab._init_from_rows(np.asarray(traj), XV)
        tab._scheme_mode = True
        tab._seg_t = phase.t0 + phase.seg_bounds * T     # (S+1,)
        tab._seg_h = hs
        tab._coef = coef
        tab._ucoef = ucoef
        tab._deg = deg
        tab._cs = cs
        tab._xv, tab._uv = XV, UV
        return tab

    def eval_batch(self, ts):
        """Vectorized scheme-order evaluation (numpy): (N,) times ->
        (N, XV+UV) value rows (no time column)."""
        if not getattr(self, "_scheme_mode", False):
            return np.stack([np.delete(self.Interpolate(t), self.tcol)
                             for t in np.asarray(ts, float)])
        ts = np.clip(np.asarray(ts, float), self._seg_t[0], self._seg_t[-1])
        k = np.clip(np.searchsorted(self._seg_t, ts, side="right") - 1,
                    0, len(self._seg_h) - 1)
        sig = (ts - self._seg_t[k]) / self._seg_h[k]
        pw = sig[:, None] ** np.arange(self._deg + 1)
        x = np.einsum("nd,ndx->nx", pw, self._coef[k])
        if self._uv:
            pu = sig[:, None] ** np.arange(self._cs)
            u = np.einsum("nd,ndu->nu", pu, self._ucoef[k])
            return np.concatenate([x, u], axis=1)
        return x

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
        self._init_from_rows(rows, self.tcol, ode)

    def _init_from_rows(self, rows, tcol, ode=None):
        self.tcol = tcol
        ts = rows[:, tcol]
        order = np.argsort(ts)
        rows = rows[order]
        self.ts = rows[:, tcol].copy()
        self.vals = np.delete(rows, tcol, axis=1)
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
        """Traced interpolation at scalar time t -> row of all value
        columns: the scheme's own per-segment polynomials when built with
        from_phase (order-consistent), cubic Hermite otherwise.  The table
        data are numpy closure constants (cheap jit lowering); convert
        here so traced indexing works."""
        if getattr(self, "_scheme_mode", False):
            st = jnp.asarray(self._seg_t)
            tcl = jnp.clip(t, st[0], st[-1])
            k = jnp.clip(jnp.searchsorted(st, tcl, side="right") - 1,
                         0, len(self._seg_h) - 1)
            sig = (tcl - st[k]) / jnp.asarray(self._seg_h)[k]
            pw = sig ** jnp.arange(self._deg + 1)
            x = pw @ jnp.asarray(self._coef)[k]
            if self._uv:
                pu = sig ** jnp.arange(self._cs)
                u = pu @ jnp.asarray(self._ucoef)[k]
                return jnp.concatenate([x, u])
            return x
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
    idx = np.asarray(list(idx), dtype=np.int32)
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
