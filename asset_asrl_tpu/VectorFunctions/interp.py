"""Differentiable 1-4D interpolation tables.

Reference: `src/VectorFunctions/CommonFunctions/InterpTable{1,2,3,4}D.h`
(linear & cubic lookup tables bindable as VectorFunctions, used for
tabulated aero/thrust data — e.g. MinimumTimeToClimb).

Design: rectilinear (possibly non-uniform) grids; cubic mode is a
tensor-product Catmull-Rom (C1) whose per-axis 4-point cardinal weights are
computed in-trace from the local knot spacing, so jax AD differentiates the
interpolant exactly.  Everything is jnp → tables compose into expressions
and vectorize under vmap.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import DEFAULT_DTYPE
from .function import VectorFunction, as_function, _stack_arg

__all__ = ["InterpTable1D", "InterpTable2D", "InterpTable3D",
           "InterpTable4D"]


def _axis_weights_cubic(ts, x):
    """4-point Catmull-Rom cardinal weights on a non-uniform axis.

    Returns (i0, w) with w (4,) so value = sum_k w[k] * f[i0+k], using
    clamped end handling."""
    n = ts.shape[0]
    ts = jnp.asarray(ts)
    x = jnp.clip(x, ts[0], ts[-1])
    j = jnp.clip(jnp.searchsorted(ts, x, side="right") - 1, 0, n - 2)
    t0 = ts[j]
    t1 = ts[j + 1]
    h = t1 - t0
    s = (x - t0) / h
    # Hermite basis
    h00 = 2 * s ** 3 - 3 * s ** 2 + 1
    h10 = s ** 3 - 2 * s ** 2 + s
    h01 = -2 * s ** 3 + 3 * s ** 2
    h11 = s ** 3 - s ** 2
    # Catmull-Rom tangents on non-uniform knots: second-order weighted
    # central differences (exact for quadratics on any spacing),
    # one-sided at the ends; expressed as weights on f[j-1..j+2]
    jm = jnp.clip(j - 1, 0, n - 1)
    jp2 = jnp.clip(j + 2, 0, n - 1)
    tm = ts[jm]
    tp2 = ts[jp2]
    h0 = t0 - tm          # left gap at t0 (0 at the boundary)
    h0s = jnp.where(h0 > 0, h0, 1.0)
    m0_w = jnp.where(
        j > 0,
        jnp.stack([-h / ((h0s + h) * h0s),
                   h / ((h0s + h) * h0s) - h0 / ((h0s + h) * h),
                   h0 / ((h0s + h) * h)]),
        jnp.array([0.0, -1.0, 1.0]) / h)
    g1 = tp2 - t1         # right gap at t1 (0 at the boundary)
    g1s = jnp.where(g1 > 0, g1, 1.0)
    m1_w = jnp.where(
        j < n - 2,
        jnp.stack([-g1 / ((h + g1s) * h),
                   g1 / ((h + g1s) * h) - h / ((h + g1s) * g1s),
                   h / ((h + g1s) * g1s)]),
        jnp.array([-1.0, 1.0, 0.0]) / h)
    # weights on [f(jm), f(j), f(j+1), f(jp2)]
    w = jnp.zeros(4, dtype=x.dtype)
    w = w.at[1].add(h00)
    w = w.at[2].add(h01)
    # m0 acts on (f[jm], f[j], f[j+1]); m1 on (f[j], f[j+1], f[jp2])
    w = w.at[0].add(h10 * h * m0_w[0])
    w = w.at[1].add(h10 * h * m0_w[1])
    w = w.at[2].add(h10 * h * m0_w[2])
    w = w.at[1].add(h11 * h * m1_w[0])
    w = w.at[2].add(h11 * h * m1_w[1])
    w = w.at[3].add(h11 * h * m1_w[2])
    idx = jnp.stack([jm, j, j + 1, jp2])
    return idx, w


def _axis_weights_linear(ts, x):
    n = ts.shape[0]
    ts = jnp.asarray(ts)
    x = jnp.clip(x, ts[0], ts[-1])
    j = jnp.clip(jnp.searchsorted(ts, x, side="right") - 1, 0, n - 2)
    s = (x - ts[j]) / (ts[j + 1] - ts[j])
    idx = jnp.stack([j, j + 1])
    w = jnp.stack([1.0 - s, s])
    return idx, w


class _InterpTableND:
    """N-D rectilinear interpolation table; calling it with N scalar
    functions (or numbers) returns a scalar VectorFunction."""

    def __init__(self, axes, data, kind="cubic"):
        self.axes = [np.asarray(a, dtype=np.float64)
                     for a in axes]
        data = np.asarray(data, dtype=np.float64)
        if data.shape != tuple(len(a) for a in self.axes):
            raise ValueError(
                f"data shape {data.shape} does not match axis lengths "
                f"{tuple(len(a) for a in self.axes)}")
        self.data = np.asarray(data)
        self.kind = str(kind)
        self.ndim = len(self.axes)

    def interp_traced(self, coords):
        """coords: length-ndim traced values -> interpolated scalar."""
        wfun = _axis_weights_cubic if self.kind == "cubic" \
            else _axis_weights_linear
        idxs, wts = [], []
        for ax, x in zip(self.axes, coords):
            i, w = wfun(ax, x)
            idxs.append(i)
            wts.append(w)
        # tensor-product contraction over the gathered hypercube (data is a
        # numpy closure constant; convert for traced gather indexing)
        vals = jnp.asarray(self.data)
        grids = jnp.meshgrid(*idxs, indexing="ij")
        cube = vals[tuple(grids)]
        for w in reversed(wts):
            cube = cube @ w
        return cube

    def __call__(self, *args):
        if len(args) != self.ndim:
            if len(args) == 1 and isinstance(args[0], VectorFunction) \
                    and args[0].ORows() == self.ndim:
                fn = args[0]._fn
                tab = self

                def impl(x):
                    c = jnp.atleast_1d(fn(x))
                    return jnp.atleast_1d(tab.interp_traced(
                        [c[i] for i in range(tab.ndim)]))
                return VectorFunction(impl, args[0].IRows(), 1,
                                      name="InterpTable")
            raise ValueError(f"table takes {self.ndim} arguments")
        if all(not isinstance(a, VectorFunction) for a in args):
            out = self.interp_traced([jnp.asarray(float(a)) for a in args])
            return float(out)
        funcs = [a for a in args if isinstance(a, VectorFunction)]
        ir = funcs[0].IRows()
        args = [a if isinstance(a, VectorFunction) else as_function(a, ir)
                for a in args]
        fns = [a._fn for a in args]
        tab = self

        def impl(x):
            coords = [jnp.atleast_1d(f(x))[0] for f in fns]
            return jnp.atleast_1d(tab.interp_traced(coords))
        return VectorFunction(impl, ir, 1, name="InterpTable")

    # stand-alone numeric evaluation
    def interp(self, *coords):
        return float(self.interp_traced(
            [jnp.asarray(float(c)) for c in coords]))


def InterpTable1D(ts, vals, kind="cubic", axis=0):
    vals = np.asarray(vals, dtype=np.float64)
    if vals.ndim == 2:
        # vector-valued 1D table: build per-column tables and stack
        if vals.shape[0] != len(ts):
            vals = vals.T
        tabs = [_InterpTableND([ts], vals[:, j], kind)
                for j in range(vals.shape[1])]

        class _VecTab:
            def __call__(self, tfunc):
                tfunc = _stack_arg(tfunc)
                from .ops import stack as _stack
                from .function import stack
                return stack([t(tfunc) for t in tabs])
        return _VecTab()
    return _InterpTableND([ts], vals, kind)


def InterpTable2D(xs, ys, data, kind="cubic"):
    # reference convention (`InterpTable2D.h:72-75`): data rows = ys,
    # cols = xs (matrix/meshgrid layout); internally we store x-major
    data = np.asarray(data, dtype=np.float64)
    if data.shape == (len(ys), len(xs)):
        data = data.T
    return _InterpTableND([xs, ys], data, kind)


def InterpTable3D(xs, ys, zs, data, kind="cubic", cache=False):
    return _InterpTableND([xs, ys, zs], data, kind)


def InterpTable4D(xs, ys, zs, ws, data, kind="cubic", cache=False):
    return _InterpTableND([xs, ys, zs, ws], data, kind)
