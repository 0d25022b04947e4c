"""Interp table values + derivatives, 1-4D, linear+cubic, non-uniform axes.

Mirrors the reference suite `asset_asrl/test/test_VectorFunctions/
test_Tables.py:265-408`: tables built from smooth functions must reproduce
values and (via jax AD of the traced interpolant) first derivatives to
discretization accuracy, on uniform and non-uniform grids; tables must
compose into VectorFunctions.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import asset_asrl_tpu as ast

vf = ast.VectorFunctions
Args = vf.Arguments


def _nonuniform(a, b, n, seed):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(a, b, n - 2))
    return np.concatenate([[a], t, [b]])


# --------------------------------------------------------------------- 1D
@pytest.mark.parametrize("kind,tol_v,tol_d", [("linear", 2e-3, 5e-2),
                                              ("cubic", 2e-6, 2e-4)])
@pytest.mark.parametrize("uniform", [True, False])
def test_table1d_value_and_derivative(kind, tol_v, tol_d, uniform):
    f = np.sin
    df = np.cos
    if not uniform:
        tol_v, tol_d = tol_v * 5, tol_d * 3   # random knots: larger max gap
    ts = np.linspace(0, 2 * np.pi, 200) if uniform else \
        _nonuniform(0, 2 * np.pi, 300, 1)
    tab = vf.InterpTable1D(ts, f(ts), kind=kind)
    xs = np.linspace(0.3, 5.8, 41)
    vals = np.array([tab.interp(x) for x in xs])
    assert np.max(np.abs(vals - f(xs))) < tol_v

    g = jax.grad(lambda x: tab.interp_traced([x]))
    dvals = np.array([float(g(jnp.asarray(x))) for x in xs])
    assert np.max(np.abs(dvals - df(xs))) < tol_d


def test_table1d_linear_exact_on_affine():
    ts = _nonuniform(-1, 3, 17, 2)
    tab = vf.InterpTable1D(ts, 2.5 * ts - 1.0, kind="linear")
    for x in np.linspace(-1, 3, 23):
        assert abs(tab.interp(x) - (2.5 * x - 1.0)) < 1e-12


def test_table1d_vector_valued():
    ts = np.linspace(0, 1, 50)
    vals = np.stack([np.sin(ts), np.cos(ts), ts ** 2], axis=1)
    tab = vf.InterpTable1D(ts, vals, kind="cubic")
    tfun = Args(1)[0]
    fn = tab(tfun)
    out = np.asarray(fn.compute(np.array([0.4])))
    assert np.allclose(out, [np.sin(0.4), np.cos(0.4), 0.16], atol=1e-5)


# --------------------------------------------------------------------- 2D
@pytest.mark.parametrize("kind,tol_v,tol_d", [("linear", 6e-3, 1e-1),
                                              ("cubic", 2e-5, 2e-3)])
def test_table2d(kind, tol_v, tol_d):
    xs = np.linspace(0, np.pi, 80)
    ys = _nonuniform(0, 2.0, 90, 3)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    F = np.sin(X) * np.exp(-Y)
    tab = vf.InterpTable2D(xs, ys, F, kind=kind)

    pts = [(0.7, 0.3), (2.0, 1.5), (1.1, 0.9)]
    for x, y in pts:
        v = tab.interp(x, y)
        assert abs(v - np.sin(x) * np.exp(-y)) < tol_v
        g = jax.grad(lambda c: tab.interp_traced([c[0], c[1]]))(
            jnp.asarray([x, y]))
        gtrue = np.array([np.cos(x) * np.exp(-y), -np.sin(x) * np.exp(-y)])
        assert np.max(np.abs(np.asarray(g) - gtrue)) < tol_d


# --------------------------------------------------------------------- 3D
def test_table3d_cubic():
    xs = np.linspace(0, 1, 25)
    ys = np.linspace(-1, 1, 30)
    zs = _nonuniform(0, 2, 28, 4)
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    F = X ** 2 + np.sin(Y) * Z
    tab = vf.InterpTable3D(xs, ys, zs, F, kind="cubic")
    for (x, y, z) in [(0.4, 0.2, 1.1), (0.8, -0.5, 0.3)]:
        assert abs(tab.interp(x, y, z) - (x ** 2 + np.sin(y) * z)) < 5e-4
        g = jax.grad(lambda c: tab.interp_traced([c[0], c[1], c[2]]))(
            jnp.asarray([x, y, z]))
        gtrue = np.array([2 * x, np.cos(y) * z, np.sin(y)])
        assert np.max(np.abs(np.asarray(g) - gtrue)) < 2e-2


# --------------------------------------------------------------------- 4D
def test_table4d_linear():
    ax = [np.linspace(0, 1, 12) for _ in range(4)]
    G = np.meshgrid(*ax, indexing="ij")
    F = G[0] + 2 * G[1] + 3 * G[2] + 4 * G[3]
    tab = vf.InterpTable4D(*ax, F, kind="linear")
    # linear table is exact on affine data
    for pt in [(0.3, 0.6, 0.1, 0.9), (0.55, 0.25, 0.75, 0.4)]:
        want = pt[0] + 2 * pt[1] + 3 * pt[2] + 4 * pt[3]
        assert abs(tab.interp(*pt) - want) < 1e-12


# --------------------------------------- inside a VectorFunction + FD check
def test_table_in_expression_fd():
    ts = np.linspace(0, 3, 120)
    tab = vf.InterpTable1D(ts, np.exp(-ts), kind="cubic")
    X = Args(2)
    fn = tab(X[0] * X[1]) * 2.0
    x0 = np.array([0.7, 1.3])
    val = np.asarray(fn.compute(x0))[0]
    assert abs(val - 2 * np.exp(-0.91)) < 1e-5
    # jacobian vs finite differences
    J = np.asarray(fn.jacobian(x0))
    eps = 1e-6
    for i in range(2):
        xp = x0.copy()
        xp[i] += eps
        xm = x0.copy()
        xm[i] -= eps
        fd = (np.asarray(fn.compute(xp))[0]
              - np.asarray(fn.compute(xm))[0]) / (2 * eps)
        assert abs(J[0, i] - fd) < 1e-4


# ---------------------------------------- scheme-order trajectory table
def test_phase_table_scheme_order():
    """from_phase tables interpolate at the transcription's own order
    (reference `LGLInterpTable.cpp`): on exact harmonic-oscillator
    samples an LGL5 (cs=3) table must converge ~h^6 — far beyond
    cubic's h^4 — and LGL7 beyond that."""
    import asset_asrl_tpu as ast
    from asset_asrl_tpu.OptimalControl.interp_table import LGLInterpTable
    oc = ast.OptimalControl

    class Osc(oc.ODEBase):
        def __init__(self):
            XtU = oc.ODEArguments(2, 0)
            super().__init__(vf.stack([XtU.XVar(1), -1.0 * XtU.XVar(0)]),
                             2, 0)

    def exact(ts):
        return np.stack([np.cos(ts), -np.sin(ts)], axis=1)

    tq = np.linspace(0.05, 2.95, 731)

    for mode, cs, min_order, sizes in (("LGL5", 3, 5.0, (6, 12)),
                                       ("LGL7", 4, 6.5, (2, 4))):
        errs = []
        for S in sizes:
            ode = Osc()
            ts0 = np.linspace(0, 3.0, 40)
            IG = [[np.cos(t), -np.sin(t), t] for t in ts0]
            ph = ode.phase(mode, IG, S)
            # exact samples at the node times (no setTraj interp error)
            tn = ph.t0 + ph.taus * (ph.tf - ph.t0)
            ph._traj = np.concatenate([exact(tn), tn[:, None]], axis=1)
            tab = LGLInterpTable.from_phase(ph)
            vals = tab.eval_batch(tq)
            errs.append(np.max(np.abs(vals - exact(tq))))
        order = np.log2(errs[0] / errs[1])
        assert order > min_order, (mode, errs, order)


def test_resample_traj_scheme_order():
    """resampleTraj keeps the solution's accuracy: re-meshing exact LGL5
    samples onto a finer mesh must incur only ~h^6 error, not linear."""
    import asset_asrl_tpu as ast
    oc = ast.OptimalControl

    class Osc(oc.ODEBase):
        def __init__(self):
            XtU = oc.ODEArguments(2, 0)
            super().__init__(vf.stack([XtU.XVar(1), -1.0 * XtU.XVar(0)]),
                             2, 0)

    ode = Osc()
    ts0 = np.linspace(0, 3.0, 40)
    IG = [[np.cos(t), -np.sin(t), t] for t in ts0]
    ph = ode.phase("LGL5", IG, 8)
    tn = ph.t0 + ph.taus * (ph.tf - ph.t0)
    ph._traj = np.concatenate(
        [np.stack([np.cos(tn), -np.sin(tn)], axis=1), tn[:, None]], axis=1)
    ph.resampleTraj(13)
    tn2 = ph.t0 + ph.taus * (ph.tf - ph.t0)
    err = np.max(np.abs(ph._traj[:, 0] - np.cos(tn2)))
    assert err < 5e-7, err   # linear resampling would be ~1e-2
