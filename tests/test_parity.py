"""Round-5 parity sweep: user-facing Scaled/RowScaled/IOScaled wrappers
(reference `src/VectorFunctions/CommonFunctions/Scaled.h:637`,
`IOScaled.h`), Date utilities (reference `asset_asrl/Astro/Date.py`), and
the PSIOPT INIT pass (reference `src/Solvers/PSIOPT.h:29`,
`PSIOPT.cpp:728-807`)."""

import numpy as np

import asset_asrl_tpu as ast

vf = ast.VectorFunctions
oc = ast.OptimalControl
Args = vf.Arguments


def test_scaled_wrappers():
    A = Args(3)
    f = vf.stack([A[0] * A[1], vf.sin(A[2])])
    x = np.array([0.7, -1.3, 0.4])

    g = vf.Scaled(f, 2.5)
    assert np.allclose(g.compute(x), 2.5 * np.asarray(f.compute(x)))

    rs = np.array([2.0, -3.0])
    h = vf.RowScaled(f, rs)
    assert np.allclose(h.compute(x), rs * np.asarray(f.compute(x)))

    ins = np.array([0.5, 2.0, 1.5])
    outs = np.array([10.0, 0.1])
    k = vf.IOScaled(f, ins, outs)
    assert np.allclose(k.compute(x), outs * np.asarray(f.compute(ins * x)))

    # derivative consistency through the wrapper: J^T lam == adjoint grad
    lam = np.array([1.3, -0.2])
    fx, jx, gx, hx = k.computeall(x, lam)
    assert np.allclose(jx.T @ lam, gx, atol=1e-12)
    # chain rule: J_k = diag(outs) J_f(ins*x) diag(ins)
    jf = np.asarray(f.jacobian(ins * x))
    assert np.allclose(jx, outs[:, None] * jf * ins[None, :], atol=1e-12)


def test_scaled_size_checks():
    f = Args(2)[0] + Args(2)[1]
    try:
        vf.IOScaled(f, [1.0], [1.0])
        raise AssertionError("expected size mismatch error")
    except ValueError:
        pass


def test_date_parity():
    from asset_asrl_tpu.Astro import Date
    # J2000 epoch: 2000-01-01 12:00 TT
    assert Date.date_to_jd(2000, 1, 1, 12) == 2451545.0
    assert Date.jd_to_mjd(Date.mjd_to_jd(51544.5)) == 51544.5
    y, m, d = Date.jd_to_date(2451545.0)
    assert (y, m) == (2000, 1) and abs(d - 1.5) < 1e-9
    y, m, d, hh, mm, ss = Date.jd_to_date2(2451545.0)
    assert (y, m, d, hh) == (2000, 1, 1, 12)
    # day-fraction helpers round trip
    frac = Date.hmsm_to_days(13, 45, 30, 250000)
    assert Date.days_to_hmsm(frac) == (13, 45, 30, 250000)
    # datetime subclass round trip
    dt = Date.datetime(2025, 3, 14, 15, 9, 26)
    assert abs(Date.jd_to_datetime(dt.to_jd()).to_jd() - dt.to_jd()) < 1e-9
    # SPICE-style seconds past J2000
    assert Date.Date_SPJ2000(1, 1, 2000) == -43200.0
    assert Date.JD_SPJ2000D(2451546.0) == 1.0
    # pre-Gregorian date uses the Julian calendar (Meeus example 7.b:
    # 0333-01-27.5 -> JD 1842713.0)
    assert abs(Date.date_to_jd(333, 1, 27.5) - 1842713.0) < 1e-9


def test_psiopt_init_pass():
    """INIT pass parity: least-squares equality multipliers from a
    first-order unit-diagonal factorization warm-start the optimize.
    Uses a time-objective problem so the objective gradient (hence the
    multiplier estimate) is nonzero at the initial guess."""
    class DI(oc.ODEBase):
        def __init__(self):
            XtU = oc.ODEArguments(2, 1)
            super().__init__(vf.stack([XtU.XVar(1), XtU.UVar(0)]), 2, 1)

    ts = np.linspace(0, 2, 30)
    IG = [[t / 2, 0.5, t, 0.0] for t in ts]
    phase = DI().phase("LGL3", IG, 16)
    phase.addBoundaryValue("Front", [0, 1, 2], [0, 0, 0])
    phase.addBoundaryValue("Back", [0, 1], [1, 0])
    phase.addLUVarBound("Path", 3, -4.0, 4.0)
    phase.addDeltaTimeObjective(1.0)
    phase.transcribe()
    opt = phase.optimizer
    x, s, lamE, lamI = opt.init(phase.makeSolverInput())
    assert np.isfinite(lamE).all()
    assert np.abs(lamE).max() > 0.0
    opt.WarmStart = True
    opt.set_PrintLevel(2)
    flag = phase.optimize()
    assert flag == 0
