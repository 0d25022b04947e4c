"""Astro layer validation: propagation, Lambert, conversions, dynamics
consistency.  Mirrors `asset_asrl/test/test_OptimalControl/test_Integrators.py`
(TwoBody STM checks) and the KeplerUtils/Lambert correctness expectations."""

import numpy as np
import pytest

import asset_asrl_tpu as ast

A = ast.Astro
vf = ast.VectorFunctions


RV0 = np.array([1.0, 0.05, -0.02, 0.02, 1.05, 0.15])


def test_kepler_propagation_vs_integration():
    tb = A.TwoBody(A.Constants.MuEarth, 7000e3)
    integ = tb.integrator(0.01)
    integ.setAbsTol(1e-13)
    for T in [0.5, 3.0, 7.0]:
        rv1 = A.propagate_kepler(RV0, T)
        rv2 = integ.integrate(np.concatenate([RV0, [0.0]]), T)
        assert np.abs(rv1 - rv2[:6]).max() < 1e-10


def test_kepler_propagator_stm():
    kp = A.KeplerPropagator(1.0)
    X = np.concatenate([RV0, [2.5]])
    J = kp.jacobian(X)
    h = 1e-7
    for i in range(7):
        Xp = X.copy(); Xp[i] += h
        Xm = X.copy(); Xm[i] -= h
        col = (kp.compute(Xp) - kp.compute(Xm)) / (2 * h)
        assert np.abs(J[:, i] - col).max() < 1e-6
    # STM of a Hamiltonian flow is symplectic: det = 1
    assert abs(np.linalg.det(J[:6, :6]) - 1.0) < 1e-8


def test_lambert_roundtrip():
    for T in [0.8, 2.0, 4.5]:
        rvB = A.propagate_kepler(RV0, T)
        v1, v2 = A.lambert_izzo(RV0[:3], rvB[:3], T)
        assert np.abs(v1 - RV0[3:]).max() < 1e-9
        assert np.abs(v2 - rvB[3:]).max() < 1e-9


def test_element_conversions():
    rng = np.random.default_rng(3)
    for _ in range(10):
        rv = np.concatenate([rng.normal(size=3) * 0.5 + [1.2, 0, 0],
                             rng.normal(size=3) * 0.3 + [0, 1.0, 0]])
        oe = A.cartesian_to_classic(rv)
        assert np.abs(A.classic_to_cartesian(oe) - rv).max() < 1e-10
        mee = A.cartesian_to_modified(rv)
        assert np.abs(A.modified_to_cartesian(mee) - rv).max() < 1e-10


def test_mee_dynamics_consistency():
    """MEE ballistic propagation must match cartesian two-body."""
    m = A.MEETwoBody_LT(A.Constants.MuEarth, 7000e3)
    mee0 = A.cartesian_to_modified(RV0)
    row = np.concatenate([mee0, [0.0], [0, 0, 0]])   # zero throttle
    integ = m.integrator(0.01)
    integ.setAbsTol(1e-13)
    T = 2.0
    out = integ.integrate(row, T)
    rv_mee = A.modified_to_cartesian(out[:6])
    rv_cart = A.propagate_kepler(RV0, T)
    assert np.abs(rv_mee - rv_cart).max() < 1e-9


def test_cr3bp_jacobi_conservation():
    cr = A.CR3BP(A.Constants.MuEarth, A.Constants.MuMoon, A.Constants.LD)
    x0 = np.concatenate([cr.L4 + [0.01, 0.0, 0.0], [0, 0.01, 0], [0.0]])
    integ = cr.integrator(0.01)
    integ.setAbsTol(1e-13)
    traj = integ.integrate_dense(x0, 5.0, 50)
    c0 = cr.JacobiConstant(traj[0])
    cf = cr.JacobiConstant(traj[-1])
    assert abs(cf - c0) < 1e-10


def test_twobody_lt_thrust():
    lt = A.TwoBody_LT(A.Constants.MuEarth, 7000e3,
                      A.LowThrustAcc(NonDim_LTacc=0.05))
    row = np.concatenate([RV0, [0.0], [0, 1, 0]])
    f = lt.vf().compute(row)
    f0 = A.TwoBody(A.Constants.MuEarth, 7000e3).vf().compute(
        np.concatenate([RV0, [0.0]]))
    assert np.allclose(f - f0, [0, 0, 0, 0, 0.05, 0])


def test_element_conversion_roundtrip_and_jacobian():
    """Differentiable conversions (reference KeplerUtils.cpp:13-59 binds
    them as VectorFunctions): roundtrip + AD jacobian vs finite diff."""
    import numpy as np
    from asset_asrl_tpu.Astro import (CartesianToClassic, ClassicToCartesian,
                                      CartesianToModified,
                                      ModifiedToCartesian,
                                      classic_to_cartesian)
    oe = np.array([1.3, 0.23, 0.4, 1.1, 0.7, 0.9])
    rv = classic_to_cartesian(oe, mu=1.0)
    c2c = CartesianToClassic(1.0)
    back = np.asarray(c2c.compute(rv))
    assert np.allclose(back, oe, atol=1e-10), back - oe

    m2c = ModifiedToCartesian(1.0)
    c2m = CartesianToModified(1.0)
    mee = np.asarray(c2m.compute(rv))
    rv2 = np.asarray(m2c.compute(mee))
    assert np.allclose(rv2, rv, atol=1e-10)

    # jacobian vs FD
    J = np.asarray(c2m.jacobian(rv))
    eps = 1e-7
    for i in range(6):
        xp, xm = rv.copy(), rv.copy()
        xp[i] += eps
        xm[i] -= eps
        fd = (np.asarray(c2m.compute(xp)) - np.asarray(c2m.compute(xm))) \
            / (2 * eps)
        assert np.max(np.abs(J[:, i] - fd)) < 1e-5, i


def test_lambert_batch_matches_scalar_and_dynamics():
    """Vmapped Lambert: (a) equals the scalar call, (b) propagating
    (r1, v1) by tof lands on r2 (reference LambertSolvers.cpp:21 batch)."""
    import numpy as np
    from asset_asrl_tpu.Astro import (lambert_izzo, lambert_izzo_batch,
                                      propagate_kepler)
    rng = np.random.default_rng(3)
    r1s, r2s, tofs = [], [], []
    for _ in range(6):
        r1 = np.array([1.0, 0, 0]) + rng.normal(size=3) * 0.05
        ang = 1.0 + rng.uniform(0, 1.5)
        r2 = 1.2 * np.array([np.cos(ang), np.sin(ang), 0.1 * rng.normal()])
        r1s.append(r1)
        r2s.append(r2)
        tofs.append(1.5 + rng.uniform(0, 2.0))
    V1, V2 = lambert_izzo_batch(r1s, r2s, tofs)
    for i in range(6):
        v1, v2 = lambert_izzo(r1s[i], r2s[i], tofs[i])
        assert np.allclose(V1[i], v1, atol=1e-12)
        # dynamics check: propagate and compare end position
        out = propagate_kepler(np.concatenate([r1s[i], V1[i]]), tofs[i])
        assert np.allclose(out[:3], r2s[i], atol=1e-8), \
            (i, out[:3] - r2s[i])
        assert np.allclose(out[3:], V2[i], atol=1e-8)


def test_rootfinder_node():
    """ScalarRootFinder (reference RootFinder.h:29-50): solve Kepler's
    equation E - e sin E = M inside an expression; check value and the
    implicit derivative dE/dM = 1/(1 - e cos E)."""
    import numpy as np
    import asset_asrl_tpu as ast
    vf = ast.VectorFunctions
    X = vf.Arguments(3)    # [E_guess, e, M]
    fx = X[0] - X[1] * vf.sin(X[0]) - X[2]
    rf = vf.ScalarRootFinder(fx)
    e, M = 0.3, 1.1
    inp = np.array([M, e, M])
    E = float(np.asarray(rf.compute(inp))[0])
    assert abs(E - e * np.sin(E) - M) < 1e-11
    J = np.asarray(rf.jacobian(inp))
    dEdM = 1.0 / (1.0 - e * np.cos(E))
    assert abs(J[0, 2] - dEdM) < 1e-9
    assert abs(J[0, 0]) < 1e-9      # no dependence on the guess


def test_j2_cartesian():
    """J2Cartesian (reference J2.h:14-33): matches the textbook J2
    acceleration for an equatorial pole."""
    import numpy as np
    from asset_asrl_tpu.Astro import J2Cartesian
    mu, J2, Rb = 1.0, 1.0e-3, 1.0
    fn = J2Cartesian(mu, J2, Rb)
    r = np.array([0.9, 0.3, 0.5])
    p = np.array([0.0, 0.0, 1.0])
    a = np.asarray(fn.compute(np.concatenate([r, p])))
    rn = np.linalg.norm(r)
    z = r[2]
    pref = 1.5 * J2 * mu * Rb ** 2 / rn ** 4
    want = pref * np.array([
        r[0] / rn * (5 * z ** 2 / rn ** 2 - 1),
        r[1] / rn * (5 * z ** 2 / rn ** 2 - 1),
        r[2] / rn * (5 * z ** 2 / rn ** 2 - 3)])
    assert np.allclose(a, want, rtol=1e-12), (a, want)
