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
