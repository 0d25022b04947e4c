"""Regression net over the remaining example scripts (reference test
strategy: `asset_asrl/test/test_FullProblems/`, SURVEY.md §4) — every
`examples/` problem is executed and asserted against a cited or
closed-form objective."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))

CONVERGED, ACCEPTABLE = 0, 1


def test_analytic_example():
    """Closed-form LQR-like problem (Hindawi AAA 2014/851720): collocation
    control AND costates (returnCostateTraj covector mapping) must match
    the analytic optimum."""
    from AnalyticExample import run
    flag, uerr, lerr, _ = run(print_level=2)
    assert flag == CONVERGED
    assert uerr < 5e-3, uerr
    assert lerr < 5e-2, lerr


def test_bryson_denham():
    """Analytic objective 4/(9*l) = 4 at l = 1/9."""
    from BrysonDenham import run
    flag, obj, _ = run(print_level=2)
    assert flag == CONVERGED
    assert abs(obj - 4.0) < 1e-2, obj


def test_zermelo_no_wind():
    """No-wind minimum time = straight-line distance / speed (analytic)."""
    from Zermelo import navigate, noWind
    A, B = np.array([0.0, 0.0]), np.array([2.0, 1.0])
    traj, flag = navigate(A, B, vM=1, wF=noWind, nseg=48, tols=1e-10,
                          print_level=2)
    assert flag == CONVERGED
    assert abs(traj[-1][2] - np.sqrt(5.0)) < 1e-6


@pytest.mark.slow
def test_zermelo_winds():
    """Wind-field variants must converge with times ordered sensibly
    (any wind leaves tf finite and > 0)."""
    from Zermelo import navigate, uniformWind, variableDirWind
    A, B = np.array([0.0, -1.0]), np.array([1.0, 1.0])
    t2, f2 = navigate(A, B, vM=1.25,
                      wF=lambda xyt: uniformWind(xyt, vel=0.5),
                      nseg=64, tols=1e-10, print_level=2)
    assert f2 == CONVERGED and 0 < t2[-1][2] < 10
    t4, f4 = navigate(A, B, vM=1.25, wF=variableDirWind, nseg=64,
                      tols=1e-10, print_level=2)
    assert f4 == CONVERGED and 0 < t4[-1][2] < 10


@pytest.mark.slow
def test_mountain_car():
    """dymos reference escape time ~103 (measured 103.98 at 128 LGL3)."""
    from MountainCar import run
    flag, t_esc, _ = run(print_level=2)
    assert flag in (CONVERGED, ACCEPTABLE)
    assert abs(t_esc - 103.0) < 3.0, t_esc


@pytest.mark.slow
def test_free_flying_robot():
    """arXiv:1905.11898 minimum-fuel objective J* ~= 7.910 (measured
    7.9147 at 128 LGL5)."""
    from FreeFlyingRobot import run
    flag, obj, _ = run(print_level=2)
    assert flag == CONVERGED
    assert abs(obj - 7.910) < 0.05, obj


@pytest.mark.slow
def test_bike_obstacle():
    """Minimum transit time around the obstacle (measured 5.045 s at
    128 LGL3; straight-line lower bound 100/29 = 3.45 s)."""
    from BikeObstacle import run
    flag, tt, phase = run(print_level=2)
    assert flag == CONVERGED
    assert 4.8 < tt < 5.3, tt
    # obstacle margin actually respected along the path
    T = np.array(phase.returnTraj())
    d = np.hypot(T[:, 0] - 0.0, T[:, 1] - 50.0)
    assert d.min() > 7.49, d.min()


@pytest.mark.slow
def test_minimum_time_to_climb():
    """Bryson 1969 / ICLOCS2 supersonic climb: ~324 s minimum time."""
    from MinimumTimeToClimb import solve, Tstar
    phase, flag = solve(nsegs=50)
    assert flag in (CONVERGED, ACCEPTABLE)
    tclimb = phase.returnTraj()[-1][4] * Tstar
    assert abs(tclimb - 324.0) < 8.0, tclimb


@pytest.mark.slow
def test_topputto_low_thrust():
    """Planar r=1 -> r=4 raising (Topputto & Zhang formulation):
    time-optimal tof 55.55 and fuel-optimal tof ~115.8 with terminal
    coast (throttle at its lower bound), measured at 150 LGL3 segs."""
    from TopputtoLowThrust import run
    To, Mo = run(nsegs=150, print_level=2)
    tof = To[-1][4]
    mo = np.asarray(Mo)
    assert abs(tof - 55.55) < 1.0, tof
    assert abs(mo[-1][4] - 115.8) < 3.0, mo[-1][4]
    assert mo[-1][5] < 0.01  # fuel-optimal ends coasting


@pytest.mark.slow
def test_orbit_continuation():
    """CR3BP L1 Lyapunov family: each continuation step re-solves the
    periodicity system through subVariables without re-transcription."""
    from OrbitContinuation import lyapunov_family
    tl = lyapunov_family(dx=-0.02, lim=0.76)
    assert len(tl) >= 3
    for orbit in (tl[0], tl[-1]):
        o = np.asarray(orbit)
        # periodic: y, vx, vz return to 0 at the half/full period map
        assert abs(o[-1][1]) < 1e-8
        assert abs(o[-1][3]) < 1e-8


@pytest.mark.slow
def test_hanging_chain_jet():
    """Catenary family via Jet ensemble: each chain converges and hangs
    between the anchors (min height below both anchor heights for the
    longer chains)."""
    from HangingChain import run
    Ls = np.linspace(2.25, 8, 4)
    Res = run(n=48, Ls=Ls, nthreads=4)
    assert len(Res) == 4
    nconv = 0
    for res, L in zip(Res, Ls):
        if res.optimizer.ConvergeFlag != CONVERGED:
            continue
        nconv += 1
        T = np.asarray(res.returnTraj())
        assert abs(T[0, 0] - 1.0) < 1e-6 and abs(T[-1, 0] - 3.0) < 1e-6
        if L > 3.0:
            assert T[:, 0].min() < 1.0  # long chains sag below anchor a
    assert nconv >= 3, nconv
