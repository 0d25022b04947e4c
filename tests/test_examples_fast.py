"""Fast regression versions of the newly ported examples: each must
converge to its cited objective (reference test strategy, SURVEY.md §4)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))

CONVERGED = 0


def test_simple_low_thrust():
    """Reference `examples/SimpleLowThrust.py`: time-optimal r=1 -> r=2
    raising at a=0.02; tof ~= 18.3 canonical units."""
    from SimpleLowThrust import run
    out = run(nsegs=64, print_level=2)
    tof = out["time"][-1][6]
    assert abs(tof - 18.27) < 0.3, tof


def test_multiphase_zermelo():
    """Two linked legs under an adverse uniform wind: converged total
    time 3.2356 (measured), waypoints hit, time chained continuously
    (reference forward-link continuity,
    `OptimalControlProblem.h:580-861`)."""
    from MultiPhaseZermelo import navigate, uniformWind
    Points = [np.array(p) for p in [[0, 0], [2, 1], [3, 3]]]
    traj, ocp = navigate(Points, vM=2.5, wF=uniformWind, print_level=2)
    assert ocp.optimizer.ConvergeFlag == CONVERGED
    assert abs(traj[-1][2] - 3.2356) < 0.05, traj[-1][2]
    T0 = np.asarray(ocp.Phases[0].returnTraj())
    T1 = np.asarray(ocp.Phases[1].returnTraj())
    assert np.allclose(T0[-1, :2], [2, 1], atol=1e-6)
    assert np.allclose(T1[-1, :2], [3, 3], atol=1e-6)
    assert abs(T0[-1, 2] - T1[0, 2]) < 1e-6   # time continuity


@pytest.mark.slow
def test_parallel_parking():
    """Li/Wang/Chu 2016 case 7: maneuver time 18.426 s; ours within 1%."""
    from ParallelParking import Main
    t, Traj = Main(nsegs1=40, nsegs2=80, print_level=2)
    assert abs(t - 18.426) < 0.4, t


@pytest.mark.slow
def test_optimal_docking_form2():
    from OptimalDocking import Form2
    flag, tf, Traj = Form2(nsegs=96, print_level=2)
    assert flag == CONVERGED
    assert 120 < tf < 260, tf


@pytest.mark.slow
def test_dionysus():
    """Junkins & Taheri mass-optimal Earth->Dionysus; final mass should
    exceed 1500 kg of the 4000 kg stack at converged meshes (the global
    optimum is ~2718 kg; coarse meshes find lower-mass local optima)."""
    from DionysusLowThrust import run
    flag, fm, _ = run(nsegs=150, print_level=2)
    assert flag == CONVERGED
    # global optimum ~2718 kg (Junkins & Taheri); measured 2715.93 at
    # 150 LGL segments
    assert fm > 2700, fm


@pytest.mark.slow
def test_heteroclinic():
    """CR3BP L1->L2 heteroclinic connection: at the example's full
    manifold resolution the matched connection needs ~0.07 m/s of DV
    (measured; nman=24 deterministically seeds a poor 1524 m/s pair,
    so the full nman=40 set is required)."""
    from Heteroclinic import main
    Traj1, Traj2, DV = main()
    assert DV < 10.0, DV


@pytest.mark.slow
def test_betts_low_thrust():
    """Betts example 6 (LEO->MEO zonal-harmonics low thrust): final
    weight ~0.220172 lb (Betts' published optimum)."""
    from BettsLowThrust import run
    flag, fw, _ = run(print_level=2)
    assert flag == CONVERGED
    assert abs(fw - 0.220179) < 2e-4, fw
