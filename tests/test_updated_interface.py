"""UpdatedInterface example variants (reference `examples/UpdatedInterface/`:
the named-variable Vgroups API, make_input/make_units, setUnits-based auto
scaling) — each variant is executed and asserted against its base example's
objective."""

import importlib.util
import os
import sys

import numpy as np
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_EX = os.path.join(_ROOT, "examples")
if _EX not in sys.path:
    sys.path.insert(0, _EX)

CONVERGED, ACCEPTABLE = 0, 1


def _load_ui(name):
    """Load examples/UpdatedInterface/<name>.py under a distinct module
    name so its `from <base> import ...` sibling imports resolve to the
    BASE examples (examples/ is on sys.path; importing the UI directory
    directly would shadow them and self-import)."""
    spec = importlib.util.spec_from_file_location(
        f"ui_{name}", os.path.join(_EX, "UpdatedInterface", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_ui_goddard_rocket():
    """Named-variable Goddard: single-phase vs 3-phase singular arc agree
    (measured 18728.06 / 18728.08 ft)."""
    mod = _load_ui("GoddardRocket")
    Traj, Traj2 = mod.run(print_level=2)
    assert abs(Traj[-1][0] - 18728.0) < 30.0, Traj[-1][0]
    assert abs(Traj[-1][0] - Traj2[-1][0]) < 0.5


@pytest.mark.slow
def test_ui_multiphase_cannon():
    """Cannonball with linked ODE-parameter radius: final range 3.280
    (measured; dymos's optimum at its constants is ~3.18 km)."""
    mod = _load_ui("MultiPhaseCannon")
    atraj, dtraj = mod.run(print_level=2)
    d = np.asarray(dtraj)
    assert abs(d[-1][3] - 3.280) < 0.05, d[-1][3]
    assert abs(d[-1][2]) < 1e-8          # lands at h = 0


@pytest.mark.slow
def test_ui_reentry():
    """Named-variable shuttle reentry: crossrange 0.59588 rad (Betts)."""
    mod = _load_ui("Reentry")
    out = mod.run(print_level=2)
    tr = np.asarray(out[0])
    assert abs(tr[-1][1] - 0.5958800738629952) < 2e-3, tr[-1][1]


@pytest.mark.slow
def test_ui_minimum_time_to_climb():
    mod = _load_ui("MinimumTimeToClimb")
    phase, flag = mod.solve(print_level=2)
    assert flag in (CONVERGED, ACCEPTABLE)
    t_climb = phase.returnTraj()[-1][4] * mod.Tstar
    assert abs(t_climb - 324.0) < 8.0, t_climb


@pytest.mark.slow
def test_ui_betts_low_thrust():
    mod = _load_ui("BettsLowThrust")
    flag, fw, _ = mod.run(print_level=2)
    assert flag == CONVERGED
    assert abs(fw - 0.220179) < 2e-4, fw


@pytest.mark.slow
def test_ui_delta3_launch():
    """Named-variable Delta III: final mass 7529.7499 kg (reference
    regression objective, `test_Delta3Launch.py:152`)."""
    mod = _load_ui("Delta3Launch")
    ocp = mod.build_ocp()
    ocp.optimizer.PrintLevel = 2
    ocp.solve_optimize()
    mfinal = ocp.Phases[3].returnTraj()[-1][6] * mod.Mstar
    assert abs(float(mfinal) - 7529.7499) < 1.0, mfinal
