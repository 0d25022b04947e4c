"""End-to-end regression: known objectives, convergence flags, iteration caps.

Mirrors the reference suite `asset_asrl/test/test_FullProblems/` (e.g.
`test_CartPole.py:38-91`): each problem must CONVERGE, within an iteration
cap, to a hard-coded known objective.
"""

import numpy as np
import pytest

import asset_asrl_tpu as ast

vf = ast.VectorFunctions
oc = ast.OptimalControl
solvs = ast.Solvers
Args = vf.Arguments
CONVERGED = solvs.ConvergenceFlags.CONVERGED


def test_rosenbrock():
    """Reference `test_FullProblems/test_RosenBrock.py`."""
    xy = Args(2)
    obj = (1 - xy[0]) ** 2 + 100 * ((xy[1] - xy[0] ** 2)) ** 2
    con = Args(2).squared_norm() - 2.0
    for lsmode in ["NOLS", "AUGLANG", "L1"]:
        prob = solvs.OptimizationProblem()
        prob.setVars([-1, -1])
        prob.addObjective(obj, [0, 1])
        prob.addInequalCon(con, [0, 1])
        prob.optimizer.set_OptLSMode(lsmode)
        prob.optimizer.PrintLevel = 3
        flag = prob.optimize()
        assert flag == CONVERGED, lsmode
        assert prob.optimizer.LastIterNum < 30
        assert np.linalg.norm(prob.returnVars() - [1, 1]) < 1e-5


class Brachistochrone(oc.ODEBase):
    def __init__(self, g):
        XtU = oc.ODEArguments(3, 1)
        x, y, v = XtU.XVec().tolist()
        theta = XtU.UVar(0)
        ode = vf.stack([vf.sin(theta) * v, -1.0 * vf.cos(theta) * v,
                        g * vf.cos(theta)])
        super().__init__(ode, 3, 1)


@pytest.mark.parametrize("tmode", ["LGL3", "LGL5", "LGL7", "Trapezoidal", "CentralShooting"])
def test_brachistochrone(tmode):
    g = 9.81
    ode = Brachistochrone(g)
    x0, y0, v0, theta0, xf, yf, tf = 0, 10, 0, 1.0, 10, 5, 1
    ts = np.linspace(0, tf, 100)
    IG = [[x0 + (xf - x0) * t / tf, y0 + (yf - y0) * t / tf,
           g * t * np.cos(theta0), t, theta0] for t in ts]
    phase = ode.phase(tmode, IG, 24)
    phase.addBoundaryValue("Front", range(0, 4), [x0, y0, v0, 0])
    phase.addLUVarBound("Path", 4, -0.1, 2.00)
    phase.addBoundaryValue("Back", [0, 1], [xf, yf])
    phase.addDeltaTimeObjective(1.0)
    phase.optimizer.PrintLevel = 2
    flag = phase.optimize()
    assert flag == CONVERGED
    assert phase.optimizer.LastIterNum < 40
    # all transcriptions must agree on the optimal transfer time
    assert abs(phase.optimizer.LastObjVal - 1.8012955) < 2e-3


class CartPoleODE(oc.ODEBase):
    def __init__(self, l, m1, m2, g):
        XtU = oc.ODEArguments(4, 1)
        x, theta, xdot, thetadot = XtU.XVec().tolist()
        F = XtU.UVar(0)
        Q = vf.stack([-g * vf.sin(theta),
                      F + m2 * l * vf.sin(theta) * thetadot ** 2])
        M = vf.RowMatrix(vf.stack(vf.cos(theta), l, m1 + m2,
                                  m2 * l * vf.cos(theta)), 2, 2)
        ode = vf.stack([xdot, thetadot, M.inverse() * Q])
        super().__init__(ode, 4, 1)


@pytest.mark.parametrize("tmode,cmode,nsegs", [
    ("LGL5", "HighestOrderSpline", 128),
    ("LGL5", "BlockConstant", 128),
    ("LGL7", "HighestOrderSpline", 96),
])
def test_cartpole(tmode, cmode, nsegs):
    """Reference `test_FullProblems/test_CartPole.py:38-91`: objective
    58.83219229674185 +- 0.1 across transcription x control modes, with the
    reference's segment counts (LGL5:128, LGL7:96)."""
    m1, m2, l, g = 1, .3, .5, 9.81
    Fmax, xmax, tf, xf = 20, 2, 2, 1
    ts = np.linspace(0, tf, 100)
    IG = [[xf * t / tf, np.pi * t / tf, 0, 0, t, .0] for t in ts]
    ode = CartPoleODE(l, m1, m2, g)
    phase = ode.phase(tmode, IG, nsegs)
    phase.setControlMode(cmode)
    phase.addBoundaryValue("First", range(0, 5), [0, 0, 0, 0, 0])
    phase.addBoundaryValue("Last", range(0, 5), [xf, np.pi, 0, 0, tf])
    phase.addLUVarBound("Path", 5, -Fmax, Fmax)
    phase.addLUVarBound("Path", 0, -xmax, xmax)
    phase.addIntegralObjective(Args(1)[0] ** 2, [5])
    phase.optimizer.set_PrintLevel(2)
    flag = phase.optimize()
    assert flag == CONVERGED
    assert phase.optimizer.LastIterNum <= 20
    assert abs(phase.optimizer.LastObjVal - 58.83219229674185) < 0.1
