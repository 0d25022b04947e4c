"""Adaptive mesh refinement regressions (reference `examples/HyperSens.py`,
`test_AdaptiveMesh/` suite): the hypersensitive problem needs boundary-layer
resolution only discoverable by mesh refinement."""

import numpy as np
import pytest

import asset_asrl_tpu as ast

vf = ast.VectorFunctions
oc = ast.OptimalControl
Args = vf.Arguments
CONVERGED = ast.Solvers.ConvergenceFlags.CONVERGED


class HyperSens(oc.ODEBase):
    def __init__(self):
        XtU = oc.ODEArguments(1, 1)
        super().__init__(-XtU.XVar(0) + XtU.UVar(0), 1, 1)


def test_hypersensitive_adaptive():
    xt0, xtf, tf = 1.5, 1.0, 10000.0
    ode = HyperSens()
    TrajIG = [[xt0 * (1 - t / tf) + xtf * (t / tf), t, 0]
              for t in np.linspace(0, tf, 1000)]
    phase = ode.phase("LGL7", TrajIG, 10)
    phase.addBoundaryValue("First", [0, 1], [xt0, 0])
    phase.addBoundaryValue("Last", [0, 1], [xtf, tf])
    phase.addIntegralObjective(Args(2).squared_norm() / 2, [0, 2])
    phase.addLUVarBound("Path", 0, -50, 50)
    phase.addLUVarBound("Path", 2, -50, 50)
    phase.optimizer.set_OptLSMode("L1")
    phase.optimizer.set_SoeLSMode("L1")
    phase.optimizer.PrintLevel = 2
    phase.setAdaptiveMesh(True)
    phase.setMeshTol(1.0e-6)
    phase.setMaxMeshIters(8)

    flag = phase.solve_optimize()
    assert flag == CONVERGED
    # analytic long-horizon value: the entry boundary layer follows the
    # stable manifold (cost (sqrt2-1)/2 x0^2), the exit layer the unstable
    # one (cost (sqrt2+1)/2 xf^2)
    Jstar = (np.sqrt(2) - 1) / 2 * xt0 ** 2 + (np.sqrt(2) + 1) / 2 * xtf ** 2
    assert abs(phase.optimizer.LastObjVal - Jstar) < 5e-3, \
        (phase.optimizer.LastObjVal, Jstar)
    assert phase.numSegs > 10  # refinement actually happened


def test_mesh_error_decreases():
    """Refinement must reduce the re-integration error estimate."""
    from asset_asrl_tpu.OptimalControl.mesh import segment_errors
    xt0, xtf, tf = 1.5, 1.0, 40.0
    ode = HyperSens()
    TrajIG = [[xt0 * (1 - t / tf) + xtf * (t / tf), t, 0]
              for t in np.linspace(0, tf, 200)]

    errs = []
    for nsegs in (8, 32):
        phase = ode.phase("LGL3", TrajIG, nsegs)
        phase.addBoundaryValue("First", [0, 1], [xt0, 0])
        phase.addBoundaryValue("Last", [0, 1], [xtf, tf])
        phase.addIntegralObjective(Args(2).squared_norm() / 2, [0, 2])
        phase.optimizer.PrintLevel = 2
        assert phase.optimize() == CONVERGED
        errs.append(np.max(segment_errors(phase)))
    assert errs[1] < errs[0] * 0.2, errs
