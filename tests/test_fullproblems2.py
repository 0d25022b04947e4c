"""More end-to-end regressions: VanDerPol, Goddard rocket (single and
3-phase with singular-arc path constraint), linked-phase continuity.

References: `examples/VanDerPol.py`, `examples/GoddardRocket.py`,
`asset_asrl/test/test_FullProblems/`.
"""

import numpy as np
import pytest

import asset_asrl_tpu as ast

vf = ast.VectorFunctions
oc = ast.OptimalControl
Args = vf.Arguments
CONVERGED = ast.Solvers.ConvergenceFlags.CONVERGED


class VanderPol(oc.ODEBase):
    def __init__(self):
        args = oc.ODEArguments(2, 1)
        x0, x1, u = args[0], args[1], args[3]
        ode = vf.stack((1.0 - x1 * x1) * x0 - x1 + u, x0)
        super().__init__(ode, 2, 1)


def test_vanderpol():
    ode = VanderPol()
    tf = 10.0
    TrajIG = [[0, 1, t, 0] for t in np.linspace(0, tf, 100)]
    phase = ode.phase("LGL3", TrajIG, 128)
    phase.setControlMode("BlockConstant")
    phase.addBoundaryValue("Front", range(0, 3), [0, 1, 0])
    phase.addLUVarBound("Path", 3, -0.75, 1.0, 1.0)
    phase.addIntegralObjective(Args(3).squared_norm(), [0, 1, 3])
    phase.addBoundaryValue("Back", [0, 1, 2], [0.0, 0.0, tf])
    phase.optimizer.PrintLevel = 2
    phase.optimizer.set_tols(1.0e-8, 1.0e-8, 1.0e-8)
    flag = phase.optimize()
    assert flag == CONVERGED
    # dymos reference objective for this configuration is ~2.87
    assert abs(phase.optimizer.LastObjVal - 2.87) < 0.1


# ---------------------------------------------------------------- Goddard
g0, Lstar, Tstar, Mstar = 32.2, 10000.0, 60.0, 1
Vstar = Lstar / Tstar
Fstar = Mstar * Lstar / Tstar ** 2
Astar = Lstar / Tstar ** 2
Rhostar = Mstar / Lstar ** 3
sigmastar = Mstar / Lstar
rho0 = .002378 / Rhostar
h_ref = 23800 / Lstar
g = g0 / Astar
Tmag = 200 / Fstar
c = 1580.94 / Vstar
sigma = 5.4915e-5 / sigmastar
m0, mf = 3, 1


class GoddardRocket(oc.ODEBase):
    def __init__(self):
        args = oc.ODEArguments(3, 1)
        h, v, m = args.XVec().tolist()
        u = args.UVar(0)
        vdot = (u * Tmag - sigma * (v ** 2) * vf.exp(-h / h_ref)) / m - g
        super().__init__(vf.stack(v, vdot, -u * Tmag / c), 3, 1)


def _goddard_ig():
    ode = GoddardRocket()
    ulaw = vf.ifelse(Args(1)[0] > mf, 1, 0)
    integ = ode.integrator(.01, ulaw, [2])
    X0 = np.zeros(5)
    X0[2] = m0
    X0[4] = 1
    return ode, integ.integrate_dense(X0, 60 / Tstar, 500,
                                      lambda x: x[1] < 0)


def test_goddard_single_phase():
    ode, TrajIG = _goddard_ig()
    phase = ode.phase("LGL3", TrajIG, 96)
    phase.addBoundaryValue("Front", range(0, 4), TrajIG[0][0:4])
    phase.addLUVarBound("Path", 4, 0.0, 1.0, 1.0)
    phase.addValueObjective("Back", 0, -1.0)
    phase.addBoundaryValue("Back", [1, 2], [0, mf])
    phase.optimizer.PrintLevel = 2
    flag = phase.optimize()
    assert flag == CONVERGED
    hf = phase.returnTraj()[-1][0] * Lstar
    # regression value cross-validated against the multi-phase formulation
    # (agreement to 0.3 ft) — see test_goddard_multiphase
    assert abs(hf - 18727.8) < 20, hf


def test_goddard_multiphase():
    ode, TrajIG = _goddard_ig()

    def PathCon():
        h, v, m, u = Args(4).tolist()
        t1 = (u * Tmag - sigma * (v ** 2) * vf.exp(-h / h_ref)) - g * m
        t2 = (m * g / (1 + 4 * (c / v) + 2 * (c / v) ** 2)) * (
            c * c * (1 + v / c) / (h_ref * g) - 1.0 - 2.0 * c / v)
        return t1 - t2

    n = len(TrajIG) // 3
    phase1 = ode.phase("LGL3", TrajIG[0:n], 24)
    phase1.addBoundaryValue("Front", range(0, 4), TrajIG[0][0:4])
    phase1.addBoundaryValue("Path", [4], [1])
    phase2 = ode.phase("LGL3", TrajIG[n:2 * n], 24)
    phase2.setControlMode("NoSpline")
    phase2.addLUVarBound("Path", 4, 0.0, 1.0, 1.0)
    phase2.addEqualCon("Path", PathCon(), [0, 1, 2, 4])
    phase3 = ode.phase("LGL3", TrajIG[2 * n:-1], 24)
    phase3.addBoundaryValue("Path", [4], [0])
    phase3.addBoundaryValue("Back", [1, 2], [0, mf])
    phase3.addValueObjective("Back", 0, -1.0)

    ocp = oc.OptimalControlProblem()
    ocp.addPhase(phase1)
    ocp.addPhase(phase2)
    ocp.addPhase(phase3)
    ocp.addForwardLinkEqualCon(phase1, phase3, range(0, 4))
    phase1.addLowerDeltaTimeBound(0)
    phase2.addLowerDeltaTimeBound(0)
    phase3.addLowerDeltaTimeBound(0)
    ocp.optimizer.PrintLevel = 2
    flag = ocp.optimize()
    assert flag == CONVERGED
    hf = phase3.returnTraj()[-1][0] * Lstar
    assert abs(hf - 18727.8) < 20, hf
    # continuity across links
    assert np.allclose(phase1.returnTraj()[-1][:4],
                       phase2.returnTraj()[0][:4], atol=1e-6)


class _Cannon(oc.ODEBase):
    """Multi-phase cannonball with ODE parameter (reference
    `examples/MultiPhaseCannon.py`): find the ball radius maximizing range."""

    G0, LSTAR, TSTAR, MSTAR = 9.81, 1000, 60.0, 10
    ASTAR = LSTAR / TSTAR ** 2
    RHOSTAR = MSTAR / LSTAR ** 3
    ESTAR = MSTAR * (LSTAR / TSTAR) ** 2
    CD = .5
    RHOAIR = 1.225 / RHOSTAR
    RHOIRON = 7870 / RHOSTAR
    HSCALE = 8.44e3 / LSTAR
    E0 = 400000 / ESTAR
    G = G0 / ASTAR

    @classmethod
    def mass(cls, rad):
        return (4 / 3) * (np.pi * cls.RHOIRON) * rad ** 3

    def __init__(self):
        args = oc.ODEArguments(4, 0, 1)
        v, gamma, h, r = args.XVec().tolist()
        rad = args.PVar(0)
        S = np.pi * rad ** 2
        M = self.mass(rad)
        rho = self.RHOAIR * vf.exp(-h / self.HSCALE)
        D = (0.5 * self.CD) * rho * (v ** 2) * S
        ode = vf.stack([-D / M - self.G * vf.sin(gamma),
                        -self.G * vf.cos(gamma) / v,
                        v * vf.sin(gamma), v * vf.cos(gamma)])
        super().__init__(ode, 4, 0, 1)


def test_multiphase_cannon():
    C = _Cannon
    rad0 = .1 / C.LSTAR
    h0, r0 = 100 / C.LSTAR, 0
    gamma0 = np.deg2rad(45)
    v0 = np.sqrt(2 * C.E0 / C.mass(rad0)) * .99
    ode = _Cannon()
    integ = ode.integrator(.01)
    integ.setAbsTol(1e-13)
    IG = np.zeros(6)
    IG[0], IG[1], IG[2], IG[3], IG[5] = v0, gamma0, h0, r0, rad0

    apex = oc.ODEArguments(4, 0, 1)
    AscentIG = integ.integrate_dense(
        IG, 60 / C.TSTAR, [(apex[0] * vf.sin(apex[1]), 0, 1)])[0]
    DescentIG = integ.integrate_dense(
        AscentIG[-1], AscentIG[-1][4] + 1000 / C.TSTAR,
        [(oc.ODEArguments(4, 0, 1)[2], 0, 1)])[0]

    def EFunc():
        v, rad = Args(2).tolist()
        return 0.5 * C.mass(rad) * v ** 2 - C.E0

    aphase = ode.phase("LGL5", AscentIG, 96)
    aphase.addLowerVarBound("ODEParams", 0, 0.0, 1)
    aphase.addLowerVarBound("Front", 1, 0.0, 1.0)
    aphase.addBoundaryValue("Front", [2, 3, 4], [h0, r0, 0])
    aphase.addInequalCon("Front", EFunc() * .01, [0], [0], [])
    aphase.addBoundaryValue("Back", [1], [0.0])
    dphase = ode.phase("LGL5", DescentIG, 96)
    dphase.addBoundaryValue("Back", [2], [0.0])
    dphase.addValueObjective("Back", 3, -1.0)
    ocp = oc.OptimalControlProblem()
    ocp.addPhase(aphase)
    ocp.addPhase(dphase)
    ocp.addForwardLinkEqualCon(aphase, dphase, [0, 1, 2, 3, 4])
    ocp.addDirectLinkEqualCon(0, "ODEParams", [0], 1, "ODEParams", [0])
    ocp.optimizer.set_OptLSMode("L1")
    ocp.optimizer.set_PrintLevel(2)
    flag = ocp.optimize()
    assert flag == CONVERGED
    D = dphase.returnTraj()
    dist = D[-1][3] * C.LSTAR
    radius = D[-1][-1] * C.LSTAR
    assert abs(dist - 3280.2) < 25, dist
    assert abs(radius - 0.04195) < 5e-3, radius
    # ODE param linked across phases
    assert abs(aphase.returnTraj()[0][-1] - D[-1][-1]) < 1e-10
