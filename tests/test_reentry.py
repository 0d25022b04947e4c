"""Space-shuttle reentry regression (reference `examples/Reentry.py`,
`test_AdaptiveMesh/test_Reentry.py:120-123`): max-crossrange objectives
0.5958800738629952 rad (unconstrained) and 0.534620087611498 rad (heat-rate
constrained), matching Betts."""

import numpy as np
import pytest

import asset_asrl_tpu as ast

vf = ast.VectorFunctions
oc = ast.OptimalControl
Args = vf.Arguments
CONVERGED = ast.Solvers.ConvergenceFlags.CONVERGED

g0, W = 32.2, 203000
Lstar, Tstar = 100000.0, 60.0
Mstar = W / g0
Vstar = Lstar / Tstar
Astar = Lstar / Tstar ** 2
Rhostar = Mstar / Lstar ** 3
Mustar = Lstar ** 3 / Tstar ** 2

tmax = 2500 / Tstar
Re = 20902900 / Lstar
S = 2690.0 / Lstar ** 2
m = (W / g0) / Mstar
mu = 0.140765e17 / Mustar
rho0 = .002378 / Rhostar
h_ref = 23800 / Lstar
a0, a1 = -.20704, .029244
b0, b1, b2 = .07854, -.61592e-2, .621408e-3
c0, c1, c2, c3 = 1.0672181, -.19213774e-1, .21286289e-3, -.10117e-5
Qlimit = 70.0


class ShuttleReentry(oc.ODEBase):
    def __init__(self):
        XtU = oc.ODEArguments(5, 2)
        h, theta, v, gamma, psi = XtU.XVec().tolist()
        alpha, beta = XtU.UVec().tolist()
        alphadeg = (180.0 / np.pi) * alpha
        CL = a0 + a1 * alphadeg
        CD = b0 + b1 * alphadeg + b2 * (alphadeg ** 2)
        rho = rho0 * vf.exp(-h / h_ref)
        r = h + Re
        L = 0.5 * CL * S * rho * (v ** 2)
        D = 0.5 * CD * S * rho * (v ** 2)
        g = mu / (r ** 2)
        sgam, cgam = vf.sin(gamma), vf.cos(gamma)
        sbet, cbet = vf.sin(beta), vf.cos(beta)
        spsi, cpsi = vf.sin(psi), vf.cos(psi)
        hdot = v * sgam
        thetadot = (v / r) * cgam * cpsi
        vdot = -D / m - g * sgam
        gammadot = (L / (m * v)) * cbet + cgam * (v / r - g / v)
        psidot = L * sbet / (m * v * cgam) \
            + (v / r) * cgam * spsi * vf.tan(theta)
        super().__init__(vf.stack([hdot, thetadot, vdot, gammadot, psidot]),
                         5, 2)


def QFunc():
    h, v, alpha = Args(3).tolist()
    alphadeg = (180.0 / np.pi) * alpha
    rhodim = rho0 * vf.exp(-h / h_ref) * Rhostar
    vdim = v * Vstar
    qr = 17700 * vf.sqrt(rhodim) * ((.0001 * vdim) ** 3.07)
    qa = c0 + c1 * alphadeg + c2 * alphadeg ** 2 + c3 * alphadeg ** 3
    return qa * qr


def _build_phase():
    tf = 1000 / Tstar
    ht0, htf = 260000 / Lstar, 80000 / Lstar
    vt0, vtf = 25600 / Vstar, 2500 / Vstar
    gammat0, gammatf = np.deg2rad(-1.0), np.deg2rad(-5.0)
    psit0 = np.deg2rad(90.0)
    ts = np.linspace(0, tf, 200)
    TrajIG = []
    for t in ts:
        X = np.zeros(8)
        X[0] = ht0 * (1 - t / tf) + htf * t / tf
        X[2] = vt0 * (1 - t / tf) + vtf * t / tf
        X[3] = gammat0 * (1 - t / tf) + gammatf * t / tf
        X[4] = psit0
        X[5] = t
        TrajIG.append(X)

    ode = ShuttleReentry()
    phase = ode.phase("LGL3", TrajIG, 40)
    phase.addBoundaryValue("Front", range(0, 6), TrajIG[0][0:6])
    phase.addLUVarBounds("Path", [1, 3], np.deg2rad(-89.0),
                         np.deg2rad(89.0), 1.0)
    phase.addLUVarBound("Path", 6, np.deg2rad(-90.0), np.deg2rad(90.0), 1.0)
    phase.addLUVarBound("Path", 7, np.deg2rad(-90.0), np.deg2rad(1.0), 1.0)
    phase.addUpperDeltaTimeBound(tmax, 1.0)
    phase.addBoundaryValue("Back", [0, 2, 3], [htf, vtf, gammatf])
    phase.addDeltaVarObjective(1, -1.0)
    phase.optimizer.set_SoeLSMode("L1")
    phase.optimizer.set_OptLSMode("L1")
    phase.optimizer.set_PrintLevel(2)
    return phase


@pytest.mark.slow
def test_reentry():
    phase = _build_phase()
    flag = phase.solve_optimize()
    assert flag == CONVERGED
    phase.refineTrajManual(200)
    flag = phase.optimize()
    assert flag == CONVERGED
    crossrange = phase.returnTraj()[-1][1]
    assert abs(crossrange - 0.5958800738629952) < 2e-3, crossrange

    # heating-rate constrained variant (warm start from above)
    phase.addUpperFuncBound("Path", QFunc(), [0, 2, 6], Qlimit, 1 / Qlimit)
    flag = phase.optimize()
    assert flag == CONVERGED
    crossrange2 = phase.returnTraj()[-1][1]
    assert abs(crossrange2 - 0.534620087611498) < 2e-3, crossrange2
