"""EPPRFrame: Ephemeris-Perturbed Pulsating Rotating frame.

Reference: `asset_asrl/Astro/Extensions/EPPRFrame.py:23-501`.  A CR3BP-like
rotating-pulsating frame built from REAL (or analytic) P1/P2 ephemerides:
the x-axis tracks the instantaneous P1->P2 line, lengths pulse with the
instantaneous separation r(t), and the EOMs carry the full non-inertial
corrections (angular velocity W, its derivative, barycenter acceleration,
pulsation terms) interpolated from precomputed tables.

Ephemeris source is pluggable like NBodyFrame: SPICE when available, or
precomputed / analytic Keplerian trajectories (P1Data/P2Data kwargs)."""

from __future__ import annotations

import numpy as np

from ... import VectorFunctions as vf
from ...OptimalControl.interp_table import LGLInterpTable, InterpFunction
from ...OptimalControl.fdtable import FiniteDiffTable
from ..Frames import CR3BPFrame
from .. import Constants as c

Args = vf.Arguments
norm = np.linalg.norm

BProps = getattr(c, "SpiceBodyProps", {})


def _normalize(x):
    return np.copy(x) / norm(x)


class EPPRFrame(CR3BPFrame):

    def __init__(self, P1name, P1mu, P2name, P2mu, Lstar, JD0, JDF,
                 N=3000, SpiceFrame="J2000", P1Data=None, P2Data=None):
        CR3BPFrame.__init__(self, P1mu, P2mu, Lstar)
        self.P1name, self.P2name = P1name, P2name
        self.JD0, self.JDF = JD0, JDF
        self.SpiceFrame = SpiceFrame
        if P1Data is None or P2Data is None:
            from ..SpiceRead import GetEphemTraj2
            P1Data = GetEphemTraj2(P1name, JD0, JDF, N, self.lstar,
                                   self.tstar, Frame=SpiceFrame)
            P2Data = GetEphemTraj2(P2name, JD0, JDF, N, self.lstar,
                                   self.tstar, Frame=SpiceFrame)
        self.P1Data = [np.asarray(r, np.float64) for r in P1Data]
        self.P2Data = [np.asarray(r, np.float64) for r in P2Data]
        self.AltBodyGTables = {}
        self.AltBodyLocFuncs = {}
        self.AltBodyMuVals = {}
        self.AltBodyNames = []
        self.CalcFrameData()
        self.P1_J2 = False
        self.P2_J2 = False

    @classmethod
    def TwoBodyAnalytic(cls, P1name, P1mu, P2name, P2mu, Lstar, JD0, JDF,
                        ecc=0.0, N=3000):
        """Analytic Keplerian P1/P2 ephemeris about their barycenter with
        eccentricity `ecc` — a self-contained EPPR frame (no kernels)."""
        mustar = P1mu + P2mu
        tstar = np.sqrt(Lstar ** 3 / mustar)
        tf = (JDF - JD0) * 24 * 3600 / tstar
        ts = np.linspace(0.0, tf, int(N) + 1)
        mu = P2mu / mustar
        from ..kepler import classic_to_cartesian, propagate_kepler
        # relative orbit of P2 about P1, a = 1 (canonical)
        X0 = classic_to_cartesian(np.array([1.0, ecc, 0, 0, 0, 0]), 1.0)
        XV = np.asarray(propagate_kepler(
            np.tile(np.asarray(X0, np.float64)[:6], (len(ts), 1)), ts, 1.0))
        P1D = [np.concatenate([-mu * XV[i, :6], [ts[i]]])
               for i in range(len(ts))]
        P2D = [np.concatenate([(1 - mu) * XV[i, :6], [ts[i]]])
               for i in range(len(ts))]
        return cls(P1name, P1mu, P2name, P2mu, Lstar, JD0, JDF,
                   P1Data=P1D, P2Data=P2D)

    # ------------------------------------------------------------- times
    def JD_to_NDTime(self, JD):
        return (JD - self.JD0) * 24.0 * 3600.0 / self.tstar

    def NDTime_to_JD(self, ND):
        return self.JD0 + ND * self.tstar / (24.0 * 3600.0)

    # --------------------------------------------------------- frame data
    def CalcFrameData(self):
        P1D, P2D = self.P1Data, self.P2Data
        BCData = []
        for T1, T2 in zip(P1D, P2D):
            B = np.copy(T1)
            B[0:6] = (self.P1mu * T1[0:6] + self.P2mu * T2[0:6]) \
                / (self.P1mu + self.P2mu)
            BCData.append(B)
        self.BCData = BCData
        BCDot = FiniteDiffTable(6, BCData).all_derivs(1, 4)

        RelData = []
        for T1, T2 in zip(P1D, P2D):
            R = np.copy(T2)
            R[0:6] = T2[0:6] - T1[0:6]
            RelData.append(R)
        self.RelData = RelData

        Rdata = [[norm(T[0:3]), T[6]] for T in RelData]
        Rdiff = FiniteDiffTable(1, Rdata)
        self.RData = []
        for i, (R, t) in enumerate(Rdata):
            Rdot = Rdiff.deriv(i, 1, 4)[0]
            Rddot = Rdiff.deriv(i, 2, 4)[0]
            self.RData.append([R, Rdot, Rddot, t])

        RotData = []
        for T in RelData:
            r, v = T[0:3], T[3:6]
            xhat = _normalize(r)
            zhat = _normalize(np.cross(r, v))
            yhat = _normalize(np.cross(zhat, xhat))
            RotData.append(list(xhat) + list(yhat) + list(zhat) + [T[6]])
        self.RotData = RotData
        D1Rot = FiniteDiffTable(9, RotData).all_derivs(1, 4)

        WData, BCaccData = [], []
        GscaleData, VscaleData, RscaleData, AccscaleData = [], [], [], []
        for i, rot in enumerate(RotData):
            drot = D1Rot[i]
            t = rot[9]
            R, Rdot, Rddot, _ = self.RData[i]
            DCM = np.array([rot[0:3], rot[3:6], rot[6:9]]).T
            dDCM = np.array([drot[0:3], drot[3:6], drot[6:9]]).T
            Omat = dDCM @ DCM.T
            w = np.array([Omat[2, 1], Omat[0, 2], Omat[1, 0]])
            WData.append(np.concatenate([DCM.T @ w, [t]]))
            BCaccData.append(np.concatenate(
                [-(DCM.T @ (BCDot[i][3:6] / R)), [t]]))
            GscaleData.append([R ** (-3), t])
            AccscaleData.append([1 / R, t])
            VscaleData.append([-2.0 * Rdot / R, t])
            RscaleData.append([-Rddot / R, t])
        # all_derivs also differentiates the time column; restore t
        WdotData = [np.concatenate([d[0:3], [WData[i][3]]])
                    for i, d in enumerate(
                        FiniteDiffTable(3, WData).all_derivs(1, 4))]

        T = LGLInterpTable
        self.P1Table = T(6, P1D, len(P1D))
        self.P2Table = T(6, P2D, len(P2D))
        self.BCTable = T(6, BCData, len(BCData))
        self.RotTable = T(9, RotData, len(RotData))
        self.RTable = T(3, self.RData, len(self.RData))
        self.WTable = T(3, WData, len(WData))
        self.WdotTable = T(3, WdotData, len(WdotData))
        self.BCaccTable = T(3, BCaccData, len(BCaccData))
        self.GscaleTable = T(1, GscaleData, len(GscaleData))
        self.VscaleTable = T(1, VscaleData, len(VscaleData))
        self.RscaleTable = T(1, RscaleData, len(RscaleData))
        self.AccscaleTable = T(1, AccscaleData, len(AccscaleData))

        F = InterpFunction
        self.RotFunc = F(self.RotTable, range(0, 9))
        self.BCFunc = F(self.BCTable, range(0, 6))
        self.RFunc = F(self.RTable, range(0, 3))
        self.WFunc = F(self.WTable, range(0, 3))
        self.WdotFunc = F(self.WdotTable, range(0, 3))
        self.BCaccFunc = F(self.BCaccTable, range(0, 3))
        self.GscaleFunc = F(self.GscaleTable, range(0, 1)).sf()
        self.VscaleFunc = F(self.VscaleTable, range(0, 1)).sf()
        self.RscaleFunc = F(self.RscaleTable, range(0, 1)).sf()
        self.AccscaleFunc = F(self.AccscaleTable, range(0, 1)).sf()

    # -------------------------------------------------------- transforms
    def M_S(self, tnd):
        return 1.0 / (self.RTable.Interpolate(tnd)[0] * self.vstar)

    def GetDCM(self, t):
        rot = self.RotTable.Interpolate(t)
        return np.array([_normalize(rot[0:3]), _normalize(rot[3:6]),
                         _normalize(rot[6:9])]).T

    def NDInertial_to_Frame_Func(self):
        args = Args(16)
        X = args.head(3)
        V = args.segment3(3)
        t = args[6]
        Xbc = args.segment3(7)
        Vbc = args.segment3(10)
        r = args[13]
        rdot = args[14]
        DCMT = vf.RowMatrix(self.RotFunc.eval(t), 3, 3)
        W = self.WFunc.eval(t)
        Xnd = (X - Xbc) / r
        Vnd = (V - Vbc) / r
        Xrot = DCMT * Xnd
        Vrot = DCMT * Vnd + vf.cross(Xrot, W) - Xrot * (rdot / r)
        state = vf.stack([Xrot, Vrot, t])
        realargs = Args(7)
        t2 = realargs[6]
        dataargs = vf.stack([realargs, self.BCFunc.eval(t2),
                             self.RFunc.eval(t2)])
        return state.eval(dataargs)

    def Frame_to_NDInertial_Func(self):
        args = Args(16)
        Xrot = args.head(3)
        Vrot = args.segment3(3)
        t = args[6]
        Xbc = args.segment3(7)
        Vbc = args.segment3(10)
        r = args[13]
        rdot = args[14]
        DCM = vf.ColMatrix(self.RotFunc.eval(t), 3, 3)
        W = self.WFunc.eval(t)
        Xnd = (DCM * Xrot) * r + Xbc
        Vnd = (DCM * (Vrot - vf.cross(Xrot, W) + Xrot * (rdot / r))) * r + Vbc
        state = vf.stack([Xnd, Vnd, t])
        realargs = Args(7)
        t2 = realargs[6]
        dataargs = vf.stack([realargs, self.BCFunc.eval(t2),
                             self.RFunc.eval(t2)])
        return state.eval(dataargs)

    def NDInertial_to_EPPR(self, ITraj, axis=6):
        F = self.NDInertial_to_Frame_Func()
        return [np.asarray(F.compute(np.asarray(T)[0:7])) for T in ITraj]

    def EPPR_to_NDInertial(self, PTraj, axis=6):
        F = self.Frame_to_NDInertial_Func()
        return [np.asarray(F.compute(np.asarray(T)[0:7])) for T in PTraj]

    def Transform_Func(self, OtherFrame):
        FrameToND1 = self.Frame_to_NDInertial_Func()
        ND2ToFrame = OtherFrame.NDInertial_to_Frame_Func()
        xscale = self.lstar / OtherFrame.lstar
        vscale = self.vstar / OtherFrame.vstar
        toff = OtherFrame.JD_to_NDTime(self.NDTime_to_JD(0.0))
        tsc = self.tstar / OtherFrame.tstar
        args = Args(7)
        ND1toND2 = vf.stack([args.head3() * xscale,
                             args.segment3(3) * vscale,
                             args[6] * tsc + toff])
        return (ND2ToFrame.eval(ND1toND2)).eval(FrameToND1)

    # ------------------------------------------------------------- bodies
    def AddBodyTable(self, Name, EPPRTraj, mu):
        GTraj = [np.array([r[0], r[1], r[2], r[-1]]) for r in EPPRTraj]
        self.AltBodyGTables[Name] = LGLInterpTable(3, GTraj, len(GTraj))
        self.AltBodyLocFuncs[Name] = InterpFunction(
            self.AltBodyGTables[Name], range(0, 3))
        self.AltBodyMuVals[Name] = mu / self.mustar
        self.AltBodyNames.append(Name)

    def GetSpiceBodyEPPRTraj(self, Name, N):
        from ..SpiceRead import GetEphemTraj2
        ITraj = GetEphemTraj2(Name, self.JD0, self.JDF, N, self.lstar,
                              self.tstar, Frame=self.SpiceFrame)
        return self.NDInertial_to_EPPR(ITraj)

    GetSpiceBodyTraj = GetSpiceBodyEPPRTraj

    def GetSpiceBodyTable(self, Name, N):
        return LGLInterpTable(6, self.GetSpiceBodyEPPRTraj(Name, N), N + 1)

    def AddSpiceBody(self, Name, mu=None, N=5000):
        if mu is None:
            mu = BProps[Name]["Mu"]
        self.AddBodyTable(Name, self.GetSpiceBodyEPPRTraj(Name, N), mu)

    def AddSpiceBodies(self, Names, N=5000):
        for Name in Names:
            self.AddSpiceBody(Name, N=N)

    def Add_P2_J2Effect(self, J2c=None, RadP2=None, pole=(0, 0, 1.0)):
        if J2c is None:
            J2c = BProps[self.P2name]["J2"]
        if RadP2 is None:
            RadP2 = BProps[self.P2name]["Radius"]
        self.P2_Rad = RadP2 / self.lstar
        self.P2_J2 = J2c
        self._p2_pole = np.asarray(pole, np.float64)

    def Add_P1_J2Effect(self, J2c=None, RadP1=None, pole=(0, 0, 1.0)):
        if J2c is None:
            J2c = BProps[self.P1name]["J2"]
        if RadP1 is None:
            RadP1 = BProps[self.P1name]["Radius"]
        self.P1_Rad = RadP1 / self.lstar
        self.P1_J2 = J2c
        self._p1_pole = np.asarray(pole, np.float64)

    # --------------------------------------------------------------- EOMs
    def EPPREOMs(self, r, v, t, otherGaccs=[], otherAccs=[], otherEOMs=[],
                 ActiveAltBodies="All", Enable_J2=False):
        """Pulsating-rotating EOMs (reference EPPREOMs): two-body gravity of
        P1/P2 at their frozen frame locations + alt-body gravity, all scaled
        by 1/r(t)^3, plus Coriolis/centrifugal (W), Euler (Wdot),
        barycenter-acceleration, and pulsation corrections."""
        Gscale = self.GscaleFunc.eval(t)
        Rscale = self.RscaleFunc.eval(t)
        Vscale = self.VscaleFunc.eval(t)
        BCacc = self.BCaccFunc.eval(t)
        W = self.WFunc.eval(t)
        Wdot = self.WdotFunc.eval(t)

        g1 = r.normalized_power3(-self.P1, self.mu - 1.0)
        g2 = r.normalized_power3(-self.P2, -self.mu)
        GravTerms = [g1, g2] + list(otherGaccs)
        Names = self.AltBodyNames if ActiveAltBodies == "All" \
            else ActiveAltBodies
        for Name in Names:
            rBody = self.AltBodyLocFuncs[Name].eval(t)
            muB = self.AltBodyMuVals[Name]
            GravTerms.append((rBody - r).normalized_power3() * muB)
        Grav = vf.sum(GravTerms) * Gscale

        accs = list(otherAccs)
        if Enable_J2:
            accs += self.J2_ACC(r, t)
        wtemp = vf.sum([(-2.0) * v, Vscale * r, vf.cross(r, W)])
        Wacc = vf.cross(W, wtemp)
        Wdotacc = vf.cross(r, Wdot)
        Pulse1 = r * Rscale
        Pulse2 = v * Vscale
        acc = vf.sum([Grav, Wacc, Wdotacc, BCacc, Pulse1, Pulse2] + accs)
        return vf.stack([v, acc] + list(otherEOMs))

    def J2_ACC(self, r, t):
        from ..J2 import J2Cartesian
        J2Accs = []
        j2sc = self.AccscaleFunc.eval(t) ** 5
        if self.P2_J2:
            j2f = J2Cartesian(self.mu, self.P2_J2, self.P2_Rad)
            J2Accs.append(j2f(vf.stack([r - self.P2,
                                        r * 0.0 + self._p2_pole])))
        if self.P1_J2:
            j2f = J2Cartesian(1 - self.mu, self.P1_J2, self.P1_Rad)
            J2Accs.append(j2f(vf.stack([r - self.P1,
                                        r * 0.0 + self._p1_pole])))
        if J2Accs:
            return [vf.sum(J2Accs) * j2sc]
        return []
