"""Differentiable ephemeris kinematics.

The reference derives rotating-frame data (rotation matrices, angular
velocity and its rate, barycenter acceleration, pulsation scales) by
finite-difference tables over sampled ephemerides
(`asset_asrl/Astro/Extensions/EPPRFrame.py` CalcFrameData).  Here the
ephemeris is a SMOOTH jnp function of time — Hermite interpolation with
the tabulated velocities as exact position tangents — and every derived
quantity is a jax derivative of it: W from the rotation matrix's AD
time-derivative, Wdot/Rddot/BCacc from one more `jax.jacfwd`.  One
vmapped sweep samples the results back onto tables.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class DifferentiableEphemeris:
    """Smooth state(t) from ephemeris rows [r(3), v(3), t].

    Positions interpolate with the tabulated velocities as exact Hermite
    tangents; velocities interpolate with centered-difference
    acceleration tangents — so state() is C1 and jax can differentiate
    it (twice, piecewise) for frame kinematics."""

    def __init__(self, rows):
        rows = np.asarray([np.asarray(r, np.float64).ravel() for r in rows])
        order = np.argsort(rows[:, 6])
        rows = rows[order]
        self.ts = rows[:, 6].copy()
        self.pos = rows[:, 0:3].copy()
        self.vel = rows[:, 3:6].copy()
        t, v = self.ts, self.vel
        acc = np.zeros_like(v)
        if len(t) > 2:
            acc[1:-1] = (v[2:] - v[:-2]) / (t[2:] - t[:-2])[:, None]
            acc[0] = (v[1] - v[0]) / (t[1] - t[0])
            acc[-1] = (v[-1] - v[-2]) / (t[-1] - t[-2])
        self.acc = acc

    def _hermite(self, t, vals, tans):
        ts = jnp.asarray(self.ts)
        t = jnp.clip(t, ts[0], ts[-1])
        k = jnp.clip(jnp.searchsorted(ts, t, side="right") - 1, 0,
                     len(self.ts) - 2)
        t0, t1 = ts[k], ts[k + 1]
        h = t1 - t0
        s = (t - t0) / h
        v0, v1 = jnp.asarray(vals)[k], jnp.asarray(vals)[k + 1]
        m0, m1 = jnp.asarray(tans)[k] * h, jnp.asarray(tans)[k + 1] * h
        s2, s3 = s * s, s * s * s
        return ((2 * s3 - 3 * s2 + 1) * v0 + (s3 - 2 * s2 + s) * m0
                + (-2 * s3 + 3 * s2) * v1 + (s3 - s2) * m1)

    def r(self, t):
        return self._hermite(t, self.pos, self.vel)

    def v(self, t):
        return self._hermite(t, self.vel, self.acc)

    def state(self, t):
        return jnp.concatenate([self.r(t), self.v(t)])


def rotating_frame_samples(eph1, eph2, mfrac1, mfrac2, ts):
    """Sample every pulsating-rotating-frame quantity at times `ts` by
    automatic differentiation of the two ephemeris interpolants.

    mfrac1/mfrac2: P1/P2 mass fractions (sum 1).  Returns a dict of
    (N, ...) arrays: DCM rows (xhat|yhat|zhat), W and Wdot in FRAME
    coordinates, R/Rdot/Rddot, barycenter state and the frame-correction
    acceleration -DCM^T vbc_dot / R, and the EOM scale factors."""
    def relstate(t):
        return eph2.state(t) - eph1.state(t)

    def axes(t):
        s = relstate(t)
        r, v = s[:3], s[3:]
        xh = r / jnp.linalg.norm(r)
        h = jnp.cross(r, v)
        zh = h / jnp.linalg.norm(h)
        yh = jnp.cross(zh, xh)
        return jnp.stack([xh, yh, zh], axis=1)      # columns = axes

    def w_inertial(t):
        DCM = axes(t)
        dDCM = jax.jacfwd(axes)(t)
        Om = dDCM @ DCM.T
        return jnp.stack([Om[2, 1], Om[0, 2], Om[1, 0]])

    def w_frame(t):
        return axes(t).T @ w_inertial(t)

    def sep(t):
        s = relstate(t)
        return jnp.linalg.norm(s[:3])

    def sepdot(t):
        s = relstate(t)
        return s[:3] @ s[3:] / jnp.linalg.norm(s[:3])

    def vbc(t):
        return mfrac1 * eph1.v(t) + mfrac2 * eph2.v(t)

    def bc_frame_acc(t):
        # frame-correction acceleration: -DCM^T a_bc / R
        abc = jax.jacfwd(vbc)(t)
        return -(axes(t).T @ abc) / sep(t)

    ts = jnp.asarray(np.asarray(ts, np.float64))
    DCM = jax.vmap(axes)(ts)
    W = jax.vmap(w_frame)(ts)
    Wdot = jax.vmap(jax.jacfwd(w_frame))(ts)
    R = jax.vmap(sep)(ts)
    Rdot = jax.vmap(sepdot)(ts)
    Rddot = jax.vmap(jax.jacfwd(sepdot))(ts)
    BCacc = jax.vmap(bc_frame_acc)(ts)
    BC = jax.vmap(lambda t: mfrac1 * eph1.state(t)
                  + mfrac2 * eph2.state(t))(ts)
    return dict(
        ts=np.asarray(ts),
        # rows of the table are [xhat | yhat | zhat] (DCM columns)
        rot=np.asarray(DCM).transpose(0, 2, 1).reshape(len(ts), 9),
        W=np.asarray(W), Wdot=np.asarray(Wdot),
        R=np.asarray(R), Rdot=np.asarray(Rdot), Rddot=np.asarray(Rddot),
        BC=np.asarray(BC), BCacc=np.asarray(BCacc),
        Gscale=np.asarray(R) ** (-3.0),
        Accscale=1.0 / np.asarray(R),
        Vscale=-2.0 * np.asarray(Rdot) / np.asarray(R),
        Rscale=-np.asarray(Rddot) / np.asarray(R),
    )


def center_acceleration_samples(eph, ts):
    """-a_P1(t) at `ts` by AD of the velocity interpolant (the inertial
    frame-correction of a P1-centered frame)."""
    acc = jax.vmap(jax.jacfwd(eph.v))(jnp.asarray(np.asarray(ts)))
    return -np.asarray(acc)


class BodyRegistry:
    """Third-body catalog shared by the ephemeris frames: position interp
    tables + nondimensional mu per registered body."""

    def _init_body_registry(self):
        self.AltBodyGTables = {}
        self.AltBodyLocFuncs = {}
        self.AltBodyMuVals = {}
        self.AltBodyNames = []

    def register_body(self, name, rows, mu_nd):
        from ...OptimalControl.interp_table import (LGLInterpTable,
                                                    InterpFunction)
        pos_rows = [np.array([q[0], q[1], q[2], q[-1]]) for q in rows]
        tab = LGLInterpTable(3, pos_rows, len(pos_rows))
        self.AltBodyGTables[name] = tab
        self.AltBodyLocFuncs[name] = InterpFunction(tab, range(3))
        self.AltBodyMuVals[name] = mu_nd
        self.AltBodyNames.append(name)
