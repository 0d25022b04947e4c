"""NBody / EPPR frame tests (reference `Astro/Extensions/{NBodyFrame,
EPPRFrame}.py`): transform round trips, the CR3BP limit of the EPPR frame
at zero eccentricity, and an NBody third-body propagation sanity check."""

import numpy as np
import pytest

import asset_asrl_tpu as ast
import asset_asrl_tpu.Astro.Constants as c
from asset_asrl_tpu.Astro.Extensions import (EPPRFrame, NBodyFrame,
                                             KeplerianEphemeris)

vf = ast.VectorFunctions
Args = vf.Arguments

JD0, JDF = 2459000.5, 2459060.5


@pytest.fixture(scope="module")
def eppr():
    return EPPRFrame.TwoBodyAnalytic("EARTH", c.MuEarth, "MOON", c.MuMoon,
                                     c.LD, JD0, JDF, ecc=0.0549, N=800)


@pytest.fixture(scope="module")
def eppr0():
    return EPPRFrame.TwoBodyAnalytic("EARTH", c.MuEarth, "MOON", c.MuMoon,
                                     c.LD, JD0, JDF, ecc=0.0, N=400)


def test_eppr_roundtrip(eppr):
    T = np.array([0.8, 0.1, 0.05, 0.1, -0.2, 0.02, 3.0])
    I = eppr.EPPR_to_NDInertial([T])[0]
    T2 = eppr.NDInertial_to_EPPR([I])[0]
    assert np.max(np.abs(T - T2)) < 1e-7


def test_eppr_cr3bp_limit(eppr0):
    # circular ephemeris: rotation rate is exactly the mean motion and the
    # separation is constant -> the EPPR frame IS the CR3BP frame
    W = eppr0.WTable.Interpolate(2.0)[:3]
    R = eppr0.RTable.Interpolate(2.0)
    assert np.allclose(W, [0, 0, 1], atol=1e-5)
    assert abs(R[0] - 1) < 1e-9 and abs(R[1]) < 1e-6
    args = Args(7)
    eom = eppr0.EPPREOMs(args.head3(), args.segment3(3), args[6])
    a6 = Args(6)
    cr = eppr0.CR3BPEOMs(a6.head3(), a6.tail3())
    x = np.array([0.5, 0.1, 0.02, 0.1, 0.3, -0.05, 2.0])
    a1 = np.asarray(eom.compute(x))
    a2 = np.asarray(cr.compute(x[:6]))
    assert np.max(np.abs(a1 - a2)) < 2e-4


def test_nbody_frame():
    # Sun-centered frame with an analytic "Jupiter" third body: with the
    # third body at large distance its differential acceleration is small
    # but nonzero, and the frame transforms round-trip
    mustar = c.MuSun
    lstar = c.AU
    tstar = np.sqrt(lstar ** 3 / mustar)
    N = 400
    tf = (JDF - JD0) * 24 * 3600 / tstar
    sun_traj = [np.array([0, 0, 0, 0, 0, 0, t])
                for t in np.linspace(0, tf, N + 1)]
    frame = NBodyFrame("SUN", c.MuSun, lstar, JD0, JDF, P1Data=sun_traj)
    jup = KeplerianEphemeris(1.0, [5.2, 0.048, 0.02, 0, 0, 0.5], 0, tf, N)
    frame.AddBodyTable("JUPITER", jup, c.MuJupiter)

    T = np.array([1.0, 0.2, 0.0, -0.1, 0.9, 0.01, tf / 2])
    I = frame.Frame_to_NDInertial([T])[0]
    T2 = frame.NDInertial_to_Frame([I])[0]
    assert np.max(np.abs(T - T2)) < 1e-10

    args = Args(7)
    eom = frame.NBodyEOMs(args.head3(), args.segment3(3), args[6],
                          Enable_P1_Acc=False)
    out = np.asarray(eom.compute(T))
    # two-body part dominates; third-body tide is a small correction
    r = T[:3]
    twobody = -r / np.linalg.norm(r) ** 3
    assert np.max(np.abs(out[3:6] - twobody)) < 1e-3
    assert np.max(np.abs(out[3:6] - twobody)) > 0
