"""Jittable in-loop event location (reference EventPack,
`src/Integrators/Integrator.h:538-690`): analytic crossings of a harmonic
oscillator, directional stopping, and the vmapped batch path."""

import numpy as np

import asset_asrl_tpu as ast

vf = ast.VectorFunctions
oc = ast.OptimalControl
Args = vf.Arguments


class HO(oc.ODEBase):
    def __init__(self):
        a = oc.ODEArguments(2, 0)
        super().__init__(vf.stack(a.XVar(1), -1.0 * a.XVar(0)), 2)


def test_event_crossings():
    integ = HO().integrator(.05)
    ev = Args(3)[0]
    traj, locs = integ.integrate_dense([0, 1, 0], 10.0, [(ev, 0, 0)])
    hits = [r[2] for r in locs[0]]
    assert len(hits) == 3
    for k, t in enumerate(hits):
        assert abs(t - (k + 1) * np.pi) < 1e-8


def test_event_stop_directional():
    integ = HO().integrator(.05)
    ev = Args(3)[0]
    # direction=-1: only falling crossings; stop at the first one (t=pi)
    traj, locs = integ.integrate_dense([0, 1, 0], 10.0, [(ev, -1, 1)])
    assert abs(traj[-1][2] - np.pi) < 1e-8
    # direction=+1: first rising crossing is t=2pi
    traj, locs = integ.integrate_dense([0, 1, 0], 10.0, [(ev, 1, 1)])
    assert abs(traj[-1][2] - 2 * np.pi) < 1e-8


def test_event_batch():
    integ = HO().integrator(.05)
    ev = Args(3)[0]
    out = integ.integrate_dense_parallel(
        [[0, 1, 0], [0, 2, 0], [0, .5, 0]], [10.0, 10.0, 10.0],
        [(ev, -1, 1)])
    for tr, lo in out:
        assert abs(tr[-1][2] - np.pi) < 1e-7
        assert len(lo[0]) == 1
