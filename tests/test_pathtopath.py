"""PathToPath link constraints: per-node link applications between two
phases' Path regions, routed through the block KKT border (reference
LinkFlags::PathToPath, `OptimalControlProblem.cpp:675`)."""

import numpy as np

import asset_asrl_tpu as ast

vf = ast.VectorFunctions
oc = ast.OptimalControl
Args = vf.Arguments


class _DI(oc.ODEBase):
    def __init__(self):
        XtU = oc.ODEArguments(2, 1)
        super().__init__(vf.stack([XtU.XVar(1), XtU.UVar(0)]), 2, 1)


def _phase(x0, xf, nsegs=8):
    ts = np.linspace(0, 2, 20)
    IG = [[x0 + (xf - x0) * t / 2, (xf - x0) / 2, t, 0.0] for t in ts]
    ph = _DI().phase("LGL3", IG, nsegs)
    ph.addBoundaryValue("Front", [0, 1, 2], [x0, 0, 0])
    ph.addBoundaryValue("Back", [0, 1, 2], [xf, 0, 2])
    ph.addIntegralObjective(Args(1)[0] ** 2, [3])
    return ph


def test_pathtopath_direct_link():
    """Formation flying: phase B must shadow phase A at a fixed offset at
    EVERY collocation node (a PathToPath direct link)."""
    pa = _phase(0.0, 1.0)
    pb = _phase(0.2, 1.2)
    ocp = oc.OptimalControlProblem()
    ocp.addPhase(pa)
    ocp.addPhase(pb)
    # xB(t_j) - xA(t_j) = 0.2 for every node j
    A = Args(2)
    ocp.addDirectLinkEqualCon(A[0] - A[1] + 0.2, pa, "Path", [0],
                              pb, "Path", [0])
    ocp.optimizer.set_PrintLevel(2)
    flag = ocp.optimize()
    assert flag == 0, flag
    ta = np.asarray(pa.returnTraj())
    tb = np.asarray(pb.returnTraj())
    assert np.allclose(tb[:, 0] - ta[:, 0], 0.2, atol=1e-6)


def test_path_link_objective():
    """Path-region link objective: integral-like sum over node pairs.

    The phases are DIFFERENT (offset boundary conditions) so the link term
    is nonzero, and the routing is asserted directly: the link must add an
    objective family, not equality rows (a misrouted objective would both
    change numEq and force the gap to zero)."""
    def build(with_link):
        pa = _phase(0.0, 1.0)
        pb = _phase(0.2, 1.2, nsegs=8)
        ocp = oc.OptimalControlProblem()
        ocp.addPhase(pa)
        ocp.addPhase(pb)
        if with_link:
            A = Args(8)   # [xA, vA, tA, uA, xB, vB, tB, uB]
            ocp.addLinkObjective(((A[0] - A[4]) ** 2) * 10.0,
                                 [(pa, "Path"), (pb, "Path")])
        ocp.optimizer.set_PrintLevel(2)
        return ocp, pa, pb

    base, _, _ = build(False)
    base.transcribe()
    ocp, pa, pb = build(True)
    ocp.transcribe()
    # routing: objective family added, NO equality/inequality rows added
    assert ocp._nlp.numEq == base._nlp.numEq
    assert ocp._nlp.numIq == base._nlp.numIq
    assert len(ocp._nlp.objectives) == len(base._nlp.objectives) + 1
    flag = ocp.optimize()
    assert flag == 0, flag
    ta = np.asarray(pa.returnTraj())
    tb = np.asarray(pb.returnTraj())
    gap = tb[:, 0] - ta[:, 0]
    # soft objective: interior gap pulled well below the 0.2 boundary
    # offset, but NOT forced to zero (a hard equality would conflict with
    # the pinned boundary values and could not converge to this state)
    assert gap.min() < 0.1
    assert abs(gap[0] - 0.2) < 1e-6 and abs(gap[-1] - 0.2) < 1e-6


def test_path_link_with_staticparam_region():
    """Mixed Path + StaticParams link: the params region must gather the
    raw param value (not decode through the node layout)."""
    pa = _phase(0.0, 1.0, nsegs=4)
    pb = _phase(0.0, 1.0, nsegs=4)
    pb.setStaticParams([0.25])
    ocp = oc.OptimalControlProblem()
    ocp.addPhase(pa)
    ocp.addPhase(pb)
    A = Args(2)
    # sp_b - xA(t_j) at every node
    ocp.addLinkEqualCon(A[0] - A[1],
                        [(pb, "StaticParams", [], [], [0]),
                         (pa, "Path", [0], [], [])])
    ocp.transcribe()
    x0 = ocp._make_input()
    _, cE, _ = ocp._nlp.eval_obj_cons(np.asarray(x0))
    cE = np.asarray(cE)
    n = pa.numNodes
    got = cE[-n:]
    xa = np.asarray(pa.returnTraj())[:, 0]
    want = 0.25 - xa
    assert np.allclose(got, want, atol=1e-12), (got[:5], want[:5])
