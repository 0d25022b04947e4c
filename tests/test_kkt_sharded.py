"""Segment-axis sharded KKT: substructured factor/solve must match the
dense solve and the single-chip BCR bitwise-or-tolerance on the 8-device
virtual CPU mesh (the NLPTest determinism analog, SURVEY.md section 4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from asset_asrl_tpu.Solvers.kkt_block import bcr_factor, bcr_solve
from asset_asrl_tpu.Solvers.kkt_sharded import (pad_chain, sharded_factor,
                                                sharded_solve)
from tests.test_kkt_block import make_block_tridiag

# All library calls below are jitted: eager op-by-op dispatch routes
# through jaxlib's shipped AOT CPU kernels, which mis-execute on
# hosts whose CPU features differ from the wheel build (observed heap
# corruption aborts); jitted programs compile fresh for this host.


def _mesh(d=8):
    devs = jax.devices()
    if len(devs) < d:
        pytest.skip("needs the 8-device virtual CPU mesh")
    return Mesh(np.array(devs[:d]), ("seg",))


@pytest.mark.parametrize("K,W,b", [
    (16, 3, 2),
    pytest.param(33, 4, 3, marks=pytest.mark.slow),
    pytest.param(40, 5, 0, marks=pytest.mark.slow),
    pytest.param(129, 4, 2, marks=pytest.mark.slow)])
def test_sharded_solve_matches_dense(K, W, b):
    mesh = _mesh()
    diag, lower, B, C, A = make_block_tridiag(K, W, b, seed=K + W, spd=True)
    dg, lo, Bp, Cp, L = pad_chain(jnp.asarray(diag), jnp.asarray(lower),
                                  jnp.asarray(B), jnp.asarray(C), 8)
    fac, neigs = jax.jit(lambda *a: sharded_factor(*a, mesh))(dg, lo, Bp, Cp)
    rng = np.random.default_rng(1)
    r = rng.normal(size=(K, W))
    rb = rng.normal(size=(b,))
    rp = jnp.asarray(np.concatenate(
        [r, np.zeros((8 * L - K, W))], axis=0))
    y, z = jax.jit(lambda *a: sharded_solve(*a, mesh))(fac, rp, jnp.asarray(rb))
    sol = np.linalg.solve(A, np.concatenate([r.ravel(), rb]))
    got = np.concatenate([np.asarray(y)[:K].ravel(), np.asarray(z)])
    assert np.allclose(got, sol, atol=1e-8), np.abs(got - sol).max()


@pytest.mark.parametrize("K,W,b", [
    pytest.param(24, 3, 2, marks=pytest.mark.slow),
    pytest.param(65, 4, 3, marks=pytest.mark.slow)])
def test_sharded_inertia_matches_dense(K, W, b):
    mesh = _mesh()
    for seed in range(3):
        diag, lower, B, C, A = make_block_tridiag(K, W, b, seed=seed,
                                                  spd=False)
        dg, lo, Bp, Cp, L = pad_chain(jnp.asarray(diag), jnp.asarray(lower),
                                      jnp.asarray(B), jnp.asarray(C), 8)
        fac, neigs = jax.jit(lambda *a: sharded_factor(*a, mesh))(dg, lo, Bp, Cp)
        w = np.linalg.eigvalsh(A)
        # padded identity blocks contribute only positive pivots
        assert int(neigs) == int(np.sum(w < 0)), seed


@pytest.mark.slow
def test_sharded_matches_single_chip():
    """1-device BCR and 8-device substructuring agree to fp tolerance —
    the sharding determinism test (reference NLPTest thread-count
    equivalence, `NonLinearProgram.h:481`)."""
    mesh = _mesh()
    K, W, b = 50, 4, 2
    diag, lower, B, C, A = make_block_tridiag(K, W, b, seed=3, spd=True)
    fac1, n1 = jax.jit(bcr_factor)(jnp.asarray(diag), jnp.asarray(lower),
                                   jnp.asarray(B), jnp.asarray(C))
    rng = np.random.default_rng(2)
    r = rng.normal(size=(K, W))
    rb = rng.normal(size=(b,))
    y1, z1 = jax.jit(bcr_solve)(fac1, jnp.asarray(r), jnp.asarray(rb))

    dg, lo, Bp, Cp, L = pad_chain(jnp.asarray(diag), jnp.asarray(lower),
                                  jnp.asarray(B), jnp.asarray(C), 8)
    fac8, n8 = jax.jit(lambda *a: sharded_factor(*a, mesh))(dg, lo, Bp, Cp)
    rp = jnp.asarray(np.concatenate([r, np.zeros((8 * L - K, W))]))
    y8, z8 = jax.jit(lambda *a: sharded_solve(*a, mesh))(fac8, rp, jnp.asarray(rb))
    assert int(n1) == int(n8)
    assert np.allclose(np.asarray(y8)[:K], np.asarray(y1), atol=1e-9)
    assert np.allclose(np.asarray(z8), np.asarray(z1), atol=1e-9)


@pytest.mark.parametrize("K,W,b,hc", [
    pytest.param(40, 4, 2, (2, 4), marks=pytest.mark.slow),
    pytest.param(25, 3, 0, (4, 2), marks=pytest.mark.slow)])
def test_hier_sharded_matches_dense(K, W, b, hc):
    """Two-level (host x chip) hierarchical substructuring: per-chip
    elimination, per-host ICI reduction, DCN host-boundary exchange —
    must reproduce the dense solve and the exact inertia (the multi-host
    path of BASELINE.md:33, validated on a virtual 2-axis mesh)."""
    from asset_asrl_tpu.Solvers.kkt_sharded import (sharded_factor_hier,
                                                    sharded_solve_hier)
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    H, Dc = hc
    mesh = Mesh(np.array(devs[:8]).reshape(H, Dc), ("host", "chip"))
    for seed, spd in ((0, True), (5, False)):
        diag, lower, B, C, A = make_block_tridiag(K, W, b, seed=seed,
                                                  spd=spd)
        dg, lo, Bp, Cp, L = pad_chain(jnp.asarray(diag), jnp.asarray(lower),
                                      jnp.asarray(B), jnp.asarray(C), 8)
        fac, neigs = jax.jit(lambda *a: sharded_factor_hier(*a, mesh))(dg, lo, Bp, Cp)
        w = np.linalg.eigvalsh(A)
        assert int(neigs) == int(np.sum(w < 0)), (seed, spd)
        if not spd:
            continue
        rng = np.random.default_rng(seed + 1)
        r = rng.normal(size=(K, W))
        rb = rng.normal(size=(b,))
        rp = jnp.asarray(np.concatenate([r, np.zeros((8 * L - K, W))]))
        y, z = jax.jit(lambda *a: sharded_solve_hier(*a, mesh))(fac, rp, jnp.asarray(rb))
        sol = np.linalg.solve(A, np.concatenate([r.ravel(), rb]))
        got = np.concatenate([np.asarray(y)[:K].ravel(), np.asarray(z)])
        assert np.allclose(got, sol, atol=1e-8), np.abs(got - sol).max()


@pytest.mark.slow
def test_phase_sharded_backend_user_api():
    """User-facing entry: phase.setKKTBackend('sharded') routes the whole
    optimize() through the segment-axis distributed KKT and reproduces
    the single-device solution; re-running setTraj re-shards (SURVEY
    section 5.8)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ge2", __file__.replace("tests/test_kkt_sharded.py",
                                "__graft_entry__.py"))
    ge = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ge)
    mesh = _mesh()

    phase1 = ge._small_phase(16)
    phase1.optimizer.set_PrintLevel(2)
    phase1.transcribe()
    x1 = phase1.optimizer.optimize(np.asarray(phase1.makeSolverInput()))
    f1 = phase1.optimizer.ConvergeFlag

    phase2 = ge._small_phase(16)
    phase2.setKKTBackend("sharded", mesh=mesh)
    phase2.optimizer.set_PrintLevel(2)
    phase2.transcribe()
    from asset_asrl_tpu.Solvers.kkt_sharded import ShardedBlockKKT
    assert isinstance(phase2.optimizer.kkt, ShardedBlockKKT)
    x2 = phase2.optimizer.optimize(np.asarray(phase2.makeSolverInput()))
    f2 = phase2.optimizer.ConvergeFlag
    assert f1 == f2 == 0
    assert np.max(np.abs(x1 - x2)) / max(1.0, np.abs(x1).max()) < 1e-6

    # re-shard on re-mesh: new segment count -> fresh sharded backend
    phase2.refineTrajManual(20)
    phase2.transcribe()
    assert isinstance(phase2.optimizer.kkt, ShardedBlockKKT)
    assert phase2.optimizer.kkt.bs.K != phase1.optimizer.kkt.bs.K


@pytest.mark.slow
def test_sharded_full_solve_matches_single():
    """FULL fused PSIOPT solve with the segment-axis ShardedBlockKKT over
    the 8-device mesh reproduces the single-device solve (BASELINE.md:33
    one-problem distribution; the NLPTest determinism analog)."""
    import jax.numpy as jnp
    from asset_asrl_tpu.Solvers.fused import build_fused_alg
    from asset_asrl_tpu.Solvers.kkt_sharded import ShardedBlockKKT
    import sys
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ge", __file__.replace("tests/test_kkt_sharded.py",
                               "__graft_entry__.py"))
    ge = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ge)

    mesh = _mesh()
    phase = ge._small_phase(16)
    phase.transcribe()
    opt = phase.optimizer
    kkt = opt.kkt
    x, s, lamE, lamI = opt._init_state(phase.makeSolverInput(), opt.initMu)
    mu0 = jnp.asarray(opt.initMu)
    consts = opt.nlp.consts_dev()
    out1 = build_fused_alg(kkt, opt._opts_snapshot(), "OPT")(
        x, s, lamE, lamI, mu0, consts)
    outD = build_fused_alg(ShardedBlockKKT(kkt, mesh),
                           opt._opts_snapshot(), "OPT")(
        x, s, lamE, lamI, mu0, consts)
    assert int(out1[5]) == 0 and int(outD[5]) == 0
    x1, xD = np.asarray(out1[0]), np.asarray(outD[0])
    assert np.max(np.abs(x1 - xD)) / max(1.0, np.abs(x1).max()) < 1e-6


@pytest.mark.slow
def test_ocp_sharded_backend_user_api():
    """Multi-phase OCP through setKKTBackend('sharded'): the concatenated
    phase chain distributes over the mesh and reproduces the unsharded
    solve."""
    import importlib.util
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    mesh = _mesh()
    import asset_asrl_tpu as ast
    vf2 = ast.VectorFunctions
    oc2 = ast.OptimalControl
    A = vf2.Arguments

    class DI(oc2.ODEBase):
        def __init__(self):
            XtU = oc2.ODEArguments(2, 1)
            super().__init__(vf2.stack([XtU.XVar(1), XtU.UVar(0)]), 2, 1)

    def build():
        phases = []
        for k in range(2):
            ts = np.linspace(k, k + 1, 12)
            IG = [[0.5 * t, 0.5, t, 0.0] for t in ts]
            p = DI().phase("LGL3", IG, 10)
            p.addIntegralObjective(A(1)[0] ** 2, [3])
            phases.append(p)
        phases[0].addBoundaryValue("Front", [0, 1, 2], [0, 0, 0])
        phases[1].addBoundaryValue("Back", [0, 1, 2], [1, 0, 2])
        o = oc2.OptimalControlProblem()
        o.addPhase(phases[0])
        o.addPhase(phases[1])
        o.addForwardLinkEqualCon(phases[0], phases[1], [0, 1, 2])
        o.optimizer.set_PrintLevel(2)
        return o

    o1 = build()
    f1 = o1.optimize()
    x1 = np.concatenate([np.asarray(p.returnTraj()).ravel()
                         for p in o1.Phases])

    o2 = build()
    o2.setKKTBackend("sharded", mesh=mesh)
    o2.transcribe()
    from asset_asrl_tpu.Solvers.kkt_sharded import ShardedBlockKKT
    assert isinstance(o2.optimizer.kkt, ShardedBlockKKT)
    f2 = o2.optimize()
    x2 = np.concatenate([np.asarray(p.returnTraj()).ravel()
                         for p in o2.Phases])
    assert f1 == f2 == 0
    assert np.max(np.abs(x1 - x2)) < 1e-6
