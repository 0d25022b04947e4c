#!/usr/bin/env python
"""Headline benchmark: IPM iterations/s at 10k collocation nodes.

Problem: CartPole swing-up (reference `doc/examples/CartPole.rst`) scaled to
10,001 collocation nodes (5000 LGL5 segments), solved by the REAL fused
PSIOPT loop — family AD + block assembly, the zero-probe/perturbation
factorization ladder, LOQO barrier update, block-cyclic-reduction Newton
solve with iterative refinement (TPU f64 is double-double f32 emulation;
refinement restores the digits the BCR recursion loses),
fraction-to-boundary, and the AUGLANG merit line search — i.e. the same
code path `phase.optimize()` runs, measured per IPM iteration.

Baseline: the reference C++/MKL solver does 12 IPM iterations in 28 ms at
129 nodes (i7-9750H, `doc/examples/CartPole.rst:143`) = 2.33 ms/iter.
Linearly extrapolated to 10,001 nodes (optimistic for Pardiso, whose
factorization scales superlinearly and "does not scale beyond 8 threads",
`doc/tutorials/PSIOPT.rst:269`): 181 ms/iter -> 5.53 iters/s.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def build_phase(nsegs):
    import asset_asrl_tpu as ast
    vf = ast.VectorFunctions
    oc = ast.OptimalControl
    Args = vf.Arguments

    class CartPole(oc.ODEBase):
        def __init__(self, l, m1, m2, g):
            XtU = oc.ODEArguments(4, 1)
            x, th, xd, thd = XtU.XVec().tolist()
            F = XtU.UVar(0)
            Q = vf.stack([-g * vf.sin(th),
                          F + m2 * l * vf.sin(th) * thd ** 2])
            M = vf.RowMatrix(vf.stack(vf.cos(th), l, m1 + m2,
                                      m2 * l * vf.cos(th)), 2, 2)
            super().__init__(vf.stack([xd, thd, M.inverse() * Q]), 4, 1)

    m1, m2, l, g = 1, .3, .5, 9.81
    tf, xf = 2.0, 1.0
    ts = np.linspace(0, tf, 100)
    IG = [[xf * t / tf, np.pi * t / tf, 0, 0, t, .0] for t in ts]
    ode = CartPole(l, m1, m2, g)
    phase = ode.phase("LGL5", IG, nsegs)
    phase.addBoundaryValue("First", range(0, 5), [0, 0, 0, 0, 0])
    phase.addBoundaryValue("Last", range(0, 5), [xf, np.pi, 0, 0, tf])
    phase.addLUVarBound("Path", 5, -20.0, 20.0)
    phase.addLUVarBound("Path", 0, -2.0, 2.0)
    phase.addIntegralObjective(Args(1)[0] ** 2, [5])
    return phase


def main():
    nsegs = int(os.environ.get("BENCH_NSEGS", "5000"))
    try:
        _run(nsegs)       # default: 10,001 collocation nodes
    except Exception as e:
        if os.environ.get("BENCH_NSEGS"):
            raise
        # a faulted PJRT client stays UNAVAILABLE in-process — retry at
        # half scale in a FRESH process after letting the device recover.
        # The baseline scales by the same linear per-node extrapolation,
        # so vs_baseline stays apples-to-apples.
        sys.stderr.write(f"bench: {nsegs}-seg run failed ({e!r}); "
                         f"retrying at 2500 segments in a subprocess\n")
        sys.stderr.flush()
        import subprocess
        time.sleep(90)
        env = dict(os.environ, BENCH_NSEGS="2500")
        raise SystemExit(subprocess.call(
            [sys.executable, os.path.abspath(__file__)], env=env))


def _run(nsegs):
    baseline_iters_per_s = 5.53 * (10001.0 / (2 * nsegs + 1))

    import jax
    import jax.numpy as jnp
    from asset_asrl_tpu.Solvers.fused import build_fused_alg, run_stepwise
    from asset_asrl_tpu.Solvers.psiopt import PSIOPT

    phase = build_phase(nsegs)
    phase.transcribe()
    opt = phase.optimizer
    kkt = opt.kkt
    # Above ~K=3072 macros the monolithic while_loop program faults the
    # TPU toolchain (every stage runs fine individually) — run the same
    # algorithm as one jitted iteration + host loop (fused.run_stepwise),
    # exactly what phase.optimize() auto-selects at this scale.
    stepwise = kkt.bs.K > 3072 and jax.default_backend() == "tpu"
    if stepwise:
        parts = build_fused_alg(kkt, opt._opts_snapshot(), "OPT",
                                parts=True)
        fn = lambda *a: run_stepwise(parts, *a)  # noqa: E731
    else:
        fn = build_fused_alg(kkt, opt._opts_snapshot(), "OPT")

    x, s, lamE, lamI = opt._init_state(phase.makeSolverInput(), opt.initMu)
    mu0 = jnp.asarray(opt.initMu)

    # warm-up: compile + one full solve (also yields the iteration count)
    out = fn(x, s, lamE, lamI, mu0, kkt.nlp.consts_dev())
    jax.block_until_ready(out[0])
    flag, niters = int(out[5]), int(out[6])
    if flag == 3 or niters < 3:
        # transient device fault (the axon tunnel occasionally corrupts a
        # first execution): retry once before accepting the result
        out = fn(x, s, lamE, lamI, mu0, kkt.nlp.consts_dev())
        jax.block_until_ready(out[0])
        flag, niters = int(out[5]), int(out[6])

    # timed: full solves from the cold start (real optimize() iterations:
    # probe + ladder + line search every iteration)
    reps = 3
    t0 = time.perf_counter()
    total_iters = 0
    for _ in range(reps):
        out = fn(x, s, lamE, lamI, mu0, kkt.nlp.consts_dev())
        jax.block_until_ready(out[0])
        total_iters += int(out[6])
    dt = time.perf_counter() - t0

    iters_per_s = total_iters / dt
    infos = np.asarray(out[7][:niters])
    sys.stderr.write(
        f"flag={flag} iters={niters} obj={infos[-1][0]:.6f} "
        f"kkt={infos[-1][1]:.2e} econ={infos[-1][2]:.2e}\n")
    # auxiliary metrics demanded by BASELINE.md: KKT-solve ms (one
    # factor+solve at the converged iterate, the Pardiso-analog number)
    # and time-to-converged-solution vs the reference's published full
    # solve (12 iterations x per-node-scaled 2.33 ms/iter)
    t0 = time.perf_counter()
    import jax as _jax
    fac, _ = kkt.factor(out[0], out[2], out[3], 1.0,
                        jnp.ones((kkt.nlp.numIq,)), 1e-5, 1e-10)
    _jax.block_until_ready(
        kkt.solve(fac, jnp.zeros((kkt.nlp.numPrimal,)),
                  jnp.zeros((kkt.nlp.numEq,))))
    t0 = time.perf_counter()
    fac, _ = kkt.factor(out[0], out[2], out[3], 1.0,
                        jnp.ones((kkt.nlp.numIq,)), 1e-5, 1e-10)
    _jax.block_until_ready(
        kkt.solve(fac, jnp.zeros((kkt.nlp.numPrimal,)),
                  jnp.zeros((kkt.nlp.numEq,))))
    kkt_ms = 1000 * (time.perf_counter() - t0)
    tts = dt / reps
    base_tts = 12 * (2.33e-3 * (2 * nsegs + 1) / 129.0)
    print(json.dumps({
        "metric": f"IPM iterations/s at {2 * nsegs + 1} collocation nodes "
                  "(CartPole LGL5, full PSIOPT loop; baseline scaled "
                  "linearly per node)",
        "value": round(iters_per_s, 3),
        "unit": "iterations/s",
        "vs_baseline": round(iters_per_s / baseline_iters_per_s, 3),
        "flag": flag,
        "iters": niters,
        "kkt_factor_solve_ms": round(kkt_ms, 1),
        "time_to_solution_s": round(tts, 3),
        "baseline_time_to_solution_s": round(base_tts, 3),
        "vs_baseline_time_to_solution": round(base_tts / tts, 2),
    }))


if __name__ == "__main__":
    main()
