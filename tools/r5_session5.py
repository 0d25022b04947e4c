"""Round-5 TPU session 5: per-iteration cost reductions now that the
solve converges in 11 iterations — zt steps, InitLmults, line search,
Ruiz iters, and a fixed-overhead measurement."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

import importlib.util  # noqa: E402
spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)

from asset_asrl_tpu.Solvers.fused import build_fused_alg, run_stepwise  # noqa: E402

NSEG = int(os.environ.get("NSEG", "5000"))
print("backend:", jax.default_backend(), flush=True)

phase = bench.build_phase(NSEG)
phase.transcribe()
opt = phase.optimizer
kkt = opt.kkt
nlp = kkt.nlp
print("transcribed", flush=True)


def solve(label, reps=3, mutate=None):
    snap = {}
    if mutate:
        for k, v in mutate.items():
            snap[k] = getattr(opt, k)
            setattr(opt, k, v)
    parts = build_fused_alg(kkt, opt._opts_snapshot(), "OPT", parts=True)
    x, s, lamE, lamI = opt._init_state(phase.makeSolverInput(), opt.initMu)
    t0 = time.time()
    out = run_stepwise(parts, x, s, lamE, lamI, jnp.asarray(opt.initMu),
                       nlp.consts_dev())
    jax.block_until_ready(out[0])
    tc = time.time() - t0
    t0 = time.time()
    total = 0
    for _ in range(reps):
        out = run_stepwise(parts, x, s, lamE, lamI,
                           jnp.asarray(opt.initMu), nlp.consts_dev())
        jax.block_until_ready(out[0])
        total += int(out[6])
    dt = time.time() - t0
    niters = max(int(out[6]), 1)
    infos = np.asarray(out[7][:niters])
    print(f"[{label}] flag={int(out[5])} iters={niters} "
          f"obj={infos[-1][0]:.6f} kkt={infos[-1][1]:.2e} "
          f"it/s={total / dt:.3f} s/solve={dt / reps:.3f} "
          f"mean_nfacs={infos[:, 7].mean():.2f} (first {tc:.0f}s)",
          flush=True)
    for k, v in snap.items():
        setattr(opt, k, v)
    return dt / reps, niters


# M: one zero-target refinement step
os.environ["ASSET_ZT_STEPS"] = "1"
solve("M zt1")
os.environ["ASSET_ZT_STEPS"] = "2"

# N: no least-squares multiplier init
solve("N no-init-lmults", mutate=dict(InitLmults=False))

# O: no line search
solve("O NOLS", mutate=dict(OptLSMode="NOLS"))

# Q: single Ruiz sweep
os.environ["ASSET_RUIZ_ITERS"] = "1"
solve("Q ruiz1")
del os.environ["ASSET_RUIZ_ITERS"]

# P: fixed-overhead probe (1-iteration cap)
s1, _ = solve("P maxiters2", mutate=dict(MaxIters=2))
print(f"P fixed-overhead estimate: {s1:.3f}s for init+2 iters", flush=True)
print("SESSION5 DONE", flush=True)
