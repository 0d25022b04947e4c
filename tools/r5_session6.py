"""Round-5 TPU session 6: f32-factor + FGMRES variant under the new
sign-count regime, and an it/s scaling curve over mesh sizes."""
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

print("backend:", jax.default_backend(), flush=True)


def solve(phase, label, reps=3):
    opt = phase.optimizer
    kkt = opt.kkt
    nlp = kkt.nlp
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
          f"ms/iter={1000 * dt / max(total, 1):.1f} "
          f"mean_nfacs={infos[:, 7].mean():.2f} (first {tc:.0f}s)",
          flush=True)


# R: f32 factor + FGMRES refinement at bench scale
os.environ["ASSET_FACTOR_DTYPE"] = "f32"
phase = bench.build_phase(5000)
phase.transcribe()
solve(phase, "R f32factor FGMRES 5000")
del os.environ["ASSET_FACTOR_DTYPE"]
del phase

# scaling curve (default config)
for nsegs in (1250, 2500, 5000):
    phase = bench.build_phase(nsegs)
    phase.transcribe()
    solve(phase, f"S scale {2 * nsegs + 1} nodes")
    del phase
print("SESSION6 DONE", flush=True)
