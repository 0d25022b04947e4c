"""Round-5 TPU session 2: zero-target refinement validation at bench
scale, iterate-tail diagnostics, deltaH sensitivity, PROBE barrier."""
import os
import sys
import time
import gc

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


def full_solve(phase, label, barmode=None, deltaH=None, reps=2,
               tail=24):
    opt = phase.optimizer
    kkt = opt.kkt
    if barmode:
        opt.set_OptBarMode(barmode)
    if deltaH is not None:
        opt.set_deltaH(deltaH)
    parts = build_fused_alg(kkt, opt._opts_snapshot(), "OPT", parts=True)
    x, s, lamE, lamI = opt._init_state(phase.makeSolverInput(), opt.initMu)
    mu0 = jnp.asarray(opt.initMu)
    t0 = time.time()
    out = run_stepwise(parts, x, s, lamE, lamI, mu0, kkt.nlp.consts_dev())
    jax.block_until_ready(out[0])
    tc = time.time() - t0
    t0 = time.time()
    total = 0
    for _ in range(reps):
        out = run_stepwise(parts, x, s, lamE, lamI, mu0,
                           kkt.nlp.consts_dev())
        jax.block_until_ready(out[0])
        total += int(out[6])
    dt = time.time() - t0
    niters = max(int(out[6]), 1)
    infos = np.asarray(out[7][:niters])
    print(f"[{label}] flag={int(out[5])} iters={int(out[6])} "
          f"obj={infos[-1][0]:.6f} kkt={infos[-1][1]:.2e} "
          f"econ={infos[-1][2]:.2e} it/s={total / dt:.3f} "
          f"ms/iter={1000 * dt / max(total, 1):.1f} (first {tc:.0f}s)",
          flush=True)
    print(f"[{label}] tail (it, kkt, econ, mu, alpha, nfacs, hpert):",
          flush=True)
    for i in range(max(0, niters - tail), niters):
        r = infos[i]
        print(f"  {i:3d} kkt={r[1]:.2e} econ={r[2]:.2e} mu={r[5]:.1e} "
              f"a={r[6]:.3f} nf={int(r[7])} hp={r[8]:.1e}", flush=True)
    return infos


# ---- variant E: zero-target refinement (default-on now) ------------------
phase = build_phase = bench.build_phase(NSEG)
phase.transcribe()
print("transcribed", flush=True)
infos = full_solve(phase, "E f64 LOQO zt")

# ---- variant F: arm zero-target earlier ----------------------------------
os.environ["ASSET_ZT_KKT"] = "1e-1"
full_solve(phase, "F zt@1e-1")
os.environ["ASSET_ZT_KKT"] = "1e-3"

# ---- variant G: PROBE + corrector + zt -----------------------------------
full_solve(phase, "G PROBE+corr zt", barmode="PROBE")
print("SESSION2 DONE", flush=True)
