"""Round-5 TPU session 10: end-to-end fused solve with the fast family
AD path (batch-minor f64 valjac + genuine-f32 adjoint hessian) vs the
dd baseline, at bench scale."""
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


def full_solve(label, famad, reps=2):
    os.environ["ASSET_FAMAD"] = famad
    t0 = time.time()
    phase = bench.build_phase(NSEG)
    phase.transcribe()
    print(f"[{label}] transcribe {time.time() - t0:.1f}s", flush=True)
    opt = phase.optimizer
    kkt = opt.kkt
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
          f"{1000 * dt / max(total, 1):.1f} ms/iter "
          f"(compile+first {tc:.0f}s)", flush=True)


full_solve("fast", "fast")
if os.environ.get("WITH_DD", "1") == "1":
    full_solve("dd-ctrl", "dd")
