"""Round-5 TPU session 4: solve with sign-only pivot counts (the
exact-inertia audit fix), zero-target refinement, and the mixed32
factor variant."""
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


def solve(label, tail=16, reps=2):
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
          f"econ={infos[-1][2]:.2e} it/s={total / dt:.3f} "
          f"ms/iter={1000 * dt / max(total, 1):.1f} "
          f"mean_nfacs={infos[:, 7].mean():.2f} (first {tc:.0f}s)",
          flush=True)
    for i in range(max(0, niters - tail), niters):
        r = infos[i]
        print(f"  {i:3d} kkt={r[1]:.2e} econ={r[2]:.2e} mu={r[5]:.1e} "
              f"a={r[6]:.3f} nf={int(r[7])} hp={r[8]:.1e}", flush=True)
    return infos


solve("J rel0 zt2")

os.environ["ASSET_INV_MODE"] = "mixed32"
solve("K rel0 zt2 mixed32")
del os.environ["ASSET_INV_MODE"]

os.environ["ASSET_ZT_KKT"] = "1e-2"
solve("L rel0 zt2 zt@1e-2")
print("SESSION4 DONE", flush=True)
