"""Round-5 TPU session 7: in-loop differential attribution at fixed
iteration count (MaxIters=12) — hessian AD on/off — to pin the
AD-vs-assembly split inside the fused program."""
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
opt.MaxIters = 12
kkt = opt.kkt
nlp = kkt.nlp
print("transcribed", flush=True)


def solve(label, reps=3):
    parts = build_fused_alg(kkt, opt._opts_snapshot(), "OPT", parts=True)
    x, s, lamE, lamI = opt._init_state(phase.makeSolverInput(), opt.initMu)
    out = run_stepwise(parts, x, s, lamE, lamI, jnp.asarray(opt.initMu),
                       nlp.consts_dev())
    jax.block_until_ready(out[0])
    t0 = time.time()
    total = 0
    for _ in range(reps):
        out = run_stepwise(parts, x, s, lamE, lamI,
                           jnp.asarray(opt.initMu), nlp.consts_dev())
        jax.block_until_ready(out[0])
        total += int(out[6])
    dt = time.time() - t0
    print(f"[{label}] iters={int(out[6])} flag={int(out[5])} "
          f"ms/iter={1000 * dt / max(total, 1):.1f}", flush=True)


solve("T0 full 12it")
os.environ["ASSET_DIFF_NOHESS"] = "1"
solve("T1 nohess 12it")
del os.environ["ASSET_DIFF_NOHESS"]
print("SESSION7 DONE", flush=True)
