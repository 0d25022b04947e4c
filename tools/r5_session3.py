"""Round-5 TPU session 3: exact-inertia audit at the converged iterate.

At the final iterate of the 10k-node bench solve, assemble the KKT blocks
once and compare the TPU BCR pivot-sign inertia against an EXACT host
(numpy, true f64) block-LDL^T inertia over a delta ladder — separating
genuine indefiniteness from dd-f64 pivot-sign noise (the suspected cause
of the late-IPM ladder thrash seen in session 2).  Then re-solve with the
indicated pivot-threshold / zt-steps settings."""
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
from asset_asrl_tpu.Solvers import kkt_block as KB  # noqa: E402

NSEG = int(os.environ.get("NSEG", "5000"))
print("backend:", jax.default_backend(), flush=True)

phase = bench.build_phase(NSEG)
phase.transcribe()
opt = phase.optimizer
kkt = opt.kkt
nlp = kkt.nlp
print("transcribed", flush=True)


def solve(label):
    parts = build_fused_alg(kkt, opt._opts_snapshot(), "OPT", parts=True)
    x, s, lamE, lamI = opt._init_state(phase.makeSolverInput(), opt.initMu)
    t0 = time.time()
    out = run_stepwise(parts, x, s, lamE, lamI, jnp.asarray(opt.initMu),
                       nlp.consts_dev())
    jax.block_until_ready(out[0])
    niters = max(int(out[6]), 1)
    infos = np.asarray(out[7][:niters])
    t1 = time.time()
    out2 = run_stepwise(parts, x, s, lamE, lamI, jnp.asarray(opt.initMu),
                        nlp.consts_dev())
    jax.block_until_ready(out2[0])
    dt = time.time() - t1
    print(f"[{label}] flag={int(out[5])} iters={niters} "
          f"kkt={infos[-1][1]:.2e} obj={infos[-1][0]:.6f} "
          f"it/s={int(out2[6]) / dt:.3f} "
          f"minkkt={infos[:, 1].min():.2e} "
          f"mean_nfacs={infos[:, 7].mean():.2f} (total {time.time() - t0:.0f}s)",
          flush=True)
    return out


out = solve("H zt baseline")
xf, sf, lamEf, lamIf, Muf = out[0], out[1], out[2], out[3], out[4]

# ---- blocks at the final iterate -----------------------------------------
Mu = jnp.asarray(Muf)
s_ = jnp.maximum(sf, 1e-300)
Sig = jnp.where(lamIf / s_ < 0.0, Mu / (s_ * s_), lamIf / s_)
sig_tilde = Sig / (1.0 + opt.gammaI * Sig)
_, _, _, _, fam = jax.jit(kkt._ad_impl)(
    xf, lamEf, lamIf, jnp.asarray(1.0), nlp.consts_dev())
blocks = jax.block_until_ready(jax.jit(kkt._blocks_impl)(fam, sig_tilde))
diag_np, lower_np, B_np, C_np = [np.asarray(v) for v in blocks]
print("blocks at final iterate ready", flush=True)

sign_d = kkt._diag_sign
fix_d = kkt._diag_fix
sign_c = kkt._c_sign
mE = nlp.numEq


def np_inertia(delta, gammaE=1e-10):
    d = diag_np + np.where(sign_d > 0, delta,
                           np.where(sign_d < 0, -gammaE, 0.0)) + fix_d
    C = C_np + np.where(sign_c > 0, delta,
                        np.where(sign_c < 0, -gammaE, 0.0))
    K, W, _ = d.shape
    b = C.shape[0]
    neg = 0
    Dk = d[0].copy()
    Bh = B_np[0].copy()
    Csch = C.copy()
    for k in range(K):
        wv = np.linalg.eigvalsh(Dk)
        neg += int((wv < 0).sum())
        Dinv = np.linalg.inv(Dk)
        Csch -= Bh.T @ Dinv @ Bh
        if k + 1 < K:
            Lk = lower_np[k]
            Dk = d[k + 1] - Lk @ Dinv @ Lk.T
            Bh = B_np[k + 1] - Lk @ Dinv @ Bh
    wv = np.linalg.eigvalsh(Csch)
    neg += int((wv < 0).sum())
    return neg


def tpu_neigs(delta, pivot_rel):
    os.environ["ASSET_PIVOT_REL"] = str(pivot_rel)
    fn = jax.jit(lambda bl, dd: kkt._factor_blocks_impl(
        bl, dd, jnp.asarray(1e-10)))
    fac, neigs = fn(blocks, jnp.asarray(delta))
    q = KB.factor_quality(fac, jnp.asarray(kkt._rq_blk),
                          jnp.asarray(kkt._rq_brd))
    return int(neigs), float(q)


print(f"mE = {mE}", flush=True)
for delta in (3.3e-3, 1.1e-3, 3.7e-4, 1e-4, 1e-5, 0.0):
    exact = np_inertia(delta)
    row = f"delta={delta:8.1e} exact_neigs={exact} (excess {exact - mE:+d})"
    for rel in (1e-12, 1e-14, 0.0):
        n, q = tpu_neigs(delta, rel)
        row += f" | tpu(rel={rel:g}): {n - mE:+d} q={q:.1e}"
    print(row, flush=True)

# ---- re-solve with the settings the audit suggests -----------------------
os.environ["ASSET_PIVOT_REL"] = "1e-14"
os.environ["ASSET_ZT_STEPS"] = "3"
solve("I rel=1e-14 zt3")
print("SESSION3 DONE", flush=True)
