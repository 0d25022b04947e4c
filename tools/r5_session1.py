"""Round-5 TPU session 1: composite per-stage timings at bench scale +
full-solve variants (probe0 / hess32 / jac32 / PROBE barrier).

One sequential script per TPU session (single-client tunnel discipline).
Stage timings carry a fixed ~30 ms per-dispatch tunnel overhead; the
"dispatch_overhead" line measures it for subtraction.
"""
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
from asset_asrl_tpu.Solvers import kkt_block as KB  # noqa: E402

NSEG = int(os.environ.get("NSEG", "5000"))
print("backend:", jax.default_backend(), "devices:", jax.devices(), flush=True)


def timed(name, fn, *args, reps=8):
    try:
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        tc = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            out = jax.block_until_ready(fn(*args))
        print(f"{name}: {1000 * (time.time() - t0) / reps:.1f} ms "
              f"(compile {tc:.0f}s)", flush=True)
        return out
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None


def build(label):
    t0 = time.time()
    phase = bench.build_phase(NSEG)
    phase.transcribe()
    print(f"[{label}] transcribe {time.time() - t0:.1f}s", flush=True)
    return phase


def full_solve(phase, label, barmode=None, reps=2):
    opt = phase.optimizer
    kkt = opt.kkt
    if barmode:
        opt.set_OptBarMode(barmode)
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
    print(f"[{label}] mean_nfacs={infos[:, 7].mean():.2f} "
          f"mean_alpha={infos[:, 6].mean():.3f} "
          f"pert_frac={(infos[:, 8] > 0).mean():.2f}", flush=True)
    return infos


def stage_timings(tag, phase, with_all=True):
    opt = phase.optimizer
    kkt = opt.kkt
    nlp = kkt.nlp
    x, s, lamE, lamI = opt._init_state(phase.makeSolverInput(), opt.initMu)
    consts = nlp.consts_dev()
    sig = jnp.asarray(1.0)
    st = jnp.ones((nlp.numIq,))
    out_ad = timed(f"{tag} ad_full(jac+hess+rd)", jax.jit(kkt._ad_impl),
                   x, lamE, lamI, sig, consts)
    if out_ad is None:
        return
    famvals = out_ad[4]
    hx = famvals["hx_eq"][0]
    if hx is not None:
        print(f"{tag} hess finite: {bool(jnp.isfinite(hx).all())} "
              f"dtype {hx.dtype}", flush=True)
    if not with_all:
        return
    blocks = timed(f"{tag} blocks_real", jax.jit(kkt._blocks_impl),
                   famvals, st)
    fr = timed(f"{tag} factor_blocks(ruiz+bcr+store)",
               jax.jit(kkt._factor_blocks_impl), blocks,
               jnp.asarray(1e-5), jnp.asarray(1e-10))
    if fr is None:
        return
    fac = fr[0]
    rq_b = jnp.asarray(kkt._rq_blk)
    rq_z = jnp.asarray(kkt._rq_brd)
    timed(f"{tag} factor_quality",
          jax.jit(lambda f: KB.factor_quality(f, rq_b, rq_z)), fac)
    # quality at delta=0 (healthy-factor residual level near the IG)
    fr0 = jax.block_until_ready(jax.jit(kkt._factor_blocks_impl)(
        blocks, jnp.asarray(0.0), jnp.asarray(1e-10)))
    q0 = jax.jit(lambda f: KB.factor_quality(f, rq_b, rq_z))(fr0[0])
    print(f"{tag} quality(delta=0)={float(q0):.2e} neigs0={int(fr0[1])} "
          f"mE={nlp.numEq}", flush=True)
    rx = jnp.zeros((nlp.numPrimal,))
    rE = jnp.ones((nlp.numEq,))
    timed(f"{tag} solve(richardson auto)", jax.jit(kkt._solve_impl),
          fac, rx, rE)
    timed(f"{tag} eval_oc", jax.jit(nlp.eval_obj_cons_impl), x, consts)


timed("dispatch_overhead", jax.jit(lambda v: v * 2.0 + 1.0),
      jnp.ones((8,)))

# ---------------- variant A: default (dd-f64 AD, probe0+verify) ----------
phase = build("A")
stage_timings("A", phase)
full_solve(phase, "A f64 LOQO probe0")
del phase
gc.collect()
time.sleep(5)

# ---------------- variant B: hess32 ---------------------------------------
os.environ["ASSET_HESS_DTYPE"] = "f32"
phase = build("B")
stage_timings("B", phase, with_all=False)
full_solve(phase, "B hess32 LOQO")
del phase
gc.collect()
time.sleep(5)

# ---------------- variant C: hess32 + jac32 -------------------------------
os.environ["ASSET_JAC_DTYPE"] = "f32"
phase = build("C")
stage_timings("C", phase)
full_solve(phase, "C hess32+jac32 LOQO")

# ---------------- variant D: C + PROBE barrier ----------------------------
full_solve(phase, "D hess32+jac32 PROBE", barmode="PROBE")
print("SESSION1 DONE", flush=True)
