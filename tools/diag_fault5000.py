"""Bisect the >=5000-segment TPU device fault stage by stage.

Runs each solver stage (AD, assembly, factor, solve, fused loop) as its
own jit at nsegs=5000; the first stage that kills the PJRT client is the
faulting one (subsequent calls report UNAVAILABLE).
"""
import sys
import time
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import importlib.util
spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)

from asset_asrl_tpu.Solvers.fused import build_fused_alg

nsegs = int(sys.argv[1]) if len(sys.argv) > 1 else 5000

t0 = time.time()
r = jnp.asarray(np.eye(8)) @ jnp.asarray(np.eye(8))
jax.block_until_ready(r)
print("probe matmul ok", round(time.time() - t0, 1), "s", flush=True)

t0 = time.time()
phase = bench.build_phase(nsegs)
phase.transcribe()
print("transcribe", round(time.time() - t0, 1), "s", flush=True)
opt = phase.optimizer
kkt = opt.kkt
nlp = kkt.nlp
bs = kkt.bs
print("K", bs.K, "W", bs.W, "b", bs.b, flush=True)
x, s, lamE, lamI = opt._init_state(phase.makeSolverInput(), opt.initMu)
consts = nlp.consts_dev()
sig = jnp.asarray(1.0)


def stage(name, fn, *args):
    print(f"STAGE {name}: compiling/running...", flush=True)
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    print(f"STAGE {name}: first {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    print(f"STAGE {name}: repeat {1000 * (time.time() - t0):.1f} ms",
          flush=True)
    return out


jad = jax.jit(kkt._ad_impl)
obj, cE, cI, rd, famvals = stage("ad", jad, x, lamE, lamI, sig, consts)
print("  rd finite", bool(jnp.isfinite(rd).all()), flush=True)

sig_tilde = jnp.ones((nlp.numIq,))
jblk = jax.jit(kkt._blocks_impl)
blocks = stage("blocks", jblk, famvals, sig_tilde)
print("  blocks finite",
      bool(jnp.isfinite(blocks[0]).all() & jnp.isfinite(blocks[1]).all()),
      flush=True)

jfac = jax.jit(kkt._factor_blocks_impl)
fac, neigs = stage("factor", jfac, blocks, jnp.asarray(1e-5),
                   jnp.asarray(1e-10))
print("  neigs", int(neigs), "want", nlp.numEq, flush=True)

jsol = jax.jit(kkt._solve_impl)
rhs_x = jnp.zeros((nlp.numPrimal,))
dx, dlamE = stage("solve", jsol, fac, rhs_x, -cE)
print("  dx finite", bool(jnp.isfinite(dx).all()), flush=True)

print("STAGE fused: building...", flush=True)
fn = build_fused_alg(kkt, opt._opts_snapshot(), "OPT")
mu0 = jnp.asarray(opt.initMu)
t0 = time.time()
out = fn(x, s, lamE, lamI, mu0, consts)
jax.block_until_ready(out[0])
print(f"STAGE fused: first {time.time() - t0:.1f}s flag {int(out[5])} "
      f"iters {int(out[6])}", flush=True)
t0 = time.time()
out = fn(x, s, lamE, lamI, mu0, consts)
jax.block_until_ready(out[0])
ni = int(out[6])
dt = time.time() - t0
print(f"STAGE fused: repeat {dt:.2f}s iters {ni} -> {ni / dt:.2f} it/s",
      flush=True)
print("FAULT DIAG DONE", flush=True)
