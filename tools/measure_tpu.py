"""One-shot TPU measurement batch: correctness recheck + staged timings."""
import sys
import time
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo")
import importlib.util
spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)
from asset_asrl_tpu.Solvers import kkt_block as KB
from asset_asrl_tpu.Solvers.fused import build_fused_alg

nsegs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
t0 = time.time()
phase = bench.build_phase(nsegs)
phase.transcribe()
print("backend", jax.default_backend(), "transcribe",
      round(time.time() - t0, 1), flush=True)
opt = phase.optimizer
kkt = opt.kkt
nlp = kkt.nlp
bs = kkt.bs
print("K", bs.K, "W", bs.W, "b", bs.b, flush=True)
x, s, lamE, lamI = opt._init_state(phase.makeSolverInput(), opt.initMu)
consts = nlp.consts_dev()
sig = jnp.asarray(1.0)


def timed(name, fn, *args, reps=5):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    print(f"{name}: first {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    print(f"{name}: {1000 * (time.time() - t0) / reps:.1f} ms", flush=True)
    return out


# 1. family AD (with hessians) + finiteness
jad = jax.jit(kkt._ad_impl)
obj, cE, cI, rd, famvals = timed("ad", jad, x, lamE, lamI, sig, consts)
hx_ok = all(bool(jnp.isfinite(h).all()) for h in famvals["hx_eq"]
            if h is not None)
print("NANCHECK rd", bool(jnp.isfinite(rd).all()), "hx_eq", hx_ok,
      "hx_obj", all(bool(jnp.isfinite(h).all())
                    for h in famvals["hx_obj"] if h is not None), flush=True)

# 2. resid only
jres = jax.jit(kkt._resid_impl)
timed("resid", jres, x, lamE, lamI, sig, consts)

# 3. blocks
sig_tilde = jnp.ones((nlp.numIq,))
jblk = jax.jit(kkt._blocks_impl)
blocks = timed("blocks", jblk, famvals, sig_tilde)
print("blocks finite", bool(jnp.isfinite(blocks[0]).all()
                            & jnp.isfinite(blocks[1]).all()), flush=True)

# 4. factor f64 (packed)
jfac = jax.jit(kkt._factor_blocks_impl)
fac, neigs = timed("factor_f64", jfac, blocks, jnp.asarray(1e-5),
                   jnp.asarray(1e-10))
print("neigs", int(neigs), "want", nlp.numEq, flush=True)

# 5. solve f64
rhs_x = jnp.zeros((nlp.numPrimal,))
jsol = jax.jit(kkt._solve_impl)
dx, dlamE = timed("solve_f64", jsol, fac, rhs_x, -cE)
print("dx finite", bool(jnp.isfinite(dx).all()),
      "|dx|", float(jnp.linalg.norm(dx)), flush=True)

# 6. factor f32 + refined solve
KB.FACTOR_DTYPE = "f32"
jfac32 = jax.jit(kkt._factor_blocks_impl)
fac32, neigs32 = timed("factor_f32pallas", jfac32, blocks,
                       jnp.asarray(1e-5), jnp.asarray(1e-10))
print("neigs32", int(neigs32), flush=True)
jsol32 = jax.jit(kkt._solve_impl)
dx32, _ = timed("solve_f32_fgmres", jsol32, fac32, rhs_x, -cE)
print("dx32 finite", bool(jnp.isfinite(dx32).all()),
      "rel diff vs f64", float(jnp.linalg.norm(dx32 - dx)
                               / jnp.linalg.norm(dx)), flush=True)
KB.FACTOR_DTYPE = "f64"

# 7. full fused solve (bench semantics; stepwise above the program-size
# fault threshold, exactly like bench.py / phase.optimize())
from asset_asrl_tpu.Solvers.fused import run_stepwise
if kkt.bs.K > 3072 and jax.default_backend() == "tpu":
    parts = build_fused_alg(kkt, opt._opts_snapshot(), "OPT", parts=True)
    fn = lambda *a: run_stepwise(parts, *a)  # noqa: E731
else:
    fn = build_fused_alg(kkt, opt._opts_snapshot(), "OPT")
mu0 = jnp.asarray(opt.initMu)
t0 = time.time()
out = fn(x, s, lamE, lamI, mu0, consts)
jax.block_until_ready(out[0])
print("fused: first(compile)", round(time.time() - t0, 1), "s", flush=True)
t0 = time.time()
out = fn(x, s, lamE, lamI, mu0, consts)
jax.block_until_ready(out[0])
dt = time.time() - t0
ni = int(out[6])
print(f"fused: flag {int(out[5])} iters {ni} {dt:.2f}s "
      f"-> {ni / dt:.2f} it/s", flush=True)
infos = np.asarray(out[7][:max(ni, 1)])
print("last info:", infos[-1][:5], flush=True)
print("MEASURE DONE", flush=True)
