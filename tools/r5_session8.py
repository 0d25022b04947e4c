"""Round-5 TPU session 8: batch-minor family AD experiment.

The in-loop attribution (r5_session7, TPUArchitecture.md) says the AD
passes are VPU *lane under-utilization* bound: vmap over the leading
napps axis leaves intermediates shaped (napps, k) with tiny minor k on
128-wide lanes.  Mapping the SAME functions with in_axes=-1/out_axes=-1
puts napps on the lane axis so every elementwise op runs full-width.
This measures both layouts for the real LGL5 defect family at bench
scale: value, value+jac, adjoint-hess.
"""
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

NSEG = int(os.environ.get("NSEG", "5000"))
print("backend:", jax.default_backend(), flush=True)


def timed(name, fn, *args, reps=10):
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
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None


phase = bench.build_phase(NSEG)
phase.transcribe()
opt = phase.optimizer
kkt = opt.kkt
nlp = kkt.nlp

# the defect family = the largest eq family
f = max(nlp.eqcons, key=lambda g: g.napps * g.nin)
print("family:", f.name, "napps", f.napps, "nin", f.nin, "nout", f.nout,
      flush=True)
Vidx = jnp.asarray(f.Vidx)
cc = jnp.asarray(f.consts)
x = jnp.asarray(phase.makeSolverInput())
lam = jnp.ones((f.napps, f.nout), jnp.float64)
xg = x[Vidx]                      # (napps, nin)
xgT = jnp.asarray(np.asarray(xg).T.copy())     # (nin, napps)
ccT = jnp.asarray(np.asarray(f.consts).T.copy())
fun = f.fun


def one_val(xloc, consts):
    return jnp.atleast_1d(fun(xloc, consts))


def one_vj(xloc, consts):
    g = lambda z: jnp.atleast_1d(fun(z, consts))
    return g(xloc), jax.jacfwd(g)(xloc)


def one_hess(xloc, consts, l):
    g = lambda z: jnp.atleast_1d(fun(z, consts))
    agrad = lambda z: jax.vjp(g, z)[1](l)[0]
    return jax.jacfwd(agrad)(xloc)


# ------------------------------------------------- batch-major (current)
val0 = jax.jit(jax.vmap(one_val))
vj0 = jax.jit(jax.vmap(one_vj))
hs0 = jax.jit(jax.vmap(one_hess))

# ------------------------------------------------- batch-minor
valm = jax.jit(jax.vmap(one_val, in_axes=-1, out_axes=-1))
vjm = jax.jit(jax.vmap(one_vj, in_axes=-1, out_axes=-1))
hsm = jax.jit(jax.vmap(one_hess, in_axes=(-1, -1, -1), out_axes=-1))

# batch-minor incl. the transposes the pipeline would need


def vjm_t(xT, cT):
    fx, jx = jax.vmap(one_vj, in_axes=-1, out_axes=-1)(xT, cT)
    return fx.T, jx.transpose(2, 0, 1)


def hsm_t(xT, cT, lT):
    hx = jax.vmap(one_hess, in_axes=(-1, -1, -1), out_axes=-1)(xT, cT, lT)
    return hx.transpose(2, 0, 1)


vjm_tj = jax.jit(vjm_t)
hsm_tj = jax.jit(hsm_t)

r_val0 = timed("value batch-major", val0, xg, cc)
r_valm = timed("value batch-minor", valm, xgT, ccT)
r_vj0 = timed("valjac batch-major", vj0, xg, cc)
r_vjm = timed("valjac batch-minor", vjm, xgT, ccT)
r_vjmt = timed("valjac batch-minor+T", vjm_tj, xgT, ccT)
r_hs0 = timed("hess batch-major", hs0, xg, cc, lam)
r_hsm = timed("hess batch-minor", hsm, xgT, ccT, lam.T)
r_hsmt = timed("hess batch-minor+T", hsm_tj, xgT, ccT, lam.T)

# correctness
if r_vj0 is not None and r_vjmt is not None:
    print("valjac match:",
          float(jnp.max(jnp.abs(r_vj0[1] - r_vjmt[1]))), flush=True)
if r_hs0 is not None and r_hsmt is not None:
    print("hess match:",
          float(jnp.max(jnp.abs(r_hs0 - r_hsmt))), flush=True)
