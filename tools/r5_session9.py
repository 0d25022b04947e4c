"""Round-5 TPU session 9: GENUINE f32 family AD via disable_x64 tracing.

Hypothesis: the round-4 f32 AD variants changed nothing (<2%) because
f64 numpy constants embedded in the traced closures re-promote every op
to dd-f64 — the cast never stuck.  Tracing the family function inside
`jax.experimental.disable_x64()` canonicalizes those constants to f32,
yielding a truly-f32 graph with ~15-30x fewer VPU ops per elementwise
f64-emulated op.  Measures hess + valjac in genuine f32, both batch
layouts, against the dd-f64 baselines from session 8.
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

f = max(nlp.eqcons, key=lambda g: g.napps * g.nin)
print("family:", f.name, "napps", f.napps, "nin", f.nin, "nout", f.nout,
      flush=True)
Vidx = jnp.asarray(f.Vidx)
cc = jnp.asarray(f.consts)
x = jnp.asarray(phase.makeSolverInput())
lam = jnp.ones((f.napps, f.nout), jnp.float64)
xg = x[Vidx]
xgT = jnp.asarray(np.asarray(xg).T.copy())
ccT = jnp.asarray(np.asarray(f.consts).T.copy())
fun = f.fun


def fun32(z, c):
    """Trace `fun` with x64 canonicalization OFF: embedded f64 numpy
    constants become f32, so the whole graph stays f32."""
    with jax.enable_x64(False):
        out = fun(z, c)
    return jnp.atleast_1d(out)


def one_vj32(xloc, consts):
    x32 = xloc.astype(jnp.float32)
    c32 = consts.astype(jnp.float32)
    g = lambda z: fun32(z, c32)
    fx, jx = g(x32), jax.jacfwd(g)(x32)
    return fx, jx


def one_hess32(xloc, consts, l):
    x32 = xloc.astype(jnp.float32)
    c32 = consts.astype(jnp.float32)
    l32 = l.astype(jnp.float32)
    g = lambda z: fun32(z, c32)
    agrad = lambda z: jax.vjp(g, z)[1](l32)[0]
    return jax.jacfwd(agrad)(x32)


def one_hess64(xloc, consts, l):
    g = lambda z: jnp.atleast_1d(fun(z, consts))
    agrad = lambda z: jax.vjp(g, z)[1](l)[0]
    return jax.jacfwd(agrad)(xloc)


vj32_0 = jax.jit(jax.vmap(one_vj32))
vj32_m = jax.jit(jax.vmap(one_vj32, in_axes=-1, out_axes=-1))
hs32_0 = jax.jit(jax.vmap(one_hess32))
hs32_m = jax.jit(jax.vmap(one_hess32, in_axes=(-1, -1, -1), out_axes=-1))
hs64_0 = jax.jit(jax.vmap(one_hess64))

r0 = timed("hess dd-f64 batch-major (ref)", hs64_0, xg, cc, lam)
r1 = timed("valjac f32 batch-major", vj32_0, xg, cc)
r2 = timed("valjac f32 batch-minor", vj32_m, xgT, ccT)
r3 = timed("hess f32 batch-major", hs32_0, xg, cc, lam)
r4 = timed("hess f32 batch-minor", hs32_m, xgT, ccT, lam.T)

if r0 is not None and r3 is not None:
    d = jnp.max(jnp.abs(r0 - r3.astype(jnp.float64)))
    s = jnp.max(jnp.abs(r0))
    print(f"hess f32 vs f64: absmax err {float(d):.3e} scale {float(s):.3e}",
          flush=True)
if r0 is not None and r4 is not None:
    d = jnp.max(jnp.abs(r0 - r4.transpose(2, 0, 1).astype(jnp.float64)))
    print(f"hess f32-minor vs f64: absmax err {float(d):.3e}", flush=True)
