"""Round-5 TPU session 11: standalone timings of the in-repo fast-path
family evaluators (batch-minor f64 valjac + retraced-f32 hessian) and
of assembly/factor/solve pieces, to find where the unchanged 162 ms/iter
actually lives."""
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
os.environ.setdefault("ASSET_FAMAD", "fast")
print("backend:", jax.default_backend(), "famad",
      os.environ["ASSET_FAMAD"], flush=True)


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

x = jnp.asarray(phase.makeSolverInput())
consts = nlp.consts_dev()
lamE = jnp.zeros((nlp.numEq,), jnp.float64)
lamI = jnp.zeros((nlp.numIq,), jnp.float64)
sigma = jnp.asarray(1.0)

fam = max(kkt._eq, key=lambda g: g["napps"] * g["nin"])
f = max(nlp.eqcons, key=lambda g: g.napps * g.nin)
xg = x[fam["Vidx"]]
cc = jnp.asarray(f.consts)
lam = jnp.ones((fam["napps"], fam["nout"]), jnp.float64)

vj = jax.jit(fam["vj"])
hs = jax.jit(fam["hess"])
timed("fam vj (in-repo fast)", vj, xg, cc)
timed("fam hess (in-repo fast)", hs, xg, cc, lam)

# whole AD pass / assembly / factor / solve
ad = jax.jit(lambda x_, c_: kkt._eval_core(x_, lamE, lamI, sigma, c_,
                                           want_hess=True))
out = timed("eval_core full AD", ad, x, consts)
if out is not None:
    famvals = out[4]
    sig_tilde = jnp.zeros((nlp.numIq,), jnp.float64)
    asm = jax.jit(lambda fv: kkt._blocks_impl(fv, sig_tilde))
    blocks = timed("blocks assembly", asm, famvals)
    if blocks is not None:
        fb = jax.jit(lambda b: kkt._factor_blocks_impl(b, 1e-4, 0.0))
        fr = timed("factor (1 ladder rung)", fb, blocks)
        if fr is not None:
            fac, neigs = fr
            rhs = jnp.ones((nlp.numPrimal,), jnp.float64)
            rce = jnp.zeros((nlp.numEq,), jnp.float64)
            sv = jax.jit(lambda f_, r_, c_: kkt._solve_impl(f_, r_, c_))
            timed("solve (+refine)", sv, fac, rhs, rce)

# dispatch overhead reference
z = jnp.zeros((8,))
timed("dispatch overhead (tiny op)", jax.jit(lambda a: a + 1), z, reps=20)
