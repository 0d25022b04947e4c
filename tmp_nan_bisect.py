"""Bisect which family/stage produces NaN on TPU."""
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

nsegs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
phase = bench.build_phase(nsegs)
phase.transcribe()
print("backend", jax.default_backend(), flush=True)
opt = phase.optimizer
kkt = opt.kkt
nlp = kkt.nlp
x, s, lamE, lamI = opt._init_state(phase.makeSolverInput(), opt.initMu)
consts = nlp.consts_dev()

for which, fams, lam in (("eq", kkt._eq, lamE), ("iq", kkt._iq, lamI),
                         ("obj", kkt._obj, None)):
    cgrp = {"eq": consts[1], "iq": consts[2], "obj": consts[0]}[which]
    for i, fam in enumerate(fams):
        cc = cgrp[i]
        if lam is None:
            lm = jnp.ones((fam["napps"], 1))
        else:
            lm = lam[fam["rows"]]
        if fam["need_hess"]:
            fx, jx, hx = jax.jit(fam["full"])(x[fam["Vidx"]], cc, lm)
            print(which, i, fam["napps"], "x", fam["nin"],
                  "fx", bool(jnp.isfinite(fx).all()),
                  "jx", bool(jnp.isfinite(jx).all()),
                  "hx", bool(jnp.isfinite(hx).all()),
                  "|hx|max", float(jnp.abs(hx).max()), flush=True)
        else:
            fx, jx = jax.jit(fam["vj"])(x[fam["Vidx"]], cc)
            print(which, i, fam["napps"], "x", fam["nin"],
                  "fx", bool(jnp.isfinite(fx).all()),
                  "jx", bool(jnp.isfinite(jx).all()), flush=True)
