"""One-shot TPU Hessian-NaN ablation batch (run serially, never killed)."""
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import time
print("backend", jax.default_backend(), flush=True)
wq = np.array([1 / 6, 4 / 6, 1 / 6])
ctau = np.array([0.0, 0.5, 1.0])


def make(variant):
    def fun(g, c):
        t0 = g[15]
        tf = g[16]
        T = tf - t0
        dtau = c[1] - c[0]
        h = dtau * T
        vals = []
        for j in range(3):
            u = g[j * 5 + 4]
            if variant == "no_t":
                vals.append(u ** 2)
            else:
                t = t0 + (c[0] + ctau[j] * dtau) * T
                x = g[j * 5:j * 5 + 4]
                xtu = jnp.concatenate([x, t[None], g[j * 5 + 4:(j + 1) * 5],
                                       g[17:]])
                vals.append(xtu[5] ** 2)
        s = jnp.stack(vals)
        if variant == "no_wq":
            integ = h * (s[0] / 6 + s[1] * 4 / 6 + s[2] / 6)
        else:
            integ = h * (wq @ s)
        if variant == "no_h":
            integ = wq @ s
        return integ[None]
    return fun


def hess(fun, how):
    def one(xloc, consts, lam):
        f = lambda z: fun(z, consts)
        if how == "vjp":
            agrad = lambda z: jax.vjp(f, z)[1](lam)[0]
            return jax.jacfwd(agrad)(xloc)
        g = lambda z: jnp.tensordot(lam, f(z), axes=1)
        return jax.jacfwd(jax.jacfwd(g))(xloc)
    return jax.jit(jax.vmap(one))


B = 8
rng = np.random.default_rng(3)
x = jnp.asarray(rng.normal(size=(B, 17)))
cc = jnp.asarray(np.tile([0.3, 0.35], (B, 1)))
lam = jnp.ones((B, 1))
for v in ("full", "no_t", "no_wq", "no_h"):
    for how in ("vjp", "fwdfwd"):
        t0 = time.time()
        try:
            hx = hess(make(v), how)(x, cc, lam)
            ok = bool(jnp.isfinite(hx).all())
            print(v, how, "finite", ok, "nan",
                  int(jnp.sum(~jnp.isfinite(hx))),
                  f"{time.time() - t0:.0f}s", flush=True)
            if not ok:
                bad = np.argwhere(~np.isfinite(np.asarray(hx)[0]))
                rows = sorted(set(b[0] for b in bad))
                cols = sorted(set(b[1] for b in bad))
                print("   nan rows", rows, "cols", cols, flush=True)
        except Exception as e:
            print(v, how, "ERROR", repr(e)[:120], flush=True)
print("BATCH DONE", flush=True)
