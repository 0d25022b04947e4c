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
            x = g[j * 5:j * 5 + 4]
            u = g[j * 5 + 4:(j + 1) * 5]
            t = t0 + (c[0] + ctau[j] * dtau) * T
            if variant == "noconcat":
                vals.append(u[0] ** 2)
            else:
                xtu = jnp.concatenate([x, t[None], u, g[17:]])
                vals.append(xtu[5] ** 2)
        if variant == "nohT":
            return (wq @ jnp.stack(vals))[None]
        return (h * (wq @ jnp.stack(vals)))[None]
    return fun


def hess(fun):
    def one(xloc, consts, lam):
        f = lambda z: fun(z, consts)
        agrad = lambda z: jax.vjp(f, z)[1](lam)[0]
        return jax.jacfwd(agrad)(xloc)
    return jax.jit(jax.vmap(one))


B = 8
x = jnp.asarray(np.random.randn(B, 17))
c = jnp.asarray(np.tile([0.3, 0.35], (B, 1)))
lam = jnp.ones((B, 1))
for v in ("full", "noconcat", "nohT"):
    t0 = time.time()
    hx = hess(make(v))(x, c, lam)
    print(v, "finite", bool(jnp.isfinite(hx).all()),
          "nan", int(jnp.sum(~jnp.isfinite(hx))),
          f"{time.time() - t0:.0f}s", flush=True)
    if not bool(jnp.isfinite(hx).all()):
        bad = np.argwhere(~np.isfinite(np.asarray(hx)[0]))
        print("  nan at (row,col):", bad[:20].tolist(), flush=True)
