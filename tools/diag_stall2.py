"""Late-IPM oscillation diagnosis at 2500 segs.

With rel=1e-12 the solver reaches kkt~1e-5 then oscillates (hpert
climbs to ~5e-4).  At the FINAL iterate this script compares, for a
ladder of deltas: inertia counts (TPU strict-threshold vs TPU rel=0 vs
CPU) and Newton-direction quality (TPU refined dx vs CPU dx, linear
residuals) — separating inertia-policy effects from solve accuracy.
"""
import os
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

from asset_asrl_tpu.Solvers import kkt_block as KB
from asset_asrl_tpu.Solvers.fused import build_fused_alg

cpu = jax.devices("cpu")[0]
nsegs = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
phase = bench.build_phase(nsegs)
phase.transcribe()
opt = phase.optimizer
kkt = opt.kkt
nlp = kkt.nlp
bs = kkt.bs
print("K", bs.K, "W", bs.W, "b", bs.b, flush=True)

fn = build_fused_alg(kkt, opt._opts_snapshot(), "OPT")
x0, s0, lE0, lI0 = opt._init_state(phase.makeSolverInput(), opt.initMu)
t0 = time.time()
out = fn(x0, s0, lE0, lI0, jnp.asarray(opt.initMu), nlp.consts_dev())
jax.block_until_ready(out[0])
ni = int(out[6])
infos = np.asarray(out[7][:max(ni, 1)])
print(f"fused: flag {int(out[5])} iters {ni} kkt {infos[-1][1]:.2e} "
      f"({time.time() - t0:.0f}s)", flush=True)

xf, sf = np.asarray(out[0]), np.asarray(out[1])
lEf, lIf = np.asarray(out[2]), np.asarray(out[3])
Muf = float(np.asarray(out[4]))

# assemble blocks once at the final iterate
jad = jax.jit(kkt._ad_impl)
obj, cE, cI, rd, fam = jad(jnp.asarray(xf), jnp.asarray(lEf),
                           jnp.asarray(lIf), jnp.asarray(1.0),
                           nlp.consts_dev())
s_r = np.maximum(sf, 1e-12)
Sig = np.where(lIf / s_r < 0.0, Muf / (s_r * s_r), lIf / s_r)
sig_tilde = jnp.asarray(Sig / (1.0 + 1e-10 * Sig))
jblk = jax.jit(kkt._blocks_impl)
blocks = jax.block_until_ready(jblk(fam, sig_tilde))

with jax.default_device(cpu):
    fam_c = jad(jnp.asarray(xf), jnp.asarray(lEf), jnp.asarray(lIf),
                jnp.asarray(1.0),
                tuple(tuple(jnp.asarray(np.asarray(c)) for c in g)
                      for g in nlp.consts_dev()))[4]
    blocks_c = jax.block_until_ready(jblk(fam_c, sig_tilde))

mE = nlp.numEq
print(f"mE {mE}", flush=True)


def build_factor(rel):
    os.environ["ASSET_PIVOT_REL"] = str(rel)
    os.environ["ASSET_PIVOT_REL_CPU"] = "0"

    def f(blocks, delta):
        return kkt._factor_blocks_impl(blocks, delta, jnp.asarray(1e-10))
    return jax.jit(f)


jf_rel = build_factor(1e-12)
jf_0 = build_factor(0.0)
jf_cpu = build_factor(0.0)

rhs_x = -np.asarray(rd)
rhs_E = -np.asarray(cE)
jsol = jax.jit(kkt._solve_impl)

diag_n, lower_n, B_n, C_n = [np.asarray(b) for b in blocks_c]
perm = kkt._perm
K, W, b = bs.K, bs.W, bs.b


def lin_resid(dx, dlamE, delta):
    dn = diag_n + np.where(kkt._diag_sign > 0, delta,
                           np.where(kkt._diag_sign < 0, -1e-10, 0.0)) \
        + kkt._diag_fix
    Cn = C_n + np.where(kkt._c_sign > 0, delta,
                        np.where(kkt._c_sign < 0, -1e-10, 0.0))
    full = np.zeros(K * W + b)
    full[perm] = np.concatenate([np.asarray(dx), np.asarray(dlamE)])
    y = full[:K * W].reshape(K, W)
    z = full[K * W:]
    outd = np.einsum("kij,kj->ki", dn, y)
    outd[1:] += np.einsum("kij,kj->ki", lower_n[:-1], y[:-1])
    outd[:-1] += np.einsum("kij,ki->kj", lower_n[:-1], y[1:])
    if b:
        outd += np.einsum("kib,b->ki", B_n, z)
        outb = np.einsum("kib,ki->b", B_n, y) + Cn @ z
    else:
        outb = np.zeros(0)
    rfull = np.zeros(K * W + b)
    rfull[perm] = np.concatenate([rhs_x, rhs_E])
    res = np.concatenate([outd.ravel(), outb]) - rfull
    return np.linalg.norm(res) / np.linalg.norm(rfull)


for delta in (0.0, 1e-5, 1e-4, 1e-3):
    d = jnp.asarray(delta)
    fac_r, n_r = jf_rel(blocks, d)
    fac_z, n_z = jf_0(blocks, d)
    with jax.default_device(cpu):
        fac_c, n_c = jf_cpu(blocks_c, d)
    n_r, n_z, n_c = int(n_r), int(n_z), int(n_c)
    dx_t, dl_t = jsol(fac_r, jnp.asarray(rhs_x), jnp.asarray(rhs_E))
    with jax.default_device(cpu):
        dx_c, dl_c = jsol(fac_c, jnp.asarray(rhs_x), jnp.asarray(rhs_E))
    dd = float(jnp.linalg.norm(dx_t - dx_c) / jnp.linalg.norm(dx_c))
    print(f"delta {delta:g}: neigs tpu(rel) {n_r - mE:+d}  "
          f"tpu(0) {n_z - mE:+d}  cpu {n_c - mE:+d}  (vs mE)  "
          f"|dx_t-dx_c|/|dx_c| {dd:.2e}  "
          f"linres tpu {lin_resid(dx_t, dl_t, delta):.2e} "
          f"cpu {lin_resid(dx_c, dl_c, delta):.2e}", flush=True)

print("DIAG2 DONE", flush=True)
