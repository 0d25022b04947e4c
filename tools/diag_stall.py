"""TPU stall diagnosis at bench scale (2500 segs).

CPU converges in 11 iters; TPU stalls at kkt~6e-3 after 101 iters.  This
script isolates where TPU numerics diverge from CPU: f64 effective
precision probes, then a ladder of TPU-vs-CPU comparisons (AD values,
assembled blocks, Newton solve) at the stalled iterate, and finally an
FGMRES-refined f64 solve to test whether solve-side refinement recovers
the Newton direction.
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

from asset_asrl_tpu.Solvers import kkt_block as KB
from asset_asrl_tpu.Solvers.fused import build_fused_alg

nsegs = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
cpu = jax.devices("cpu")[0]
print("backend", jax.default_backend(), flush=True)

# ---- 0. tiny probe + f64 precision probes -------------------------------
t0 = time.time()
r = jnp.asarray(np.eye(8)) @ jnp.asarray(np.eye(8))
jax.block_until_ready(r)
print("probe matmul ok", round(time.time() - t0, 1), "s", flush=True)


@jax.jit
def _eps_probe(one):
    ks = jnp.arange(20, 60, dtype=jnp.float64)
    return ((one + 2.0 ** (-ks)) - one) != 0.0


nz = np.asarray(_eps_probe(jnp.asarray(1.0)))
print("f64 add mantissa bits (TPU):", 20 + int(np.where(nz)[0].max()),
      flush=True)

x_t = np.linspace(0.1, 6.0, 1024)


@jax.jit
def _trig(v):
    return jnp.sin(v), jnp.cos(v), jnp.log(v), jnp.exp(-v)


outs = _trig(jnp.asarray(x_t))
names = ["sin", "cos", "log", "exp-"]
refs = [np.sin(x_t), np.cos(x_t), np.log(x_t), np.exp(-x_t)]
for nm, o, rr in zip(names, outs, refs):
    err = np.max(np.abs(np.asarray(o) - rr) / np.maximum(np.abs(rr), 1e-30))
    print(f"f64 {nm} max rel err vs host: {err:.2e}", flush=True)

# dot product precision
rng = np.random.default_rng(0)
a = rng.normal(size=4096)
b = rng.normal(size=4096)


@jax.jit
def _dot(a, b):
    return a @ b


dt = float(_dot(jnp.asarray(a), jnp.asarray(b)))
dh = float(np.dot(a, b))
print(f"f64 dot rel err vs host: {abs(dt - dh) / abs(dh):.2e}", flush=True)

# ---- 1. build + fused solve to get the stalled state --------------------
t0 = time.time()
phase = bench.build_phase(nsegs)
phase.transcribe()
print("transcribe", round(time.time() - t0, 1), "s", flush=True)
opt = phase.optimizer
kkt = opt.kkt
nlp = kkt.nlp
bs = kkt.bs
print("K", bs.K, "W", bs.W, "b", bs.b, flush=True)

fn = build_fused_alg(kkt, opt._opts_snapshot(), "OPT")
x0, s0, lamE0, lamI0 = opt._init_state(phase.makeSolverInput(), opt.initMu)
mu0 = jnp.asarray(opt.initMu)
consts = nlp.consts_dev()
t0 = time.time()
out = fn(x0, s0, lamE0, lamI0, mu0, consts)
jax.block_until_ready(out[0])
ni = int(out[6])
print(f"fused: flag {int(out[5])} iters {ni} ({time.time() - t0:.1f}s)",
      flush=True)
infos = np.asarray(out[7][:max(ni, 1)])
print("last info (obj kkt econ icon barr mu alpha nfacs hpert):",
      " ".join(f"{v:.3e}" for v in infos[-1]), flush=True)

xf = np.asarray(out[0])
sf = np.asarray(out[1])
lEf = np.asarray(out[2])
lIf = np.asarray(out[3])
Muf = float(np.asarray(out[4]))

# ---- 2. ladder: AD -> blocks -> solve, TPU vs CPU -----------------------
consts_np = tuple(tuple(np.asarray(c) for c in g) for g in consts)
sig = 1.0

jad = jax.jit(kkt._ad_impl)


def run_ad(dev):
    with jax.default_device(dev):
        return jad(jnp.asarray(xf), jnp.asarray(lEf), jnp.asarray(lIf),
                   jnp.asarray(sig),
                   tuple(tuple(jnp.asarray(c) for c in g)
                         for g in consts_np))


obj_t, cE_t, cI_t, rd_t, fam_t = jax.block_until_ready(run_ad(None))
obj_c, cE_c, cI_c, rd_c, fam_c = jax.block_until_ready(run_ad(cpu))
print(f"AD: obj rel diff {abs(float(obj_t - obj_c)) / abs(float(obj_c)):.2e}",
      flush=True)
print(f"AD: max|cE diff| {float(jnp.max(jnp.abs(cE_t - cE_c))):.2e} "
      f"(|cE| max {float(jnp.max(jnp.abs(cE_c))):.2e})", flush=True)
print(f"AD: max|rd diff| {float(jnp.max(jnp.abs(rd_t - rd_c))):.2e} "
      f"(|rd| max {float(jnp.max(jnp.abs(rd_c))):.2e})", flush=True)
for kk in ("jx_eq", "hx_eq", "jx_iq", "hx_obj"):
    for i, (a_, b_) in enumerate(zip(fam_t[kk], fam_c[kk])):
        if a_ is None:
            continue
        d = float(jnp.max(jnp.abs(a_ - b_)))
        m = float(jnp.max(jnp.abs(b_)))
        if d > 1e-13 * max(m, 1.0):
            print(f"AD: {kk}[{i}] max diff {d:.2e} (max {m:.2e})", flush=True)

# slack condensation diag at the stalled state
s_r = np.maximum(sf, 1e-12)
Sig = np.where(lIf / s_r < 0.0, Muf / (s_r * s_r), lIf / s_r)
sig_tilde = Sig / (1.0 + 1e-10 * Sig)
print(f"sig_tilde range [{sig_tilde.min():.2e}, {sig_tilde.max():.2e}]",
      flush=True)

jblk = jax.jit(kkt._blocks_impl)


def run_blocks(dev, fam):
    with jax.default_device(dev):
        return jblk(fam, jnp.asarray(sig_tilde))


blocks_t = jax.block_until_ready(run_blocks(None, fam_t))
blocks_c = jax.block_until_ready(run_blocks(cpu, fam_c))
for nm, bt, bc in zip(("diag", "lower", "B", "C"), blocks_t, blocks_c):
    d = float(jnp.max(jnp.abs(bt - bc))) if bt.size else 0.0
    m = float(jnp.max(jnp.abs(bc))) if bc.size else 0.0
    print(f"blocks {nm}: max diff {d:.2e} (max {m:.2e})", flush=True)

# ---- 3. factor+solve comparison at fixed delta --------------------------
delta = 1e-5
gammaE = 1e-10
jfac = jax.jit(kkt._factor_blocks_impl)
jsol = jax.jit(kkt._solve_impl)

rhs_x = -np.asarray(rd_c)
rhs_E = -np.asarray(cE_c)


def run_solve(dev, blocks):
    with jax.default_device(dev):
        fac, neigs = jfac(blocks, jnp.asarray(delta), jnp.asarray(gammaE))
        dx, dlamE = jsol(fac, jnp.asarray(rhs_x), jnp.asarray(rhs_E))
        return jax.block_until_ready((fac, neigs, dx, dlamE))


fac_t, neigs_t, dx_t, dlE_t = run_solve(None, blocks_t)
fac_c, neigs_c, dx_c, dlE_c = run_solve(cpu, blocks_c)
print(f"neigs: tpu {int(neigs_t)} cpu {int(neigs_c)} (mE {nlp.numEq})",
      flush=True)
nrm = float(jnp.linalg.norm(dx_c))
print(f"solve: |dx_cpu| {nrm:.3e}  "
      f"|dx_t-dx_c|/|dx_c| {float(jnp.linalg.norm(dx_t - dx_c)) / nrm:.2e}",
      flush=True)

# ground-truth linear residual via numpy block matvec (CPU blocks)
diag_n, lower_n, B_n, C_n = [np.asarray(b) for b in blocks_c]
diag_n = diag_n + np.where(kkt._diag_sign > 0, delta,
                           np.where(kkt._diag_sign < 0, -gammaE, 0.0)) \
    + kkt._diag_fix
C_n = C_n + np.where(kkt._c_sign > 0, delta,
                     np.where(kkt._c_sign < 0, -gammaE, 0.0))
K, W, b = bs.K, bs.W, bs.b
perm = kkt._perm


def matvec(y, z):
    outd = np.einsum("kij,kj->ki", diag_n, y)
    outd[1:] += np.einsum("kij,kj->ki", lower_n[:-1], y[:-1])
    outd[:-1] += np.einsum("kij,ki->kj", lower_n[:-1], y[1:])
    outb = np.zeros(b)
    if b:
        outd += np.einsum("kib,b->ki", B_n, z)
        outb = np.einsum("kib,ki->b", B_n, y) + C_n @ z
    return outd, outb


def lin_resid(dx, dlamE):
    full = np.zeros(K * W + b)
    full[perm] = np.concatenate([np.asarray(dx), np.asarray(dlamE)])
    y = full[:K * W].reshape(K, W)
    z = full[K * W:]
    ry, rz = matvec(y, z)
    rfull = np.zeros(K * W + b)
    rfull[perm] = np.concatenate([rhs_x, rhs_E])
    res = np.concatenate([ry.ravel(), rz]) - rfull
    return np.linalg.norm(res) / max(np.linalg.norm(rfull), 1e-30)


print(f"linres cpu: {lin_resid(dx_c, dlE_c):.2e}", flush=True)
print(f"linres tpu: {lin_resid(dx_t, dlE_t):.2e}", flush=True)

# ---- 4. FGMRES-refined f64 solve on TPU ---------------------------------
ones_s = jnp.ones((K, W)), jnp.ones((b,))


@jax.jit
def solve_ref(fac, blocks, rx, rE):
    fac2 = dict(fac)
    fac2["blocks64"] = blocks
    fac2["scale"] = ones_s
    return kkt._solve_impl(fac2, rx, rE)


dx_r, dlE_r = jax.block_until_ready(
    solve_ref(fac_t, blocks_t, jnp.asarray(rhs_x), jnp.asarray(rhs_E)))
print(f"refined solve: |dx_r-dx_c|/|dx_c| "
      f"{float(jnp.linalg.norm(dx_r - dx_c)) / nrm:.2e}  "
      f"linres {lin_resid(dx_r, dlE_r):.2e}", flush=True)

print("DIAG DONE", flush=True)
