"""Compare pivot sequences: Pallas f32 GJ vs XLA f32 GJ vs dd-f64 GJ on
the real Ruiz-scaled KKT blocks (are Mosaic's pivots corrupt?)."""
import sys
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
from asset_asrl_tpu.Solvers.pallas_kernels import batched_gj_inverse

nsegs = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
phase = bench.build_phase(nsegs)
phase.transcribe()
kkt = phase.optimizer.kkt
nlp = kkt.nlp
opt = phase.optimizer
x, s, lamE, lamI = opt._init_state(phase.makeSolverInput(), opt.initMu)
consts = nlp.consts_dev()
_, _, _, _, fam = jax.jit(kkt._ad_impl)(x, lamE, lamI, jnp.asarray(1.0),
                                        consts)
st = jnp.ones((nlp.numIq,))
diag, lower, B, C = jax.jit(kkt._blocks_impl)(fam, st)
dreg = diag + jnp.where(kkt._diag_sign > 0, 1e-5,
                        jnp.where(kkt._diag_sign < 0, -1e-10, 0.0)) \
    + kkt._diag_fix
Creg = C + jnp.where(kkt._c_sign > 0, 1e-5,
                     jnp.where(kkt._c_sign < 0, -1e-10, 0.0))
dq, lq, Bq, Cq, sc, sb = jax.jit(KB._ruiz_equilibrate)(dreg, lower, B,
                                                       Creg)
# odd blocks of level 0 (what bcr_factor eliminates first)
d_odd = jax.block_until_ready(dq[1::2])
print("blocks:", d_odd.shape, flush=True)

_, p64 = jax.jit(KB._inv_gj_pivots)(d_odd)
d32 = d_odd.astype(jnp.float32)
_, p32x = jax.jit(lambda D: KB._inv_gj_pivots(D))(d32)
_, p32p = jax.jit(batched_gj_inverse)(d32)
p64 = np.asarray(p64)
p32x = np.asarray(p32x)
p32p = np.asarray(p32p)
for nm, p in (("f64", p64), ("f32_xla", p32x), ("f32_pallas", p32p)):
    print(f"{nm}: neg {int((p < 0).sum())}  "
          f"min|p| {np.abs(p).min():.2e}  max|p| {np.abs(p).max():.2e}",
          flush=True)
print("xla vs f64 sign mismatches:",
      int(((p32x < 0) != (p64 < 0)).sum()), flush=True)
print("pallas vs f64 sign mismatches:",
      int(((p32p < 0) != (p64 < 0)).sum()), flush=True)
print("pallas vs xla value maxdiff:",
      float(np.max(np.abs(p32p - p32x))), flush=True)
print("PIVDIAG DONE", flush=True)
