"""Debug wrong inertia / NaN solve at large segment counts."""
import sys
import time
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo")
import importlib.util
spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)
from asset_asrl_tpu.Solvers import kkt_block as KB

nsegs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
t0 = time.time()
phase = bench.build_phase(nsegs)
phase.transcribe()
print("transcribe", round(time.time() - t0, 1), flush=True)
opt = phase.optimizer
kkt = opt.kkt
bs = kkt.bs
nlp = kkt.nlp
print("K", bs.K, "W", bs.W, "b", bs.b, "mE", nlp.numEq, flush=True)

x, s, lamE, lamI = opt._init_state(phase.makeSolverInput(), opt.initMu)
consts = nlp.consts_dev()
sig = jnp.asarray(1.0)
obj, cE, cI, rd, famvals = jax.jit(kkt._ad_impl)(x, lamE, lamI, sig, consts)
sig_tilde = jnp.ones((nlp.numIq,))
blocks = jax.jit(kkt._blocks_impl)(famvals, sig_tilde)
diag, lower, B, C = blocks
print("block stats: |diag|max", float(jnp.abs(diag).max()),
      "|lower|max", float(jnp.abs(lower).max()),
      "finite", bool(jnp.isfinite(diag).all() & jnp.isfinite(lower).all()),
      flush=True)

for delta in [1e-5, 1e-4, 1e-3]:
    fac, neigs = jax.jit(kkt._factor_blocks_impl)(
        blocks, jnp.asarray(delta), jnp.asarray(1e-10))
    rhs_x = jnp.zeros((nlp.numPrimal,))
    dx, dlamE = jax.jit(kkt._solve_impl)(fac, rhs_x, -cE)
    print(f"delta={delta:g} neigs={int(neigs)} (want {nlp.numEq}) "
          f"dx finite={bool(jnp.isfinite(dx).all())} "
          f"|dx|={float(jnp.linalg.norm(dx)):.3e}", flush=True)

# locate bad pivots at the first BCR level
dq = diag + jnp.where(kkt._diag_sign > 0, 1e-4,
                      jnp.where(kkt._diag_sign < 0, -1e-10, 0.0)) \
    + kkt._diag_fix
d_odd = dq[1::2]
Dinv, pivs = KB._inv_gj_pivots(d_odd)
pn = np.asarray(pivs)
neg = (pn < 0).sum(axis=1)
# expected negatives per macro = number of eq-row slots in that macro
expected = np.array([(np.asarray(kkt._diag_sign)[k].diagonal() < 0).sum()
                     for k in range(bs.K)])[1::2]
bad = np.where(neg != expected)[0]
print("level0 odd blocks with wrong sign count:", len(bad), "of", len(pn),
      flush=True)
if len(bad):
    k = bad[0]
    print("first bad odd-block idx", k, "neg", neg[k], "expected",
          expected[k])
    print("pivots:", pn[k])
    print("diag of block:", np.asarray(d_odd)[k].diagonal())
