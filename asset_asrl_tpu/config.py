"""Global configuration for the TPU-native ASSET reimplementation.

The reference (AlabamaASRL/asset_asrl) is a double-precision C++ library; the
interior-point solver needs f64 bookkeeping, so we enable x64 on import.  The
hot KKT factorization path can still run blocks in f32 with iterative
refinement (see solvers/kkt), mirroring the reference's Pardiso refinement
knob (`src/Solvers/PSIOPT.h:146` QPRefSteps).
"""

import jax

jax.config.update("jax_enable_x64", True)

# Ensure a host CPU backend exists alongside any accelerator platform
# (JAX_PLATFORMS=axon alone would exclude it): setup work — sparsity
# probing, auto-scaling probes, initial-state evaluation — is pinned to
# CPU, and without this it silently lands on the accelerator where every
# tiny probe jit pays a remote compile round trip (~60 s each through a
# TPU tunnel; transcription of a 5000-segment phase went 560 s -> 25 s).
try:
    _plats = jax.config.jax_platforms
    if _plats and "cpu" not in str(_plats).split(","):
        jax.config.update("jax_platforms", str(_plats) + ",cpu")
except Exception:
    pass

# Persistent compilation cache: XLA compiles for this TPU go through a
# remote service and routinely take minutes for the fused solver graphs;
# caching makes repeated bench/test runs start in seconds.  The directory
# is keyed by the host CPU flags: XLA:CPU stores AOT-compiled code whose
# machine features must match the executing host (a cache written on a
# different machine type aborts with SIGILL-class faults at run time).
try:
    import hashlib
    _feat = ""
    try:
        with open("/proc/cpuinfo") as _f:
            for _line in _f:
                if _line.startswith("flags"):
                    _feat = _line
                    break
    except OSError:
        pass
    _tag = hashlib.sha1(_feat.encode()).hexdigest()[:10]
    jax.config.update("jax_compilation_cache_dir",
                      f"/root/.cache/jax_comp_cache_{_tag}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:  # older jax without the knobs
    pass

# Default floating point dtype for all solver math.
import jax.numpy as jnp  # noqa: E402

DEFAULT_DTYPE = jnp.float64


def default_dtype():
    return DEFAULT_DTYPE
