"""asset_asrl_tpu.Integrators — adaptive RK integrators (reference
`src/Integrators/`).  Populated in rk.py."""

try:
    from .rk import Integrator, RKCoeffs
except ImportError:  # rk.py not built yet
    Integrator = None
