"""asset_asrl_tpu: a TPU-native (JAX/XLA/Pallas) trajectory-optimization
framework with the capabilities of AlabamaASRL/asset_asrl.

Drop-in namespace layout mirrors the reference python package
(`asset_asrl/__init__.py`):

    import asset_asrl_tpu as ast
    vf = ast.VectorFunctions
    oc = ast.OptimalControl
"""

from . import config  # noqa: F401 -- enables x64 before anything else
from . import VectorFunctions
from . import Solvers
from . import OptimalControl
from . import Astro
from . import Utils

__version__ = "0.1.0"
