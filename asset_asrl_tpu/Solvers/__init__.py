"""asset_asrl_tpu.Solvers — NLP assembly + PSIOPT interior-point solver.

Reference: `src/Solvers/` (NonLinearProgram, PSIOPT, OptimizationProblem,
Jet batch runner).
"""

from .nlp import NonLinearProgram, IndexedFunction
from .psiopt import PSIOPT, ConvergenceFlags
from .optprob import OptimizationProblem
from .jet import Jet
