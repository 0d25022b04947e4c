"""Generic (non-ODE) optimization problem.

Reference: `src/Solvers/OptimizationProblem.{h,cpp}` — user attaches
VectorFunctions as objectives / equality / inequality constraints applied at
explicit variable-index lists; `optimize()` returns the convergence flag and
`returnVars()` the solution.
"""

from __future__ import annotations

import numpy as np

from ..VectorFunctions.function import VectorFunction
from .nlp import NonLinearProgram, IndexedFunction
from .psiopt import PSIOPT, ConvergenceFlags

__all__ = ["OptimizationProblem"]


def _index_matrix(func, indices):
    """Normalize user index argument into (napps, IRows) int array."""
    idx = np.asarray(indices, dtype=np.int32)
    if idx.ndim == 1:
        idx = idx[None, :]
    if idx.shape[1] != func.IRows():
        raise ValueError(
            f"index list width {idx.shape[1]} != function input size "
            f"{func.IRows()}")
    return idx


class OptimizationProblem:

    def __init__(self):
        self.optimizer = PSIOPT()
        self._vars = None
        self._objs = []
        self._eqs = []
        self._iqs = []
        self.Threads = 1
        self.JetJobMode = "optimize"

    # ----------------------------------------------------------------- vars
    def setVars(self, x):
        self._vars = np.asarray(x, dtype=np.float64).ravel()

    def returnVars(self):
        return np.asarray(self._vars)

    def numVars(self):
        return 0 if self._vars is None else self._vars.size

    # ------------------------------------------------------------- functions
    def addObjective(self, func: VectorFunction, indices):
        if func.ORows() != 1:
            raise ValueError("objective must be scalar-valued")
        self._objs.append((func, _index_matrix(func, indices)))

    def addEqualCon(self, func: VectorFunction, indices):
        self._eqs.append((func, _index_matrix(func, indices)))

    def addInequalCon(self, func: VectorFunction, indices):
        self._iqs.append((func, _index_matrix(func, indices)))

    # ---------------------------------------------------------------- solve
    def _transcribe(self):
        nlp = NonLinearProgram(self.numVars())
        for f, idx in self._objs:
            nlp.addObjective(IndexedFunction(f, idx, name="obj"))
        for f, idx in self._eqs:
            nlp.addEqualCon(IndexedFunction(f, idx, name="eq"))
        for f, idx in self._iqs:
            nlp.addInequalCon(IndexedFunction(f, idx, name="iq"))
        nlp.freeze()
        self.optimizer.setNLP(nlp)

    def _call(self, method):
        if self._vars is None:
            raise ValueError("setVars() must be called before solving")
        self._transcribe()
        self._vars = getattr(self.optimizer, method)(self._vars)
        return self.optimizer.ConvergeFlag

    def optimize(self):
        return self._call("optimize")

    def solve(self):
        return self._call("solve")

    def solve_optimize(self):
        return self._call("solve_optimize")

    def solve_optimize_solve(self):
        return self._call("solve_optimize_solve")

    def optimize_solve(self):
        return self._call("optimize_solve")

    # Jet batch hook (reference OptimizationProblemBase::jet_run)
    def jet_run(self):
        return self._call({"optimize": "optimize", "solve": "solve",
                           "solve_optimize": "solve_optimize"}.get(
                               self.JetJobMode, "optimize"))

    def setThreads(self, *args):
        pass  # thread counts are meaningless on the XLA backend

    def setJetJobMode(self, mode):
        self.JetJobMode = mode
