"""Jet: ensemble/batch execution of many optimization problems.

Reference: `src/Solvers/Jet.h` — a thread pool mapping a problem generator
over argument tuples, tallying convergence flags.  Here problems run through
the XLA backend; structurally identical problems share compiled kernels (the
same family closures hit the jit cache), which replaces the reference's
1-MKL-thread-per-problem model.  A fully vmapped scenario-batch path (one
compiled solve over a stacked problem axis, shardable over a device mesh)
is provided by `asset_asrl_tpu.parallel` for phases with identical structure.
"""

from __future__ import annotations

import numpy as np

__all__ = ["Jet", "map"]


class Jet:

    @staticmethod
    def map(gen, args, nthreads=1, verbose=False, jobmode=None):
        """Build a problem per argument tuple and run its jet job.

        gen: callable(*arg) -> problem (phase/ocp/OptimizationProblem), or a
        list of already-built problems.  Returns the problems, as the
        reference does (`Jet.h:92` — per-problem flags live on each problem's
        optimizer; a tally is printed when verbose).
        """
        problems = []
        if callable(gen):
            for a in args:
                if not isinstance(a, (list, tuple)):
                    a = (a,)
                problems.append(gen(*a))
        else:
            problems = list(gen)
        flags = []
        for i, p in enumerate(problems):
            if jobmode is not None and hasattr(p, "setJetJobMode"):
                p.setJetJobMode(jobmode)
            flags.append(p.jet_run())
        if verbose:
            tally = {}
            for f in flags:
                tally[f] = tally.get(f, 0) + 1
            print(f"Jet: {len(problems)} problems, flags {tally}")
        return problems


def map(gen, args, nthreads=1, verbose=False):  # noqa: A001 - ref free func
    return Jet.map(gen, args, nthreads, verbose)
