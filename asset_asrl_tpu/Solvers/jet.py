"""Jet: ensemble/batch execution of many optimization problems.

Reference: `src/Solvers/Jet.h` — a thread pool mapping a problem generator
over argument tuples, tallying convergence flags with a progress bar.

Two execution paths, mirroring the reference's two layers of parallelism:

* `Jet.map(gen, args, nthreads)` — a REAL thread pool
  (`concurrent.futures`): jitted solves release the GIL during device
  execution, so transcription/compilation of one problem overlaps the
  device solve of another, and structurally identical problems share
  compiled executables through the jit cache (the analog of the
  reference's 1-MKL-thread-per-problem model, `Jet.h:113`).
* `asset_asrl_tpu.parallel.solve_ensemble` — the fully vmapped
  scenario-batch path for identical-structure problems: ONE compiled solve
  over a stacked problem axis, shardable over a device mesh (chips/hosts).
"""

from __future__ import annotations

import sys
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

__all__ = ["Jet", "map"]


class Jet:

    @staticmethod
    def map(gen, args, nthreads=4, verbose=False, jobmode=None):
        """Build a problem per argument tuple and run its jet job on a
        thread pool.

        gen: callable(*arg) -> problem (phase/ocp/OptimizationProblem), or a
        list of already-built problems.  Returns the problems (per-problem
        flags live on each problem's optimizer, as in the reference); a
        convergence tally is printed when verbose."""
        if callable(gen):
            built = []
            for a in args:
                if not isinstance(a, (list, tuple)):
                    a = (a,)
                built.append(gen(*a))
            problems = built
        else:
            problems = list(gen)
        for p in problems:
            if jobmode is not None and hasattr(p, "setJetJobMode"):
                p.setJetJobMode(jobmode)

        flags = [None] * len(problems)
        done = [0]
        lock = threading.Lock()

        def run(i):
            flags[i] = problems[i].jet_run()
            if verbose:
                with lock:
                    done[0] += 1
                    sys.stdout.write(
                        f"\rJet: {done[0]}/{len(problems)} done")
                    sys.stdout.flush()

        nthreads = max(1, int(nthreads))
        if nthreads == 1 or len(problems) <= 1:
            for i in range(len(problems)):
                run(i)
        else:
            with ThreadPoolExecutor(max_workers=nthreads) as pool:
                list(pool.map(run, range(len(problems))))
        if verbose:
            tally = {}
            for f in flags:
                tally[f] = tally.get(f, 0) + 1
            print(f"\nJet: {len(problems)} problems, flags {tally}")
        return problems


def map(gen, args, nthreads=4, verbose=False):  # noqa: A001 - ref free func
    return Jet.map(gen, args, nthreads, verbose)
