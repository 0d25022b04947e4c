"""Shuttle reentry max-crossrange with adaptive mesh (reference
`examples/MeshRefinement/Reentry.py`): known objectives 0.59588 rad
(unconstrained) per Betts."""

import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from Reentry import run_reentry  # noqa: E402


def run(nsegs=40, estimator="deboor", print_level=1):
    return run_reentry(nsegs=nsegs, adaptive=True, estimator=estimator,
                       print_level=print_level)


if __name__ == "__main__":
    out = run()
    print("MeshRefinement Reentry:", out)
