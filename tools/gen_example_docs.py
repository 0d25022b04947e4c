"""Generate docs/examples pages with measured timings.

Runs each flagship example as a subprocess on the host CPU backend
(x64), records wall time and the example's printed results, and writes
one markdown page per example plus an index, mirroring the reference's
Sphinx example pages with measured timings (`doc/examples/*.rst`).
"""

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "docs", "examples")

CASES = [
    ("CartPole", "examples/CartPole.py",
     "Swing-up of an inverted pendulum on a cart, minimum-effort control "
     "with a runtime mass-matrix inversion (64 LGL5 segments).",
     "12 IPM iterations, 28 ms on an i7-9750H "
     "(`doc/examples/CartPole.rst:143`); objective 58.832 "
     "(`test_CartPole.py:38`)."),
    ("Brachistochrone", "examples/Brachistochrone.py",
     "Classic minimum-time bead-on-wire problem.",
     "Analytic optimum ~0.998 s for the (0,0)->(1,-1) drop."),
    ("HyperSensitive", "examples/HyperSens.py",
     "Boundary-layer problem over a tf=10000 horizon; the classic "
     "adaptive-mesh benchmark (LGL7).",
     "8 mesh iterations, 46 ms total CPU on an i7-13700k "
     "(`doc/examples/HyperSensitive.rst:121`)."),
    ("Reentry", "examples/Reentry.py",
     "Space-shuttle reentry, maximum cross-range, with and without a "
     "leading-edge heating-rate constraint.",
     "90 ms total, objective 34.141 deg (Betts) on an i9-12900k; "
     "heat-constrained +24 iters, 60 ms, 30.63 deg "
     "(`doc/examples/ReentryExample.rst:283-285`)."),
    ("Delta3", "examples/Delta3Launch.py",
     "Delta III four-phase launch to GTO, maximum final mass, linked "
     "phases with per-phase thrust models (160 LGL3 segments).",
     "~60 ms on an i9-12900k (`doc/examples/Delta3.rst:340`); final "
     "mass 7529.7499 kg (`test_Delta3Launch.py:152`)."),
    ("MultiPhaseCannon", "examples/UpdatedInterface/MultiPhaseCannon.py",
     "Dymos multi-phase cannonball: choose the ball radius maximizing "
     "range at fixed launch energy (named-variable interface).",
     "Dymos reference optimum: ~3.18 km range at ~4.2 cm radius."),
]


def run_case(name, script, desc, ref):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=ROOT + os.pathsep + os.environ.get("PYTHONPATH",
                                                             ""))
    t0 = time.perf_counter()
    # _cpu_run pins the CPU backend in-process (the axon plugin ignores
    # the JAX_PLATFORMS environment variable)
    proc = subprocess.run([sys.executable,
                           os.path.join(ROOT, "tools", "_cpu_run.py"),
                           os.path.join(ROOT, script)],
                          capture_output=True, text=True, env=env,
                          timeout=3000, cwd=ROOT)
    dt = time.perf_counter() - t0
    lines = [ln for ln in proc.stdout.splitlines()
             if ln.strip() and "Platform" not in ln
             and "WARNING" not in ln]
    tail = "\n".join(lines[-14:])
    page = f"""# {name}

{desc}

Source: [`{script}`](../../{script})  |  Reference:
`/root/reference/{script.replace('examples/', 'examples/')}`

## Measured (this machine, host CPU backend, x64)

Wall time including transcription and XLA compilation:
**{dt:.1f} s** (first run; jit-cached reruns are dominated by the
solve itself — the per-iteration TPU numbers live in `BENCH_r*.json`).

```
{tail}
```

## Reference's published numbers

{ref}

The reference timings are hand-measured C++/MKL numbers on desktop
CPUs at these small mesh sizes, where per-iteration work is microseconds
and Pardiso is in-cache; the TPU design targets the large-mesh regime —
see `bench.py` (10,001 collocation nodes) and `docs/tutorials/
TPUArchitecture.md`.
"""
    with open(os.path.join(OUT, f"{name}.md"), "w") as f:
        f.write(page)
    ok = proc.returncode == 0
    print(f"{name}: {'OK' if ok else 'FAIL rc=' + str(proc.returncode)} "
          f"{dt:.1f}s")
    if not ok:
        print(proc.stdout[-2000:])
        print(proc.stderr[-2000:])
    return name, dt, ok


def main():
    os.makedirs(OUT, exist_ok=True)
    rows = []
    only = sys.argv[1:] if len(sys.argv) > 1 else None
    for name, script, desc, ref in CASES:
        if only and name not in only:
            continue
        rows.append(run_case(name, script, desc, ref))
    idx = ["# Worked examples (with measured timings)", "",
           "Each page runs the example end-to-end and records the",
           "printed results + wall time; regenerate with",
           "`python tools/gen_example_docs.py`.", "",
           "| Example | total wall (s, CPU backend, incl. compile) |",
           "|---|---|"]
    for name, dt, ok in rows:
        idx.append(f"| [{name}]({name}.md) | {dt:.1f} |")
    with open(os.path.join(OUT, "README.md"), "w") as f:
        f.write("\n".join(idx) + "\n")


if __name__ == "__main__":
    main()
