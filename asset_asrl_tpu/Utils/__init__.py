"""asset_asrl_tpu.Utils — misc support (reference `src/Utils/` + `asset.Utils`
bindings: core counts, timers)."""

import os
import time


def get_core_count():
    return os.cpu_count() or 1


class Timer:
    """Perf timer (reference `src/Utils/Timer.h`)."""

    def __init__(self):
        self._t0 = None
        self._acc = 0.0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is not None:
            self._acc += time.perf_counter() - self._t0
            self._t0 = None

    def count(self):
        return self._acc

    def reset(self):
        self._acc = 0.0
        self._t0 = None


class Profiler:
    """JAX profiler integration (SURVEY section 5.1): traces device
    execution for TensorBoard / xprof.

        with ast.Utils.Profiler("/tmp/trace"):
            phase.optimize()

    On remote-runtime TPU platforms where the profiler service is
    unavailable the context degrades to a wall-clock Timer (read
    `.elapsed` after exit) instead of failing the solve.
    """

    def __init__(self, logdir="/tmp/asset_trace"):
        self.logdir = str(logdir)
        self.elapsed = None
        self._active = False
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        try:
            import jax
            jax.profiler.start_trace(self.logdir)
            self._active = True
        except Exception:
            self._active = False
        return self

    def __exit__(self, *exc):
        if self._active:
            try:
                import jax
                jax.profiler.stop_trace()
            except Exception:
                pass
        self.elapsed = time.perf_counter() - self._t0
        return False
