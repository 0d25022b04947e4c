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
