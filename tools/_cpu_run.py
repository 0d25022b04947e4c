"""Run a python script pinned to the host CPU backend.

The axon TPU plugin rewrites jax_platforms regardless of JAX_PLATFORMS
in the environment; the only reliable pin is jax.config.update BEFORE
the first backend initialization (same trick as tests/conftest.py).
Usage: python tools/_cpu_run.py <script.py> [args...]
"""
import os
import runpy
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

path = sys.argv[1]
sys.argv = sys.argv[1:]
runpy.run_path(path, run_name="__main__")
