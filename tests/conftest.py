"""Test configuration: force CPU platform with an 8-device virtual mesh.

Multi-chip sharding tests run on a virtual CPU mesh
(xla_force_host_platform_device_count=8); the real-TPU path is exercised by
bench.py / the driver.  This must run before any jax backend is initialized.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# sitecustomize may have registered the axon TPU plugin and pinned
# jax_platforms to "axon,cpu"; tests always run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
