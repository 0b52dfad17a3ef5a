"""Test harness config.

Force JAX onto a virtual 8-device CPU mesh BEFORE jax is imported anywhere,
so sharding/collective tests exercise real multi-device paths without TPU
hardware (the TPU answer to "test multi-node without a real cluster",
SURVEY.md §4).
"""

import os
import sys

# Hard override: the shell env may pin JAX_PLATFORMS to the real TPU tunnel
# (e.g. "axon"); tests must stay hermetic and fast on virtual CPU devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Repo root on sys.path so `import memex_tpu` works without installation.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# A site plugin may have force-registered a hardware backend and overridden
# jax_platforms at interpreter startup; flip back to the virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
