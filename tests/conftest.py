"""Test environment: force CPU JAX with a simulated 8-device mesh.

Multi-chip sharding paths are validated on virtual CPU devices
(``--xla_force_host_platform_device_count``); the real-TPU path is exercised
by ``bench.py`` and the driver's compile checks.
"""

import os
import sys

# Hard override: the host environment pins JAX_PLATFORMS=axon (the tunneled
# TPU) and a sitecustomize registers that backend in every process; tests
# must compile locally on CPU, so force it at both the env and config level.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compilation cache: makes repeated test runs compile-free.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ahocorasick_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
