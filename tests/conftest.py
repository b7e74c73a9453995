"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the standard JAX trick for multi-device coverage without TPUs:
XLA_FLAGS=--xla_force_host_platform_device_count=8 gives real pjit /
collective execution over 8 host-backed devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even when an axon TPU is attached
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# the axon site hook re-exports JAX_PLATFORMS=axon; override at config level
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite is compile-dominated (~14 min cold);
# warm runs reuse executables across processes
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

# Parity tests compare against float32 PyTorch: force full-precision matmuls
# (JAX's default matmul precision is bf16-class even on CPU).
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
