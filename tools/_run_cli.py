"""Run a maskbit_tpu CLI module, optionally forced onto the CPU platform.

Used by tools/run_parity.sh. The axon site hook re-exports
JAX_PLATFORMS=axon at interpreter startup, so the platform can only be
forced via jax.config AFTER importing jax — env vars alone don't stick.
"""

import os
import runpy
import sys

if os.environ.get("MASKBIT_PARITY_FORCE_CPU") == "1":
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
    import jax

    jax.config.update("jax_platforms", "cpu")

module = sys.argv[1]
sys.argv = [module] + sys.argv[2:]
runpy.run_module(module, run_name="__main__")
