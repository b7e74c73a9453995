"""Driver for the SIGTERM preemption test: run the REAL train_tokenizer CLI
on the CPU platform (the axon site hook would otherwise re-export the TPU
platform; env vars alone cannot override it, so set jax.config first)."""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from maskbit_tpu.cli.train_tokenizer import main

if __name__ == "__main__":
    main([f"config={sys.argv[1]}"])
    print("train worker exited cleanly", flush=True)
