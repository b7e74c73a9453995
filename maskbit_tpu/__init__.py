"""maskbit_tpu: a TPU-native JAX/XLA/Pallas framework for embedding-free
image generation via bit tokens (MaskBit).

Re-designed from scratch for TPU hardware:
  * all compute paths are jit-compiled XLA programs (NHWC convs on the MXU,
    bf16-friendly transformer blocks, a single-`lax.scan` masked sampler),
  * scaling happens through `jax.sharding.Mesh` + NamedSharding (data /
    fsdp / tensor axes) rather than process-level DDP,
  * checkpointing uses Orbax with a PyTorch-compat weight converter.

Capability map mirrors the reference implementation of
"MaskBit: Embedding-free Image Generation via Bit Tokens" (TMLR 2024).
"""

__version__ = "0.1.0"

from maskbit_tpu.core.config import Config, load_config  # noqa: F401
