"""Lookup-Free Quantization (LFQ): sign-binarization into bit tokens.

Parity target: reference modeling/quantizer/lookup_free.py:11-142.
  * sign-binarize each latent channel to ±1,
  * token index = LSB-first bit pack (no embedding table anywhere),
  * commitment loss + (training-only) full-codebook entropy loss,
  * straight-through estimator.

TPU-first: operates on NHWC latents, entropy streams over codebook chunks
(see ops/entropy.py) instead of materializing the 2^K affinity matrix.
"""

from __future__ import annotations

from typing import Mapping, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from maskbit_tpu.ops import bitops
from maskbit_tpu.ops.entropy import lfq_entropy_terms


class LookupFreeQuantizer(nn.Module):
    """Embedding-free quantizer over K-bit sign codes (no parameters)."""

    token_bits: int = 10
    commitment_cost: float = 0.25
    entropy_loss_weight: float = 0.1
    entropy_loss_temperature: float = 0.01
    entropy_gamma: float = 1.0
    entropy_chunk_size: int = 4096

    @property
    def codebook_size(self) -> int:
        return 2**self.token_bits

    def __call__(
        self, z: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, Mapping[str, jnp.ndarray]]:
        """Quantize NHWC latents (b, h, w, K) to ±1 codes.

        Returns (z_quantized, result_dict); result_dict keys mirror the
        reference (`quantizer_loss`, `commitment_loss`, `entropy_loss`,
        `per_sample_entropy`, `avg_entropy`, `min_encoding_indices`).
        """
        z = z.astype(jnp.float32)
        z_quantized = jnp.where(z > 0.0, 1.0, -1.0)

        min_encoding_indices = bitops.bits_to_indices(z_quantized)

        commitment_loss = self.commitment_cost * jnp.mean(
            (lax.stop_gradient(z_quantized) - z) ** 2
        )
        zero = jnp.zeros((), jnp.float32)
        per_sample_entropy, avg_entropy, entropy_loss = zero, zero, zero
        if self.entropy_loss_weight != 0.0 and train:
            per_sample_entropy, avg_entropy = lfq_entropy_terms(
                z,
                self.token_bits,
                self.entropy_loss_temperature,
                self.entropy_gamma,
                self.entropy_chunk_size,
            )
            entropy_loss = self.entropy_loss_weight * (per_sample_entropy - avg_entropy)

        loss = commitment_loss + entropy_loss

        # straight-through estimator
        z_quantized = z + lax.stop_gradient(z_quantized - z)

        result_dict = dict(
            quantizer_loss=loss,
            commitment_loss=commitment_loss,
            entropy_loss=entropy_loss,
            per_sample_entropy=per_sample_entropy,
            avg_entropy=avg_entropy,
            min_encoding_indices=min_encoding_indices,
        )
        return z_quantized, result_dict

    def get_codebook_entry(self, indices: jnp.ndarray) -> jnp.ndarray:
        """Indices (...,) -> ±1 bit codes (..., K)."""
        return bitops.indices_to_bits(indices, self.token_bits)

    def convert_bits_to_indices(self, tokens: jnp.ndarray) -> jnp.ndarray:
        return bitops.bits_to_indices(tokens)

    def convert_indices_to_bits(self, indices: jnp.ndarray) -> jnp.ndarray:
        return self.get_codebook_entry(indices)
