"""Classic vector quantization with a learned codebook.

Parity target: reference modeling/quantizer/quantizer.py:10-119
(`SimpleVectorizer`): nearest-neighbour lookup, optional L2-normalized
codes, commitment + codebook + entropy losses, straight-through estimator.

TPU-first: the distance computation is a single (rows, D) x (D, N) matmul
on the MXU; argmin and the one-hot gather fuse into it under XLA.
"""

from __future__ import annotations

from typing import Mapping, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from maskbit_tpu.ops.entropy import entropy_loss_fn


class SimpleVectorizer(nn.Module):
    codebook_size: int = 1024
    token_size: int = 256
    commitment_cost: float = 0.25
    entropy_loss_weight: float = 0.0
    entropy_loss_temperature: float = 0.01
    entropy_gamma: float = 1.0
    use_l2_normalisation: bool = False

    def setup(self):
        init = nn.initializers.uniform(scale=2.0 / self.codebook_size)
        # uniform(-1/N, 1/N): flax uniform is [0, scale); shift to center.
        self.embedding = self.param(
            "embedding",
            lambda key, shape: init(key, shape) - 1.0 / self.codebook_size,
            (self.codebook_size, self.token_size),
        )

    def __call__(
        self, z: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, Mapping[str, jnp.ndarray]]:
        """Quantize NHWC latents (b, h, w, D) against the codebook."""
        z = z.astype(jnp.float32)
        if self.use_l2_normalisation:
            z = _l2_normalize(z)
            embedding = _l2_normalize(self.embedding)
        else:
            embedding = self.embedding

        b, h, w, d = z.shape
        z_flat = z.reshape(-1, d)

        # ||z - e||^2 = ||z||^2 + ||e||^2 - 2 z.e — one MXU matmul.
        # Full f32 precision: nearest-neighbour argmin is sensitive to ties.
        distances = (
            jnp.sum(z_flat**2, axis=1, keepdims=True)
            + jnp.sum(embedding**2, axis=1)
            - 2.0 * jnp.matmul(z_flat, embedding.T, precision=lax.Precision.HIGHEST)
        )

        min_encoding_indices = jnp.argmin(distances, axis=1)
        z_quantized = jnp.take(embedding, min_encoding_indices, axis=0).reshape(z.shape)

        commitment_loss = self.commitment_cost * jnp.mean(
            (lax.stop_gradient(z_quantized) - z) ** 2
        )
        codebook_loss = jnp.mean((z_quantized - lax.stop_gradient(z)) ** 2)

        zero = jnp.zeros((), jnp.float32)
        per_sample_entropy, avg_entropy, entropy_loss = zero, zero, zero
        if self.entropy_loss_weight != 0.0 and train:
            per_sample_entropy, avg_entropy = entropy_loss_fn(
                -distances, self.entropy_loss_temperature, self.entropy_gamma
            )
            entropy_loss = self.entropy_loss_weight * (per_sample_entropy - avg_entropy)

        loss = commitment_loss + codebook_loss + entropy_loss

        # straight-through estimator
        z_quantized = z + lax.stop_gradient(z_quantized - z)

        result_dict = dict(
            quantizer_loss=loss,
            commitment_loss=commitment_loss,
            codebook_loss=codebook_loss,
            entropy_loss=entropy_loss,
            per_sample_entropy=per_sample_entropy,
            avg_entropy=avg_entropy,
            min_encoding_indices=min_encoding_indices.reshape(b, h, w),
        )
        return z_quantized, result_dict

    def get_codebook_entry(self, indices: jnp.ndarray) -> jnp.ndarray:
        z_quantized = jnp.take(self.embedding, indices.astype(jnp.int32), axis=0)
        if self.use_l2_normalisation:
            z_quantized = _l2_normalize(z_quantized)
        return z_quantized


def _l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Matches torch.nn.functional.normalize: x / max(||x||, eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)
