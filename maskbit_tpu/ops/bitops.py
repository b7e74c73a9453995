"""Bit-token primitives: LFQ packing and factorized-codebook split/combine.

These are the invariant-rich integer ops at the heart of MaskBit.  Semantics
are bit-exact with the reference:
  * LSB-first packing, bits represented as {-1, +1} floats
    (reference: modeling/quantizer/lookup_free.py:38-43,96-142)
  * factorized split/combine via shift/mask
    (reference: modeling/modules/factorization.py:7-46)

Everything here is shape-static integer/VPU work that XLA fuses into
neighbouring kernels; there is no embedding table anywhere.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def bit_weights(num_bits: int) -> jnp.ndarray:
    """[2^0, 2^1, ..., 2^(K-1)] — LSB-first place values."""
    return jnp.left_shift(jnp.int32(1), jnp.arange(num_bits, dtype=jnp.int32))


def bits_to_indices(bits: jnp.ndarray) -> jnp.ndarray:
    """Pack ±1 bits (..., K) into int32 token indices (...,). LSB-first.

    Any strictly positive value counts as a 1-bit (matching the reference's
    ``tokens > 0`` sign test).
    """
    num_bits = bits.shape[-1]
    on = (bits > 0).astype(jnp.int32)
    return jnp.sum(on * bit_weights(num_bits), axis=-1)


def indices_to_bits(indices: jnp.ndarray, num_bits: int, dtype=jnp.float32) -> jnp.ndarray:
    """Unpack int token indices (...,) into ±1 bits (..., K). LSB-first."""
    idx = indices.astype(jnp.int32)[..., None]
    bits01 = jnp.right_shift(idx, jnp.arange(num_bits, dtype=jnp.int32)) & 1
    return (bits01 * 2 - 1).astype(dtype)


def codebook(num_bits: int, dtype=jnp.float32) -> jnp.ndarray:
    """The implicit LFQ codebook: all 2^K sign patterns, shape (2^K, K)."""
    return indices_to_bits(jnp.arange(2**num_bits, dtype=jnp.int32), num_bits, dtype)


def split_factorized_tokens(tokens: jnp.ndarray, codebook_size: int, splits: int) -> jnp.ndarray:
    """Split K-bit indices (..., n) into `splits` groups of K/splits bits.

    Returns (..., n, splits), group i holding bits [i*K/m, (i+1)*K/m) —
    i.e. group 0 is the least-significant chunk.
    """
    bit_shift = int(math.log2(codebook_size)) // splits
    bit_mask = (1 << bit_shift) - 1
    tokens = tokens.astype(jnp.int32)
    shifts = jnp.arange(splits, dtype=jnp.int32) * bit_shift
    return jnp.right_shift(tokens[..., None], shifts) & bit_mask


def combine_factorized_tokens(tokens: jnp.ndarray, codebook_size: int, splits: int) -> jnp.ndarray:
    """Inverse of `split_factorized_tokens`: (..., n, splits) -> (..., n)."""
    bit_shift = int(math.log2(codebook_size)) // splits
    tokens = tokens.astype(jnp.int32)
    shifts = jnp.arange(splits, dtype=jnp.int32) * bit_shift
    return jnp.sum(jnp.left_shift(tokens, shifts), axis=-1)
