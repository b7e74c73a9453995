"""Bit-exactness properties for LFQ packing and factorization.

Ports the reference's inline self-tests:
  * lookup_free.py:146-163 — indices↔bits round trip over all codes
  * factorization.py:49-67 — split/combine inverse + shift/mask equivalence
"""

import jax.numpy as jnp
import numpy as np
import pytest

from maskbit_tpu.ops import bitops


@pytest.mark.parametrize("num_bits", [1, 5, 10, 12, 14, 18])
def test_indices_bits_round_trip(num_bits):
    all_codes = jnp.arange(2**min(num_bits, 12)).reshape(1, 1, -1)
    bits = bitops.indices_to_bits(all_codes, num_bits)
    assert bits.shape == all_codes.shape + (num_bits,)
    assert set(np.unique(np.asarray(bits))) <= {-1.0, 1.0}
    back = bitops.bits_to_indices(bits)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(all_codes))


def test_codebook_consistency():
    cb = bitops.codebook(10)
    assert cb.shape == (1024, 10)
    idx = bitops.bits_to_indices(cb.reshape(1, 1, 1024, 10))
    np.testing.assert_array_equal(np.asarray(idx).ravel(), np.arange(1024))


def test_lsb_first_packing():
    # index 1 must set the first (LSB) bit: bits = [+1, -1, -1, ...]
    bits = bitops.indices_to_bits(jnp.array([1]), 4)
    np.testing.assert_array_equal(np.asarray(bits[0]), [1.0, -1.0, -1.0, -1.0])
    # index 8 = 2^3 sets only the 4th bit
    bits = bitops.indices_to_bits(jnp.array([8]), 4)
    np.testing.assert_array_equal(np.asarray(bits[0]), [-1.0, -1.0, -1.0, 1.0])


def test_split_combine_inverse(rng):
    tokens = jnp.asarray(rng.integers(0, 1023, size=(1, 16)))
    split = bitops.split_factorized_tokens(tokens, 1024, 1)
    assert split.shape == (1, 16, 1)
    combined = bitops.combine_factorized_tokens(split, 1024, 1)
    np.testing.assert_array_equal(np.asarray(combined), np.asarray(tokens))

    split2 = bitops.split_factorized_tokens(tokens, 1024, 2)
    assert split2.shape == (1, 16, 2)
    combined2 = bitops.combine_factorized_tokens(split2, 1024, 2)
    np.testing.assert_array_equal(np.asarray(combined2), np.asarray(tokens))

    # explicit shift/mask equivalence (reference factorization.py:66-67)
    np.testing.assert_array_equal(
        np.asarray(tokens) >> 5, np.asarray(split2[..., 1])
    )
    np.testing.assert_array_equal(
        np.asarray(tokens) & 31, np.asarray(split2[..., 0])
    )


@pytest.mark.parametrize("num_bits,splits", [(12, 2), (14, 2), (18, 2), (12, 3)])
def test_split_combine_large(rng, num_bits, splits):
    tokens = jnp.asarray(rng.integers(0, 2**num_bits, size=(4, 256)))
    split = bitops.split_factorized_tokens(tokens, 2**num_bits, splits)
    assert int(split.max()) < 2 ** (num_bits // splits)
    combined = bitops.combine_factorized_tokens(split, 2**num_bits, splits)
    np.testing.assert_array_equal(np.asarray(combined), np.asarray(tokens))
