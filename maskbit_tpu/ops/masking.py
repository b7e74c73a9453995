"""Masking schedules for masked-token training and iterative sampling.

Parity targets:
  * training-time mask sampling  (reference: modeling/modules/masking.py:7-38)
  * inference-time progress→ratio (reference: modeling/modules/masking.py:41-65)

All functions are pure and jit-safe; randomness flows through explicit
`jax.random` keys instead of global torch RNG state.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

_PI_HALF = math.pi * 0.5

TRAIN_MODES = ("linear", "square", "cosine", "arccos")
INFERENCE_MODES = ("root", "square", "cosine", "arccos", "linear")


def mask_ratio_from_uniform(r: jnp.ndarray, mode: str) -> jnp.ndarray:
    """Transform uniform draws r∈[0,1) into a masking fraction (training)."""
    if mode == "linear":
        return 1.0 - r
    if mode == "square":
        return 1.0 - r**2
    if mode == "cosine":
        return jnp.cos(r * _PI_HALF)
    if mode == "arccos":
        return jnp.arccos(r) / _PI_HALF
    raise ValueError(f"Invalid mode {mode!r}. Choose from {TRAIN_MODES}.")


def get_mask_tokens(
    key: jax.Array,
    tokens: jnp.ndarray,
    mask_token: int,
    mode: str = "arccos",
    min_masking_ratio: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Randomly mask tokens for MLM training.

    Args:
        key: PRNG key.
        tokens: integer tokens of shape (b, n, m) (or any (b, ...) shape).
        mask_token: id written into masked positions.
        mode: schedule transforming the per-image uniform ratio.
        min_masking_ratio: lower bound on the masking ratio.

    Returns:
        (masked_tokens, mask) where mask is True at masked positions.
    """
    key_r, key_mask = jax.random.split(key)
    b = tokens.shape[0]
    r = jax.random.uniform(key_r, (b,)) * (1.0 - min_masking_ratio)
    val_to_mask = mask_ratio_from_uniform(r, mode)
    bcast = val_to_mask.reshape((b,) + (1,) * (tokens.ndim - 1))
    mask = jax.random.uniform(key_mask, tokens.shape) < bcast
    masked_tokens = jnp.where(mask, jnp.asarray(mask_token, tokens.dtype), tokens)
    return masked_tokens, mask


def get_masking_ratio(progress, mode: str = "arccos") -> jnp.ndarray:
    """Masking ratio at a given sampling progress ∈ (0, 1]."""
    r = jnp.asarray(progress, jnp.float32)
    if mode == "root":
        val = 1.0 - jnp.sqrt(r)
    elif mode == "square":
        val = 1.0 - r**2
    elif mode == "cosine":
        val = jnp.cos(r * _PI_HALF)
    elif mode == "arccos":
        val = jnp.arccos(r) / _PI_HALF
    elif mode == "linear":
        val = 1.0 - r
    else:
        raise ValueError(f"Invalid mode {mode!r}. Choose from {INFERENCE_MODES}.")
    return jnp.clip(val, 1e-6, 1.0)
