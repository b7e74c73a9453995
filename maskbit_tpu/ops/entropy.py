"""Codebook entropy losses.

Parity targets:
  * `entropy_loss_fn` — softmax entropy over an affinity matrix with
    clamped logs (reference: modeling/quantizer/quantizer_utils.py:18-41).
  * the LFQ full-codebook affinity `2 * z @ codebook.T`
    (reference: modeling/quantizer/lookup_free.py:72-74).

TPU-first design: for large bit-widths the reference materializes a
(b*h*w, 2^K) affinity matrix (4 GB at 18 bits) — here the partition
function factorizes analytically over bits (the codebook is the full
{-1,+1}^K hypercube, so Z = prod_k 2*cosh(2 z_k / T)), and the entropy
sums stream over codebook chunks with `lax.scan`, keeping peak memory at
O(rows * chunk) while staying bit-comparable with the reference math.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from maskbit_tpu.ops.bitops import codebook as lfq_codebook


def clamp_log(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """log(max(x, eps)) — the reference's clamped log."""
    return jnp.log(jnp.clip(x, min=eps))


def entropy_loss_fn(
    affinity: jnp.ndarray,
    temperature: float,
    entropy_gamma: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample entropy and (gamma-scaled) entropy of the mean code distribution.

    Direct dense evaluation; use `lfq_entropy_terms` for large LFQ codebooks.
    """
    flat = affinity.reshape(-1, affinity.shape[-1]).astype(jnp.float32)
    flat = flat / temperature
    probability = jax.nn.softmax(flat, axis=-1)
    average_probability = jnp.mean(probability, axis=0)
    per_sample_entropy = -jnp.mean(jnp.sum(probability * clamp_log(probability), axis=-1))
    avg_entropy = jnp.sum(-average_probability * clamp_log(average_probability))
    return per_sample_entropy, avg_entropy * entropy_gamma


def _log2cosh(a: jnp.ndarray) -> jnp.ndarray:
    """log(2*cosh(a)) = |a| + log1p(exp(-2|a|)), numerically stable."""
    abs_a = jnp.abs(a)
    return abs_a + jnp.log1p(jnp.exp(-2.0 * abs_a))


@partial(jax.jit, static_argnames=("num_bits", "chunk_size"))
def lfq_entropy_terms(
    z: jnp.ndarray,
    num_bits: int,
    temperature: float,
    entropy_gamma: float = 1.0,
    chunk_size: int = 4096,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(per_sample_entropy, gamma * avg_entropy) for the LFQ hypercube codebook.

    Equivalent to
        entropy_loss_fn(2 * z.reshape(-1, K) @ codebook(K).T, temperature, gamma)
    but streamed: the log-partition factorizes over bits so only one pass over
    codebook chunks is required and the full (rows, 2^K) matrix never exists.
    """
    rows = z.reshape(-1, num_bits).astype(jnp.float32)
    n_codes = 2**num_bits
    inv_t = 1.0 / temperature

    # The affinity is divided by a tiny temperature (0.01), so the matmul must
    # run at full f32 precision — the default TPU/bf16 matmul precision loses
    # ~3e-3 relative, which the exp() blows up into O(1) probability error.
    dot = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

    if n_codes <= chunk_size:
        cb = lfq_codebook(num_bits)
        affinity = 2.0 * dot(rows, cb.T)
        return entropy_loss_fn(affinity, temperature, entropy_gamma)

    # the chunked scan reshapes the 2^K codebook into equal chunks, so
    # round a non-power-of-two chunk_size down to the nearest power of two
    # (always a divisor of 2^K) instead of crashing at trace time
    if n_codes % chunk_size != 0:
        chunk_size = 1 << (chunk_size.bit_length() - 1)

    # log Z per row, exact: sum_k log(2 cosh(2 z_k / T))
    log_z = jnp.sum(_log2cosh(2.0 * rows * inv_t), axis=-1)  # (R,)

    cb = lfq_codebook(num_bits)  # (2^K, K) — small: K * 2^K floats
    num_chunks = n_codes // chunk_size
    cb_chunks = cb.reshape(num_chunks, chunk_size, num_bits)
    n_rows = rows.shape[0]

    def body(carry, cb_chunk):
        psum, avg_ent = carry
        logits = (2.0 * inv_t) * dot(rows, cb_chunk.T)  # (R, chunk)
        p = jnp.exp(logits - log_z[:, None])
        # per-sample: sum over codes of p * clamp_log(p), accumulated per row
        psum = psum + jnp.sum(p * clamp_log(p), axis=-1)
        avg_p = jnp.mean(p, axis=0)
        avg_ent = avg_ent + jnp.sum(-avg_p * clamp_log(avg_p))
        return (psum, avg_ent), None

    init = (jnp.zeros((n_rows,), jnp.float32), jnp.zeros((), jnp.float32))
    (psum, avg_entropy), _ = jax.lax.scan(body, init, cb_chunks)
    per_sample_entropy = -jnp.mean(psum)
    return per_sample_entropy, avg_entropy * entropy_gamma
