"""Fused self-attention Pallas kernel for short sequences.

The generator's sequence is only 257 tokens (16x16 grid + class token), so
the entire per-(batch, head) attention — logits, f32 softmax, value mix —
fits in VMEM and is computed in one program per (batch, head).

Exact math (f32 softmax, no flash tiling needed); pads the sequence to the
sublane multiple and masks padded keys with -inf.

Status: measured on v5e at (b=16, n=257, h=16, d=64): 0.41 ms vs XLA's
0.28 ms — XLA's fused einsum+softmax wins at these tiny shapes, so the
default transformer path keeps the einsum formulation. This kernel is the
building block for longer sequences (512px -> n=1025) where the n^2 f32
HBM intermediates start to dominate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, valid_len: int):
    q = q_ref[0]  # (Np, d)
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (Np, Np)
    n_pad = q.shape[0]
    if valid_len < n_pad:
        key_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, dimension=1)
        logits = jnp.where(key_ids < valid_len, logits, -jnp.inf)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jax.lax.dot_general(
        weights.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """(b, n, h, d) q/k/v -> (b, n, h, d) attention output.

    Unmasked bidirectional attention with 1/sqrt(d) scaling; softmax in f32
    on-chip. Intended for n up to ~1k (n^2 f32 must fit VMEM per program).
    """
    b, n, h, d = q.shape
    scale = d**-0.5
    sublane = 16 if q.dtype == jnp.bfloat16 else 8
    n_pad = _round_up(n, sublane)

    def prep(x):
        x = jnp.swapaxes(x, 1, 2).reshape(b * h, n, d)  # (bh, n, d)
        if n_pad != n:
            x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
        return x

    qp, kp, vp = prep(q), prep(k), prep(v)

    kernel = functools.partial(_attention_kernel, scale=scale, valid_len=n)
    out = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)

    out = out[:, :n, :].reshape(b, h, n, d)
    return jnp.swapaxes(out, 1, 2)
