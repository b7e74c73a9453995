"""Pallas fused attention vs einsum reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskbit_tpu.nn.pallas_attention import fused_attention


def ref_attention(q, k, v):
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (d**-0.5)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v)


@pytest.mark.parametrize("n", [64, 257])
def test_fused_attention_matches_einsum(rng, n):
    b, h, d = 2, 4, 64
    q = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    out = fused_attention(q, k, v, interpret=True)
    expected = ref_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5, rtol=1e-4)


def test_fused_attention_padding_masked(rng):
    """Padded keys must not leak into the softmax: growing n with zero-pads
    differs from true padding handling — verify vs exact reference at n=257
    (non-multiple of the sublane tile)."""
    b, n, h, d = 1, 257, 2, 64
    q = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, h, d)) + 3.0, jnp.float32)  # bias detects leaks
    out = fused_attention(q, k, v, interpret=True)
    expected = ref_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5, rtol=1e-4)


def test_fused_attention_block_matches_einsum_path(rng):
    """BertAttention attention_impl='fused' must match the einsum path
    (postnorm, deterministic) with identical params."""
    from maskbit_tpu.nn.transformer import BertAttention

    b, n, e, h = 2, 33, 64, 4
    x = jnp.asarray(rng.normal(size=(b, n, e)), jnp.float32)
    ref_mod = BertAttention(e, h, dropout=0.0, use_prenorm=False, attention_impl="einsum")
    variables = ref_mod.init(jax.random.key(0), x)
    expected = ref_mod.apply(variables, x)

    fused_mod = BertAttention(e, h, dropout=0.0, use_prenorm=False, attention_impl="fused")
    got = fused_mod.apply(variables, x)  # interpret mode on CPU
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=3e-5, rtol=1e-4)


def test_fused_attention_block_512px_seq(rng):
    """512px shapes (n=1025, E=1024): the fused block raises its own
    `vmem_limit_bytes` for long sequences (measured 1.8x over XLA on v5e) —
    verify that path stays numerically exact and the padded tail is masked."""
    from maskbit_tpu.nn.transformer import BertAttention

    b, n, e, h = 1, 1025, 1024, 16
    x = jnp.asarray(rng.normal(size=(b, n, e)) * 0.1, jnp.float32)
    ref_mod = BertAttention(e, h, dropout=0.0, use_prenorm=False, attention_impl="einsum")
    variables = ref_mod.init(jax.random.key(0), x)
    expected = ref_mod.apply(variables, x)

    fused_mod = BertAttention(e, h, dropout=0.0, use_prenorm=False, attention_impl="fused")
    got = fused_mod.apply(variables, x)  # interpret mode on CPU
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=3e-4, rtol=1e-3)
