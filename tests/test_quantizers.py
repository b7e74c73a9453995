import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskbit_tpu.ops.entropy import clamp_log, entropy_loss_fn, lfq_entropy_terms
from maskbit_tpu.quantizers import LookupFreeQuantizer, SimpleVectorizer


def test_lfq_quantize_and_indices(rng):
    quantizer = LookupFreeQuantizer(token_bits=10, entropy_loss_weight=0.0)
    z = jnp.asarray(rng.normal(size=(2, 4, 4, 10)), jnp.float32)
    z_q, result = quantizer.apply({}, z)
    assert z_q.shape == z.shape
    np.testing.assert_array_equal(np.asarray(jnp.sign(z_q)), np.sign(np.asarray(z)))
    # indices match manual packing
    expected = ((np.asarray(z) > 0).astype(np.int64) * (2 ** np.arange(10))).sum(-1)
    np.testing.assert_array_equal(np.asarray(result["min_encoding_indices"]), expected)


def test_lfq_straight_through_gradient(rng):
    quantizer = LookupFreeQuantizer(token_bits=8, entropy_loss_weight=0.0)
    z = jnp.asarray(rng.normal(size=(1, 2, 2, 8)), jnp.float32)

    def fn(z):
        z_q, _ = quantizer.apply({}, z)
        return jnp.sum(z_q * jnp.arange(8, dtype=jnp.float32))

    g = jax.grad(fn)(z)
    # STE passes gradients straight through the sign op
    np.testing.assert_allclose(
        np.asarray(g), np.broadcast_to(np.arange(8, dtype=np.float32), z.shape)
    )


def test_lfq_commitment_loss_value(rng):
    quantizer = LookupFreeQuantizer(token_bits=6, commitment_cost=0.25, entropy_loss_weight=0.0)
    z = jnp.asarray(rng.normal(size=(2, 3, 3, 6)), jnp.float32)
    _, result = quantizer.apply({}, z)
    z_np = np.asarray(z)
    z_q = np.where(z_np > 0, 1.0, -1.0)
    expected = 0.25 * np.mean((z_q - z_np) ** 2)
    np.testing.assert_allclose(float(result["commitment_loss"]), expected, rtol=1e-6)


def test_lfq_round_trip_decode(rng):
    quantizer = LookupFreeQuantizer(token_bits=12)
    indices = jnp.asarray(rng.integers(0, 4096, size=(2, 256)))
    bits = quantizer.convert_indices_to_bits(indices)
    back = quantizer.convert_bits_to_indices(bits)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(indices))


def test_entropy_chunked_matches_dense(rng):
    z = jnp.asarray(rng.normal(size=(2, 4, 4, 10)), jnp.float32)
    dense = lfq_entropy_terms(z, 10, 0.01, 1.0, chunk_size=4096)  # 1024 <= 4096: dense path
    chunked = lfq_entropy_terms(z, 10, 0.01, 1.0, chunk_size=128)
    # f32 cancellation at temperature 0.01: the per-sample entropy is a tiny
    # residual of ~2000-unit log-domain values, so bound it loosely
    np.testing.assert_allclose(float(dense[0]), float(chunked[0]), rtol=5e-3)
    np.testing.assert_allclose(float(dense[1]), float(chunked[1]), rtol=1e-3)


def test_entropy_matches_reference_formula(rng):
    # direct numpy re-derivation of quantizer_utils.entropy_loss_fn
    affinity = rng.normal(size=(32, 16)).astype(np.float32)
    temperature, gamma = 0.1, 1.5
    flat = affinity / temperature
    e = np.exp(flat - flat.max(axis=-1, keepdims=True))
    p = e / e.sum(axis=-1, keepdims=True)
    avg_p = p.mean(axis=0)
    clamped = lambda x: np.log(np.clip(x, 1e-5, None))
    expected_per_sample = -np.mean(np.sum(p * clamped(p), axis=-1))
    expected_avg = np.sum(-avg_p * clamped(avg_p)) * gamma

    got = entropy_loss_fn(jnp.asarray(affinity), temperature, gamma)
    np.testing.assert_allclose(float(got[0]), expected_per_sample, rtol=1e-5)
    np.testing.assert_allclose(float(got[1]), expected_avg, rtol=1e-5)


def test_clamp_log():
    x = jnp.array([1e-8, 0.5, 2.0])
    np.testing.assert_allclose(
        np.asarray(clamp_log(x)), np.log([1e-5, 0.5, 2.0]), rtol=1e-5
    )


def test_vq_quantizer_shapes_and_losses(rng):
    quantizer = SimpleVectorizer(codebook_size=64, token_size=16, entropy_loss_weight=0.1)
    z = jnp.asarray(rng.normal(size=(2, 4, 4, 16)), jnp.float32)
    params = quantizer.init(jax.random.key(0), z)
    z_q, result = quantizer.apply(params, z, train=True)
    assert z_q.shape == z.shape
    assert result["min_encoding_indices"].shape == (2, 4, 4)
    assert np.isfinite(float(result["quantizer_loss"]))
    assert float(result["codebook_loss"]) >= 0.0

    # quantized outputs must be actual codebook rows
    emb = np.asarray(params["params"]["embedding"])
    idx = np.asarray(result["min_encoding_indices"])
    raw_q = np.asarray(quantizer.apply(params, jnp.asarray(idx), method=SimpleVectorizer.get_codebook_entry))
    z_np = np.asarray(z)
    np.testing.assert_allclose(np.asarray(z_q), z_np + (raw_q - z_np), rtol=1e-5)
    assert raw_q.shape == z_np.shape
    np.testing.assert_allclose(raw_q.reshape(-1, 16), emb[idx.ravel()], rtol=1e-6)


def test_vq_l2_normalisation(rng):
    quantizer = SimpleVectorizer(codebook_size=32, token_size=8, use_l2_normalisation=True)
    z = jnp.asarray(rng.normal(size=(1, 2, 2, 8)), jnp.float32)
    params = quantizer.init(jax.random.key(0), z)
    z_q, _ = quantizer.apply(params, z)
    norms = np.linalg.norm(np.asarray(z_q), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_lfq_entropy_chunk_size_non_divisor():
    """A chunk_size that doesn't divide 2^K (e.g. a hand-set 5000) must not
    crash the streamed entropy scan — it rounds down to a power of two —
    and the result must equal the dense computation."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from maskbit_tpu.ops.entropy import entropy_loss_fn, lfq_codebook, lfq_entropy_terms

    z = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 4, 14)), jnp.float32)
    per, avg = lfq_entropy_terms(z, 14, 0.01, 1.0, chunk_size=5000)
    rows = z.reshape(-1, 14)
    cb = lfq_codebook(14)
    affinity = 2.0 * jnp.matmul(rows, cb.T, precision=jax.lax.Precision.HIGHEST)
    per_d, avg_d = entropy_loss_fn(affinity, 0.01, 1.0)
    # chunked scan reassociates the f32 sums at T=0.01: ~1e-3 relative
    np.testing.assert_allclose(float(per), float(per_d), rtol=2e-3)
    np.testing.assert_allclose(float(avg), float(avg_d), rtol=2e-3)


def test_decoder_honors_zero_res_blocks():
    """num_res_blocks_decoder: 0 must build ZERO decoder res blocks per
    stage (reference cfg.get semantics) — the old `or` fallback silently
    substituted num_res_blocks."""
    import jax
    import jax.numpy as jnp

    from maskbit_tpu.nn.conv import ConvDecoder

    kwargs = dict(num_channels=3, hidden_channels=32, channel_mult=(1, 2),
                  num_resolutions=2, num_res_blocks=2, token_size=4)
    dec0 = ConvDecoder(num_res_blocks_decoder=0, **kwargs)
    v0 = dec0.init(jax.random.key(0), jnp.zeros((1, 4, 4, 4)))
    up_keys = [k for k in v0["params"] if k.startswith("up_")]
    assert up_keys, "decoder must still have upsampling stages"
    for k in up_keys:
        blocks = [b for b in v0["params"][k] if b.startswith("res_blocks_")]
        assert blocks == [], f"{k} built res blocks {blocks} despite 0"
    dec_default = ConvDecoder(num_res_blocks_decoder=None, **kwargs)
    vd = dec_default.init(jax.random.key(0), jnp.zeros((1, 4, 4, 4)))
    assert any(
        b.startswith("res_blocks_") for b in vd["params"][up_keys[0]]
    ), "None must fall back to num_res_blocks"
