"""bfloat16 compute-path tests (SURVEY §4 implication (e)): every model
forward must run with dtype=bfloat16 — the TPU serving/training precision —
producing finite outputs of the right shape/dtype, with the numerically
critical parts (LFQ signs, softmax, LayerNorm, GroupNorm stats) still exact
enough to track the f32 path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskbit_tpu.models.generator import LFQBert
from maskbit_tpu.models.tokenizer import ConvVQModel
from maskbit_tpu.nn.discriminator import NLayerDiscriminatorv2


def _tokenizer(dtype):
    return ConvVQModel(
        num_channels=3, hidden_channels=32, channel_mult=(1, 2),
        num_resolutions=2, num_res_blocks=1, token_size=4, codebook_size=16,
        quantizer_type="lookup-free", entropy_loss_weight=0.0,
        sample_with_conv=True, dtype=dtype,
    )


def test_tokenizer_bf16_forward_matches_f32_tokens(rng):
    """bf16 activations must produce the SAME token indices as f32 (the LFQ
    sign decision is taken on params initialized in f32; bf16 rounding must
    not flip codes on a random input away from the decision boundary)."""
    x = jnp.asarray(rng.uniform(size=(2, 16, 16, 3)), jnp.float32)
    params = _tokenizer(jnp.float32).init(jax.random.key(0), x)

    recon32, res32 = _tokenizer(jnp.float32).apply(params, x)
    recon16, res16 = _tokenizer(jnp.bfloat16).apply(params, x.astype(jnp.bfloat16))

    assert recon16.dtype == jnp.bfloat16
    assert recon16.shape == recon32.shape
    assert np.isfinite(np.asarray(recon16, np.float32)).all()
    tok32 = np.asarray(_tokenizer(jnp.float32).apply(params, x, method="tokenize"))
    tok16 = np.asarray(
        _tokenizer(jnp.bfloat16).apply(params, x.astype(jnp.bfloat16), method="tokenize")
    )
    assert (tok32 == tok16).mean() > 0.95  # only boundary-adjacent codes may flip


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_generator_forward_dtypes(rng, dtype):
    gen = LFQBert(
        img_size=32, hidden_dim=32, codebook_size=16, codebook_splits=2,
        depth=1, heads=2, mlp_dim=64, dropout=0.0, nclass=10,
        input_stride=8, dtype=dtype,
    )
    tokens = jnp.asarray(rng.integers(0, 4, size=(2, 16, 2)), jnp.int32)
    labels = jnp.asarray([1, 2], jnp.int32)
    params = gen.init(jax.random.key(0), tokens, labels)
    logits = gen.apply(params, tokens, labels)
    assert logits.shape == (2, 16, 2, 4)
    # logits head computes in f32 regardless of compute dtype
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_discriminator_bf16(rng):
    disc = NLayerDiscriminatorv2(
        num_channels=3, hidden_channels=32, num_stages=2, dtype=jnp.bfloat16
    )
    x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.bfloat16)
    params = disc.init(jax.random.key(0), x)
    logits = disc.apply(params, x)
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_sampler_bf16_produces_valid_tokens(rng):
    """End-to-end bf16 sampling: every emitted token must be a valid code
    (the serving configuration — bench.py runs exactly this in bf16)."""
    from maskbit_tpu.sampling.sample import SamplingConfig, make_sampler

    tok = _tokenizer(jnp.bfloat16)
    gen = LFQBert(
        img_size=16, hidden_dim=32, codebook_size=16, codebook_splits=2,
        depth=1, heads=2, mlp_dim=64, dropout=0.0, nclass=10,
        input_stride=2, dtype=jnp.bfloat16,
    )
    cfg = SamplingConfig(
        softmax_temperature=1.0, randomize_temperature=4.0,
        mask_schedule_strategy="arccos", num_steps=2, guidance_scale=2.0,
        mask_token=4, patch_size=8, guidance_annealing="cosine",
        use_sampling_annealing=False, scale_pow=3.0,
        codebook_size=16, codebook_splits=2,
    )
    gen_vars = gen.init(
        jax.random.key(0), jnp.zeros((1, 64, 2), jnp.int32), jnp.zeros((1,), jnp.int32)
    )
    tok_vars = tok.init(
        jax.random.key(1), jnp.zeros((1, 64), jnp.int32), method="decode_tokens"
    )
    sampler = make_sampler(gen, tok, cfg, jit=True)
    images, _ = sampler(gen_vars, tok_vars, jax.random.key(2),
                        jnp.asarray([3, 5], jnp.int32))
    assert images.dtype == jnp.bfloat16
    assert images.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(images, np.float32)).all()
