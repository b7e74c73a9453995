import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskbit_tpu.models.generator import LFQBert
from maskbit_tpu.models.tokenizer import ConvVQModel
from maskbit_tpu.ops.bitops import combine_factorized_tokens
from maskbit_tpu.sampling.sample import (
    SamplingConfig,
    default_labels,
    make_sampler,
    sample_tokens,
)

CFG = SamplingConfig(
    softmax_temperature=1.0,
    randomize_temperature=0.0,
    mask_schedule_strategy="arccos",
    num_steps=8,
    guidance_scale=2.0,
    mask_token=16,
    patch_size=4,
    guidance_annealing="cosine",
    scale_pow=3.0,
    codebook_size=256,
    codebook_splits=2,
)


def peaked_logits_fn(target_tokens):
    """Logits strongly preferring `target_tokens`, regardless of input."""

    def fn(tokens, labels, drop):
        b = tokens.shape[0]
        # target may be for the un-doubled batch: tile if CFG doubled it
        tgt = jnp.tile(target_tokens, (b // target_tokens.shape[0], 1, 1))
        return 50.0 * jax.nn.one_hot(tgt, CFG.mask_token, dtype=jnp.float32)

    return fn


def test_sampler_converges_to_peaked_distribution():
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.integers(0, 16, size=(2, 16, 2)))
    labels = jnp.zeros((2,), jnp.int32)
    final, _ = sample_tokens(peaked_logits_fn(target), jax.random.key(0), labels, CFG)
    np.testing.assert_array_equal(np.asarray(final), np.asarray(target))


def test_sampler_no_mask_tokens_in_output():
    def uniform_logits(tokens, labels, drop):
        return jnp.zeros(tokens.shape + (CFG.mask_token,), jnp.float32)

    labels = jnp.zeros((3,), jnp.int32)
    final, _ = sample_tokens(uniform_logits, jax.random.key(1), labels, CFG)
    assert int(jnp.max(final)) < CFG.mask_token
    assert int(jnp.min(final)) >= 0


def test_sampler_deterministic_under_key():
    def uniform_logits(tokens, labels, drop):
        return jnp.zeros(tokens.shape + (CFG.mask_token,), jnp.float32)

    labels = jnp.zeros((2,), jnp.int32)
    a, _ = sample_tokens(uniform_logits, jax.random.key(7), labels, CFG)
    b, _ = sample_tokens(uniform_logits, jax.random.key(7), labels, CFG)
    c, _ = sample_tokens(uniform_logits, jax.random.key(8), labels, CFG)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.any(np.asarray(a) != np.asarray(c))


def test_sampler_history_shapes():
    def uniform_logits(tokens, labels, drop):
        return jnp.zeros(tokens.shape + (CFG.mask_token,), jnp.float32)

    labels = jnp.zeros((2,), jnp.int32)
    final, history = sample_tokens(
        uniform_logits, jax.random.key(0), labels, CFG, return_history=True
    )
    assert history.shape == (CFG.num_steps, 2, 16, 2)
    np.testing.assert_array_equal(np.asarray(history[-1]), np.asarray(final))


def test_cfg_drop_mask_routing():
    """First half of the doubled batch is conditioned (drop=False), second
    half unconditioned — CFG must therefore steer towards the conditional
    prediction (token 3), away from the unconditional one (token 5)."""

    def drop_dependent_logits(tokens, labels, drop):
        cond = 10.0 * jax.nn.one_hot(
            jnp.full(tokens.shape, 3), CFG.mask_token, dtype=jnp.float32
        )
        uncond = 10.0 * jax.nn.one_hot(
            jnp.full(tokens.shape, 5), CFG.mask_token, dtype=jnp.float32
        )
        return jnp.where(drop[:, None, None, None], uncond, cond)

    labels = jnp.zeros((2,), jnp.int32)
    cfg = CFG._replace(guidance_annealing="none", guidance_scale=1.0)
    final, _ = sample_tokens(drop_dependent_logits, jax.random.key(0), labels, cfg)
    np.testing.assert_array_equal(np.asarray(final), 3)


def test_default_labels_cycle():
    labels = np.asarray(default_labels(20))
    assert labels.shape == (20,)
    assert labels[0] == 1 and labels[1] == 7 and labels[10] == 1


def test_end_to_end_sampler_with_models():
    tokenizer = ConvVQModel(
        num_channels=3, hidden_channels=32, channel_mult=(1, 2), num_resolutions=2,
        num_res_blocks=1, token_size=8, codebook_size=256,
        quantizer_type="lookup-free", entropy_loss_weight=0.0,
    )
    generator = LFQBert(
        img_size=32, hidden_dim=32, codebook_size=256, codebook_splits=2,
        depth=1, heads=2, mlp_dim=64, dropout=0.0, nclass=10, input_stride=8,
    )
    cfg = SamplingConfig(
        num_steps=4, guidance_scale=1.5, mask_token=16, patch_size=4,
        codebook_size=256, codebook_splits=2, mask_schedule_strategy="arccos",
    )
    key = jax.random.key(0)
    tok_tokens = jnp.zeros((1, 16), jnp.int32)
    tok_vars = tokenizer.init(key, tok_tokens, method="decode_tokens")
    gen_vars = generator.init(
        key, jnp.zeros((1, 16, 2), jnp.int32), jnp.zeros((1,), jnp.int32)
    )

    sampler = make_sampler(generator, tokenizer, cfg, jit=True)
    labels = jnp.asarray([3, 7])
    images, history = sampler(gen_vars, tok_vars, key, labels)
    # 4x4 token grid, num_resolutions=2 -> one 2x upsample -> 8x8 images
    assert images.shape == (2, 8, 8, 3)
    assert np.all(np.isfinite(np.asarray(images)))
    assert history is None


def test_mask_count_schedule_matches_reference_recurrence():
    """The per-step re-mask counts must follow the reference recurrence
    (sampling.py:109,120-130), including the element-[0] num_masked quirk
    and the clamp to [1, num_masked-1]."""
    import math

    cfg = CFG._replace(num_steps=8, guidance_scale=0.0, randomize_temperature=0.0)
    num_maskable = 16 * 2

    # distinct logits -> distinct confidences (with uniform logits every
    # confidence ties and `conf <= threshold` masks everything — the
    # reference behaves identically on ties)
    fixed = jax.random.normal(jax.random.key(42), (3, 16, 2, CFG.mask_token))

    def distinct_logits(tokens, labels, drop):
        return fixed[: tokens.shape[0]]

    labels = jnp.zeros((3,), jnp.int32)
    _, history = sample_tokens(
        distinct_logits, jax.random.key(0), labels, cfg, return_history="full"
    )
    predicted_h, masked_h = history

    # numpy re-derivation of the reference count recurrence
    num_masked = num_maskable
    expected_counts = []
    for i in range(cfg.num_steps):
        progress = (i + 1) / cfg.num_steps
        ratio = max(min(np.arccos(progress) / (math.pi * 0.5), 1.0), 1e-6)
        mask_len = int(np.floor(ratio * num_maskable))
        count = int(np.clip(mask_len, 1, num_masked - 1))
        expected_counts.append(count)
        num_masked = count

    got_counts = np.asarray(jnp.sum(masked_h == cfg.mask_token, axis=(2, 3)))
    for i, expected in enumerate(expected_counts):
        np.testing.assert_array_equal(
            got_counts[i], expected, err_msg=f"step {i}"
        )
    # predicted tokens never contain mask ids
    assert int(jnp.max(predicted_h)) < cfg.mask_token


def test_512px_geometry():
    """512px configs: 32x32 token grid, seq 1025, sampler shapes line up."""
    from maskbit_tpu.models.generator import LFQBert

    model = LFQBert(img_size=512, hidden_dim=32, codebook_size=2**14,
                    codebook_splits=2, depth=1, heads=2, mlp_dim=64,
                    nclass=10, input_stride=16)
    assert model.seq_len == 1024
    assert model.effective_codebook_size == 128
    cfg = SamplingConfig(num_steps=2, guidance_scale=0.0, mask_token=128,
                         patch_size=32, codebook_size=2**14, codebook_splits=2)

    def uniform_logits(tokens, labels, drop):
        return jnp.zeros(tokens.shape + (128,), jnp.float32)

    final, _ = sample_tokens(uniform_logits, jax.random.key(0),
                             jnp.zeros((1,), jnp.int32), cfg)
    assert final.shape == (1, 1024, 2)
