import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskbit_tpu.ops.masking import get_mask_tokens, get_masking_ratio, mask_ratio_from_uniform


@pytest.mark.parametrize("mode", ["linear", "square", "cosine", "arccos"])
def test_get_mask_tokens_masks_correctly(mode):
    tokens = jnp.asarray(np.random.default_rng(1).integers(0, 1024, size=(8, 256, 2)))
    masked, mask = get_mask_tokens(jax.random.key(0), tokens, mask_token=1024, mode=mode)
    assert masked.shape == tokens.shape
    np.testing.assert_array_equal(np.asarray(masked == 1024), np.asarray(mask))
    # unmasked positions unchanged
    np.testing.assert_array_equal(
        np.asarray(masked)[~np.asarray(mask)], np.asarray(tokens)[~np.asarray(mask)]
    )


def test_mask_ratio_transforms():
    r = jnp.array([0.0, 0.25, 1.0])
    np.testing.assert_allclose(np.asarray(mask_ratio_from_uniform(r, "linear")), [1.0, 0.75, 0.0])
    np.testing.assert_allclose(np.asarray(mask_ratio_from_uniform(r, "square")), [1.0, 0.9375, 0.0])
    np.testing.assert_allclose(
        np.asarray(mask_ratio_from_uniform(r, "cosine")),
        np.cos(np.array([0.0, 0.25, 1.0]) * math.pi / 2),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(mask_ratio_from_uniform(r, "arccos")),
        np.arccos(np.array([0.0, 0.25, 1.0])) / (math.pi / 2),
        atol=1e-6,
    )


@pytest.mark.parametrize("mode", ["root", "square", "cosine", "arccos", "linear"])
def test_masking_ratio_bounds(mode):
    for progress in [0.01, 0.25, 0.5, 0.99, 1.0]:
        ratio = float(get_masking_ratio(progress, mode))
        assert 0.99e-6 <= ratio <= 1.0


def test_masking_ratio_values():
    assert float(get_masking_ratio(1.0, "arccos")) == pytest.approx(1e-6)
    assert float(get_masking_ratio(0.5, "linear")) == pytest.approx(0.5)
    assert float(get_masking_ratio(0.25, "root")) == pytest.approx(0.5)


def test_min_masking_ratio():
    tokens = jnp.zeros((64, 256, 1), jnp.int32)
    _, mask = get_mask_tokens(
        jax.random.key(3), tokens, mask_token=7, mode="linear", min_masking_ratio=0.5
    )
    # linear with r in [0, 0.5) -> masking ratio in (0.5, 1]; expect > ~45% masked
    assert float(jnp.mean(mask.astype(jnp.float32))) > 0.45
