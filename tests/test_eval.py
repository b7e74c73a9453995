"""Streaming evaluator tests: metric math vs torch/numpy references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskbit_tpu.eval import fid as fid_lib
from maskbit_tpu.eval.inception import InceptionV3
from maskbit_tpu.eval.streaming import (
    GeneratorEvaluator,
    TokenizerEvaluator,
    gaussian_kernel_2d,
    _ssim_sum,
)


def test_pixel_metrics(rng):
    real = rng.uniform(size=(4, 16, 16, 3)).astype(np.float32)
    fake = np.clip(real + rng.normal(scale=0.05, size=real.shape), 0, 1).astype(np.float32)
    ev = TokenizerEvaluator(enable_mae_error=True, enable_mse_error=True, enable_psnr_score=True)
    ev.update(real[:2], fake[:2])
    ev.update(real[2:], fake[2:])
    res = ev.result()
    np.testing.assert_allclose(res["MAE"], np.mean(np.abs(real - fake)), rtol=1e-4)
    np.testing.assert_allclose(res["MSE"], np.mean((real - fake) ** 2), rtol=1e-4)
    per_img_mse = np.mean((real - fake) ** 2, axis=(1, 2, 3))
    expected_psnr = np.mean(10 * np.log10(1.0 / (per_img_mse + 1e-10)))
    np.testing.assert_allclose(res["PSNR"], expected_psnr, rtol=1e-4)


def test_ssim_matches_torch_reference(rng):
    """SSIM vs a direct torch re-implementation of the reference formula."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    real = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    fake = np.clip(real + rng.normal(scale=0.1, size=real.shape), 0, 1).astype(np.float32)

    # reference-style torch computation (evaluator.py:296-334)
    kernel = torch.from_numpy(gaussian_kernel_2d()).expand(3, 1, -1, -1)
    r = torch.from_numpy(real.transpose(0, 3, 1, 2))
    f = torch.from_numpy(fake.transpose(0, 3, 1, 2))
    pad = [5, 5, 5, 5]
    fp = F.pad(f, pad, mode="reflect")
    rp = F.pad(r, pad, mode="reflect")
    inputs = torch.cat([fp, rp, fp**2, rp**2, fp * rp])
    outs = F.conv2d(inputs, kernel, groups=3)
    bs = 2
    o = [outs[i * bs:(i + 1) * bs] for i in range(5)]
    mu_f_sq, mu_r_sq, mu_fr = o[0] ** 2, o[1] ** 2, o[0] * o[1]
    sig_f, sig_r, sig_fr = o[2] - mu_f_sq, o[3] - mu_r_sq, o[4] - mu_fr
    c1, c2 = 0.01**2, 0.03**2
    ssim_idx = ((2 * mu_fr + c1) * (2 * sig_fr + c2)) / ((mu_f_sq + mu_r_sq + c1) * (sig_f + sig_r + c2))
    expected = float(ssim_idx.mean(dim=(1, 2, 3)).sum())

    got = float(_ssim_sum(jnp.asarray(real), jnp.asarray(fake)))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_inception_score_identity():
    # uniform probabilities -> IS == 1
    n = 100
    probs = np.full((n, 1008), 1.0 / 1008)
    prob_total = probs.sum(0)
    kl_total = np.sum(probs * np.log(probs + 1e-16), axis=0)
    score = fid_lib.inception_score_from_moments(prob_total, kl_total, n)
    np.testing.assert_allclose(score, 1.0, rtol=1e-3)


def test_fid_zero_for_identical_moments(rng):
    feats = rng.normal(size=(500, 8)).astype(np.float64)
    total = feats.sum(0)
    sigma_sum = feats.T @ feats
    fid = fid_lib.fid_from_moments(total, sigma_sum, total, sigma_sum, 500)
    assert abs(fid) < 1e-6


def test_fid_covariance_matches_numpy(rng):
    feats = rng.normal(size=(200, 8))
    cov = fid_lib.get_covariance(feats.T @ feats, feats.sum(0), 200)
    np.testing.assert_allclose(cov, np.cov(feats, rowvar=False), rtol=1e-8)


def test_fid_increases_with_shift(rng):
    a = rng.normal(size=(500, 8))
    b = a + 1.0
    fid = fid_lib.frechet_distance(
        a.mean(0), np.cov(a, rowvar=False), b.mean(0), np.cov(b, rowvar=False)
    )
    np.testing.assert_allclose(fid, 8.0, rtol=1e-6)  # ||diff||^2 = 8, same cov


def test_codebook_metrics(rng):
    ev = TokenizerEvaluator(
        enable_codebook_usage_measure=True,
        enable_codebook_entropy_measure=True,
        num_codebook_entries=16,
    )
    real = rng.uniform(size=(2, 8, 8, 3)).astype(np.float32)
    # half the codebook used, uniformly
    indices = np.tile(np.arange(8), 16).reshape(2, 8, 8)
    ev.update(real, real, codebook_indices=indices)
    res = ev.result()
    np.testing.assert_allclose(res["CodebookUsage"], 0.5)
    np.testing.assert_allclose(res["CodebookEntropy"], 3.0, atol=1e-4)  # log2(8)


def test_inception_model_shapes(rng):
    model = InceptionV3()
    x = jnp.asarray(rng.integers(0, 255, size=(2, 64, 64, 3)), jnp.float32)
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out["2048"].shape == (2, 2048)
    assert out["logits_unbiased"].shape == (2, 1008)


def test_adm_moment_accumulator_matches_full_gather(rng):
    """Per-host moment accumulators, merged, must reproduce EXACTLY what the
    single-host full-activation path computes (FID stats and split-IS) —
    the multi-host eval_maskbit reduction relies on this."""
    from maskbit_tpu.eval.adm import AdmMomentAccumulator, Evaluator

    n, dim, nclass, split = 120, 8, 6, 50
    acts = rng.normal(size=(n, dim))
    logits = rng.normal(size=(n, nclass)) * 3.0

    # reference: single-host full-gather computation
    ev = Evaluator(inception_fn=None)
    ref_stats = ev.compute_statistics(acts)
    ref_is = ev.compute_inception_score_from_logits(logits, split_size=split)

    # 3 "hosts" with strided sample assignment (as eval_maskbit shards),
    # batched updates, merged via state dicts
    hosts = []
    for p in range(3):
        acc = AdmMomentAccumulator(dim=dim, nclass=nclass,
                                   total_samples=n, split_size=split)
        idx = np.arange(n)[p::3]
        for lo in range(0, len(idx), 16):
            sel = idx[lo:lo + 16]
            acc.update(acts[sel], logits[sel], sel)
        hosts.append(acc)
    merged = hosts[0]
    for other in hosts[1:]:
        merged.merge_state(other.state())

    assert merged.count == n
    got_stats = merged.fid_statistics()
    np.testing.assert_allclose(got_stats.mu, ref_stats.mu, rtol=1e-12)
    np.testing.assert_allclose(got_stats.sigma, ref_stats.sigma, rtol=1e-9)
    np.testing.assert_allclose(merged.inception_score(), ref_is, rtol=1e-12)
    # and the FID computed from the merged moments agrees with full-gather
    shifted = ev.compute_statistics(acts + 0.5)
    np.testing.assert_allclose(
        got_stats.frechet_distance(shifted),
        ref_stats.frechet_distance(shifted), rtol=1e-8,
    )


def test_generator_evaluator_vs_tokenizer_evaluator_is(rng):
    """Both evaluators must produce the same IS from the same fake batch."""
    model = InceptionV3()
    x8 = rng.integers(0, 255, size=(2, 32, 32, 3)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(x8))
    inception_fn = jax.jit(lambda img: model.apply(params, img.astype(jnp.float32)))

    fake = rng.uniform(size=(4, 32, 32, 3)).astype(np.float32)
    gen_ev = GeneratorEvaluator(inception_fn, enable_fid=False)
    gen_ev.update(fake)
    tok_ev = TokenizerEvaluator(inception_fn=inception_fn, enable_inception_score=True)
    tok_ev.update(fake, fake)
    np.testing.assert_allclose(
        gen_ev.result()["InceptionScore"], tok_ev.result()["InceptionScore"], rtol=1e-5
    )
