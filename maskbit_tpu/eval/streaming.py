"""Streaming quality evaluators for the tokenizer and generator.

Parity target: reference evaluator/evaluator.py:145-640 —
  * TokenizerEvaluator: MAE/MSE/PSNR/SSIM (hand-rolled depthwise-conv SSIM,
    gaussian 11x11 sigma 1.5, reflect padding)/LPIPS/IS/rFID/codebook usage
    & entropy, all as streaming accumulators.
  * GeneratorEvaluator: fake-only IS + FID moments vs precomputed train
    stats.

TPU-first: per-batch contributions are computed in a jit'd device function
(NHWC); the running accumulators live on host in float64 (TPUs have no f64).
The accumulators are plain sums, so multi-host eval just sums them across
processes before `result()`.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from maskbit_tpu.eval import fid as fid_lib


def gaussian_kernel_2d(kernel_size=(11, 11), sigma=(1.5, 1.5)) -> np.ndarray:
    """Normalized 2D gaussian (matches the reference's
    gaussian_or_uniform_kernel, evaluator.py:96-142)."""

    def gaussian_1d(size, s):
        ksize_half = (size - 1) * 0.5
        k = np.linspace(-ksize_half, ksize_half, size)
        gauss = np.exp(-0.5 * (k / s) ** 2)
        return gauss / gauss.sum()

    kh = gaussian_1d(kernel_size[0], sigma[0])
    kw = gaussian_1d(kernel_size[1], sigma[1])
    return np.outer(kh, kw).astype(np.float32)


@partial(jax.jit, static_argnames=())
def _ssim_sum(real: jnp.ndarray, fake: jnp.ndarray) -> jnp.ndarray:
    """Sum over the batch of per-image mean SSIM (NHWC, data range 1.0)."""
    c1 = 0.01**2
    c2 = 0.03**2
    kernel = jnp.asarray(gaussian_kernel_2d())
    pad = 5
    channels = real.shape[-1]
    kern = kernel[:, :, None, None] * jnp.ones((1, 1, 1, channels), jnp.float32)

    def depthwise(x):
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=channels,
        )

    real = real.astype(jnp.float32)
    fake = fake.astype(jnp.float32)
    mu_f = depthwise(fake)
    mu_r = depthwise(real)
    sigma_f = depthwise(fake**2) - mu_f**2
    sigma_r = depthwise(real**2) - mu_r**2
    sigma_fr = depthwise(fake * real) - mu_f * mu_r

    a1 = 2 * mu_f * mu_r + c1
    a2 = 2 * sigma_fr + c2
    b1 = mu_f**2 + mu_r**2 + c1
    b2 = sigma_f + sigma_r + c2
    ssim_idx = (a1 * a2) / (b1 * b2)
    return jnp.sum(jnp.mean(ssim_idx, axis=(1, 2, 3)))


@jax.jit
def _pixel_sums(real: jnp.ndarray, fake: jnp.ndarray):
    real = real.astype(jnp.float32)
    fake = fake.astype(jnp.float32)
    dims = tuple(range(1, real.ndim))
    mae = jnp.sum(jnp.mean(jnp.abs(fake - real), axis=dims))
    mse_per = jnp.mean((fake - real) ** 2, axis=dims)
    mse = jnp.sum(mse_per)
    psnr = jnp.sum(10.0 * jnp.log10(1.0 / (mse_per + 1e-10)))
    return mae, mse, psnr


@jax.jit
def _inception_moments(probs: jnp.ndarray, eps: float = 1e-16):
    prob_sum = jnp.sum(probs, axis=0)
    kl_sum = jnp.sum(probs * jnp.log(probs + eps), axis=0)
    return prob_sum, kl_sum


class TokenizerEvaluator:
    """Streaming reconstruction-quality evaluator (reference :145-466)."""

    def __init__(
        self,
        inception_fn: Optional[Callable] = None,
        lpips_fn: Optional[Callable] = None,
        enable_rfid: bool = False,
        enable_inception_score: bool = False,
        enable_psnr_score: bool = False,
        enable_ssim_score: bool = False,
        enable_lpips_score: bool = False,
        enable_mse_error: bool = False,
        enable_mae_error: bool = False,
        enable_codebook_usage_measure: bool = False,
        enable_codebook_entropy_measure: bool = False,
        num_codebook_entries: int = 1024,
    ):
        """`inception_fn(uint8_images_nhwc) -> {'2048', 'logits_unbiased'}`;
        `lpips_fn(real, fake) -> (b,...) distances`. Both jit-ready callables
        with weights already bound."""
        if (enable_rfid or enable_inception_score) and inception_fn is None:
            raise ValueError("rFID / InceptionScore require an inception_fn")
        if enable_lpips_score and lpips_fn is None:
            raise ValueError("LPIPS requires an lpips_fn")
        self._inception_fn = inception_fn
        self._lpips_fn = lpips_fn
        self._enable_rfid = enable_rfid
        self._enable_inception_score = enable_inception_score
        self._enable_psnr_score = enable_psnr_score
        self._enable_ssim_score = enable_ssim_score
        self._enable_lpips_score = enable_lpips_score
        self._enable_mse_error = enable_mse_error
        self._enable_mae_error = enable_mae_error
        self._enable_codebook_usage_measure = enable_codebook_usage_measure
        self._enable_codebook_entropy_measure = enable_codebook_entropy_measure
        self._num_codebook_entries = num_codebook_entries
        self._is_eps = 1e-16
        self.reset_metrics()

    def reset_metrics(self):
        self._num_examples = 0
        self._num_updates = 0
        self._mae_sum = 0.0
        self._mse_sum = 0.0
        self._psnr_sum = 0.0
        self._ssim_sum = 0.0
        self._lpips_sum = 0.0
        self._is_prob_total = np.zeros(1008, np.float64)
        self._is_total_kl_d = np.zeros(1008, np.float64)
        self._rfid_real_total = np.zeros(2048, np.float64)
        self._rfid_fake_total = np.zeros(2048, np.float64)
        self._rfid_real_sigma = np.zeros((2048, 2048), np.float64)
        self._rfid_fake_sigma = np.zeros((2048, 2048), np.float64)
        self._codebook_set = set()
        self._codebook_frequencies = np.zeros(self._num_codebook_entries, np.float64)

    def update(self, real_images, fake_images, codebook_indices=None):
        """real/fake: NHWC float in [0, 1]."""
        real_images = jnp.asarray(real_images)
        fake_images = jnp.asarray(fake_images)
        batch_size = real_images.shape[0]
        self._num_examples += batch_size
        self._num_updates += 1

        if self._enable_mae_error or self._enable_mse_error or self._enable_psnr_score:
            mae, mse, psnr = _pixel_sums(real_images, fake_images)
            self._mae_sum += float(mae)
            self._mse_sum += float(mse)
            self._psnr_sum += float(psnr)

        if self._enable_ssim_score:
            self._ssim_sum += float(_ssim_sum(real_images, fake_images))

        if self._enable_inception_score or self._enable_rfid:
            fake_u8 = jnp.asarray(
                jnp.clip(fake_images * 255.0, 0, 255), jnp.uint8
            )
            feat_fake = self._inception_fn(fake_u8)
            probs = jax.nn.softmax(feat_fake["logits_unbiased"].astype(jnp.float32), axis=-1)

        if self._enable_inception_score:
            prob_sum, kl_sum = _inception_moments(probs, self._is_eps)
            self._is_prob_total += np.asarray(prob_sum, np.float64)
            self._is_total_kl_d += np.asarray(kl_sum, np.float64)

        if self._enable_rfid:
            real_u8 = jnp.asarray(jnp.clip(real_images * 255.0, 0, 255), jnp.uint8)
            feat_real = self._inception_fn(real_u8)
            f_real = np.asarray(feat_real["2048"], np.float64)
            f_fake = np.asarray(feat_fake["2048"], np.float64)
            self._rfid_real_total += f_real.sum(0)
            self._rfid_fake_total += f_fake.sum(0)
            self._rfid_real_sigma += f_real.T @ f_real
            self._rfid_fake_sigma += f_fake.T @ f_fake

        if self._enable_lpips_score:
            self._lpips_sum += float(jnp.sum(self._lpips_fn(real_images, fake_images)))

        if self._enable_codebook_usage_measure:
            self._codebook_set |= set(np.unique(np.asarray(codebook_indices)).tolist())

        if self._enable_codebook_entropy_measure:
            entries, counts = np.unique(np.asarray(codebook_indices), return_counts=True)
            self._codebook_frequencies[entries.astype(np.int64)] += counts.astype(np.float64)

    def merge_across_hosts(self) -> None:
        """Sum the accumulators over all JAX processes (no-op single-host).

        Everything is a plain sum; the codebook-usage set becomes a presence
        vector (union == elementwise max). Transport is the bit-exact f64
        allgather (process_allgather would downcast the f64 moments to f32)."""
        if jax.process_count() == 1:
            return
        from maskbit_tpu.parallel.mesh import (
            assert_host_agreement,
            process_allgather_f64,
        )

        # the enable flags gate the collectives below; they normally come
        # from config, but verify they really agree — a host whose flags
        # differ would issue a different collective sequence and deadlock
        # the pod silently instead of erroring
        assert_host_agreement(
            {
                "mae": self._enable_mae_error,
                "mse": self._enable_mse_error,
                "psnr": self._enable_psnr_score,
                "ssim": self._enable_ssim_score,
                "lpips": self._enable_lpips_score,
                "inception_score": self._enable_inception_score,
                "rfid": self._enable_rfid,
                "codebook_usage": self._enable_codebook_usage_measure,
                "codebook_entropy": self._enable_codebook_entropy_measure,
            },
            context="TokenizerEvaluator.merge_across_hosts",
        )

        def total(x):
            out = process_allgather_f64(x).sum(axis=0)
            return out[0] if np.ndim(np.asarray(x)) == 0 else out

        presence = np.zeros(self._num_codebook_entries, np.float64)
        if self._codebook_set:
            presence[np.asarray(sorted(self._codebook_set), np.int64)] = 1.0

        # gate each allgather on the metric's enable flag: the two 2048x2048
        # f64 rFID sigmas alone are 32 MB each, pure zeros when rFID is off
        # (the no-inception-weights fallback). Flags come from config, so
        # every host takes the SAME sequence of collectives.
        self._num_examples = int(total(self._num_examples))
        self._num_updates = int(total(self._num_updates))
        if self._enable_mae_error:
            self._mae_sum = float(total(self._mae_sum))
        if self._enable_mse_error:
            self._mse_sum = float(total(self._mse_sum))
        if self._enable_psnr_score:
            self._psnr_sum = float(total(self._psnr_sum))
        if self._enable_ssim_score:
            self._ssim_sum = float(total(self._ssim_sum))
        if self._enable_lpips_score:
            self._lpips_sum = float(total(self._lpips_sum))
        if self._enable_inception_score:
            self._is_prob_total = total(self._is_prob_total)
            self._is_total_kl_d = total(self._is_total_kl_d)
        if self._enable_rfid:
            self._rfid_real_total = total(self._rfid_real_total)
            self._rfid_fake_total = total(self._rfid_fake_total)
            self._rfid_real_sigma = total(self._rfid_real_sigma)
            self._rfid_fake_sigma = total(self._rfid_fake_sigma)
        if self._enable_codebook_usage_measure:
            merged_presence = np.minimum(total(presence), 1.0)
            self._codebook_set = set(np.nonzero(merged_presence)[0].tolist())
        if self._enable_codebook_entropy_measure:
            self._codebook_frequencies = total(self._codebook_frequencies)

    def merge_from(self, other: "TokenizerEvaluator") -> None:
        """Sum another evaluator's accumulators into this one (multi-host
        eval: each host evaluates its shard split, then host 0 merges)."""
        self._num_examples += other._num_examples
        self._num_updates += other._num_updates
        self._mae_sum += other._mae_sum
        self._mse_sum += other._mse_sum
        self._psnr_sum += other._psnr_sum
        self._ssim_sum += other._ssim_sum
        self._lpips_sum += other._lpips_sum
        self._is_prob_total += other._is_prob_total
        self._is_total_kl_d += other._is_total_kl_d
        self._rfid_real_total += other._rfid_real_total
        self._rfid_fake_total += other._rfid_fake_total
        self._rfid_real_sigma += other._rfid_real_sigma
        self._rfid_fake_sigma += other._rfid_fake_sigma
        self._codebook_set |= other._codebook_set
        self._codebook_frequencies += other._codebook_frequencies

    def result(self) -> Mapping[str, float]:
        if self._num_examples < 1:
            raise ValueError("No examples to evaluate.")
        out = {}
        n = self._num_examples
        if self._enable_mae_error:
            out["MAE"] = self._mae_sum / n
        if self._enable_mse_error:
            out["MSE"] = self._mse_sum / n
        if self._enable_psnr_score:
            out["PSNR"] = self._psnr_sum / n
        if self._enable_ssim_score:
            out["SSIM"] = self._ssim_sum / n
        if self._enable_inception_score:
            out["InceptionScore"] = fid_lib.inception_score_from_moments(
                self._is_prob_total, self._is_total_kl_d, n, self._is_eps
            )
        if self._enable_rfid:
            out["rFID"] = fid_lib.fid_from_moments(
                self._rfid_real_total, self._rfid_real_sigma,
                self._rfid_fake_total, self._rfid_fake_sigma, n,
            )
        if self._enable_lpips_score:
            out["LPIPS"] = self._lpips_sum / n
        if self._enable_codebook_usage_measure:
            out["CodebookUsage"] = len(self._codebook_set) / self._num_codebook_entries
        if self._enable_codebook_entropy_measure:
            probs = self._codebook_frequencies / self._codebook_frequencies.sum()
            out["CodebookEntropy"] = float(np.sum(-np.log2(probs + 1e-8) * probs))
        return out


class GeneratorEvaluator:
    """Fake-only IS + FID vs precomputed train stats (reference :469-640)."""

    def __init__(
        self,
        inception_fn: Callable,
        real_mu: Optional[np.ndarray] = None,
        real_sigma: Optional[np.ndarray] = None,
        enable_fid: bool = True,
        enable_inception_score: bool = True,
    ):
        self._inception_fn = inception_fn
        self._real_mu = real_mu
        self._real_sigma = real_sigma
        self._enable_fid = enable_fid and real_mu is not None
        self._enable_inception_score = enable_inception_score
        self._is_eps = 1e-16
        self.reset_metrics()

    def reset_metrics(self):
        self._num_examples = 0
        self._is_prob_total = np.zeros(1008, np.float64)
        self._is_total_kl_d = np.zeros(1008, np.float64)
        self._fake_total = np.zeros(2048, np.float64)
        self._fake_sigma = np.zeros((2048, 2048), np.float64)

    def update(self, fake_images):
        fake_images = jnp.asarray(fake_images)
        self._num_examples += fake_images.shape[0]
        fake_u8 = jnp.asarray(jnp.clip(fake_images * 255.0, 0, 255), jnp.uint8)
        feats = self._inception_fn(fake_u8)
        if self._enable_inception_score:
            probs = jax.nn.softmax(feats["logits_unbiased"].astype(jnp.float32), axis=-1)
            prob_sum, kl_sum = _inception_moments(probs, self._is_eps)
            self._is_prob_total += np.asarray(prob_sum, np.float64)
            self._is_total_kl_d += np.asarray(kl_sum, np.float64)
        if self._enable_fid:
            f = np.asarray(feats["2048"], np.float64)
            self._fake_total += f.sum(0)
            self._fake_sigma += f.T @ f

    def merge_from(self, other: "GeneratorEvaluator"):
        """Sum another evaluator's accumulators into this one (multi-host)."""
        self._num_examples += other._num_examples
        self._is_prob_total += other._is_prob_total
        self._is_total_kl_d += other._is_total_kl_d
        self._fake_total += other._fake_total
        self._fake_sigma += other._fake_sigma

    def merge_across_hosts(self) -> None:
        """Sum the accumulators over all JAX processes (no-op single-host).

        COLLECTIVE: every process must call it at the same point. The
        enable flags gate the collectives below, and `_enable_fid` derives
        from real_mu presence — a FILESYSTEM fact (the stats .npz) that can
        genuinely differ across hosts — so they are allgathered and checked
        first: a disagreement raises instead of deadlocking the pod.
        Transport is the bit-exact f64 allgather — see TokenizerEvaluator."""
        if jax.process_count() == 1:
            return
        from maskbit_tpu.parallel.mesh import (
            assert_host_agreement,
            process_allgather_f64,
        )

        assert_host_agreement(
            {
                "inception_score": self._enable_inception_score,
                "fid(real stats npz found)": self._enable_fid,
            },
            context="GeneratorEvaluator.merge_across_hosts",
        )

        def total(x):
            out = process_allgather_f64(x).sum(axis=0)
            return out[0] if np.ndim(np.asarray(x)) == 0 else out

        self._num_examples = int(total(self._num_examples))
        if self._enable_inception_score:
            self._is_prob_total = total(self._is_prob_total)
            self._is_total_kl_d = total(self._is_total_kl_d)
        if self._enable_fid:
            self._fake_total = total(self._fake_total)
            self._fake_sigma = total(self._fake_sigma)

    def result(self) -> Mapping[str, float]:
        if self._num_examples < 1:
            raise ValueError("No examples to evaluate.")
        out = {}
        n = self._num_examples
        if self._enable_inception_score:
            out["InceptionScore"] = fid_lib.inception_score_from_moments(
                self._is_prob_total, self._is_total_kl_d, n, self._is_eps
            )
        if self._enable_fid:
            mu_fake = self._fake_total / n
            sigma_fake = fid_lib.get_covariance(self._fake_sigma, self._fake_total, n)
            out["FID"] = fid_lib.frechet_distance(
                self._real_mu, self._real_sigma, mu_fake, sigma_fake
            )
        return out
