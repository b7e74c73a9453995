"""ADM-suite-compatible generation evaluator (the headline gFID protocol).

Parity target: reference utils/adm_eval_suite.py — FIDStatistics with the
TTUR frechet distance, activation computation over [0,255] NHWC batches,
`read_statistics` for the precomputed train_imagenet256_stats.npz format,
and the OpenAI improved-GAN Inception Score with split_size=5000.

The TF1 frozen-graph InceptionV3 is replaced by the JAX port
(eval/inception.py) — with pt-fid weights its pool_3-equivalent '2048'
features track the TF graph closely (the pt-fid weights were ported from
the same TF checkpoint).
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import jax.numpy as jnp
import numpy as np

from maskbit_tpu.eval.fid import frechet_distance


class FIDStatistics:
    def __init__(self, mu: np.ndarray, sigma: np.ndarray):
        self.mu = mu
        self.sigma = sigma

    def frechet_distance(self, other: "FIDStatistics", eps: float = 1e-6) -> float:
        assert self.mu.shape == other.mu.shape
        assert self.sigma.shape == other.sigma.shape
        return frechet_distance(self.mu, self.sigma, other.mu, other.sigma, eps=eps)


class Evaluator:
    """ADM-protocol evaluator over a bound inception function.

    `inception_fn(images_f32_0_255_nhwc) -> {'2048', 'logits_unbiased'}`.
    """

    def __init__(self, inception_fn: Callable, softmax_batch_size: int = 512):
        self._inception_fn = inception_fn
        self.softmax_batch_size = softmax_batch_size

    def warmup(self):
        self.compute_activations([np.zeros((1, 64, 64, 3), np.float32)])

    def compute_activations(self, batches: Iterable[np.ndarray]) -> np.ndarray:
        """NHWC [0, 255] batches -> (N, 2048) pool features."""
        preds = []
        for batch in batches:
            feats = self._inception_fn(jnp.asarray(batch, jnp.float32))
            preds.append(np.asarray(feats["2048"], np.float64))
        return np.concatenate(preds, axis=0)

    def compute_logits(self, batches: Iterable[np.ndarray]) -> np.ndarray:
        logits = []
        for batch in batches:
            feats = self._inception_fn(jnp.asarray(batch, jnp.float32))
            logits.append(np.asarray(feats["logits_unbiased"], np.float64))
        return np.concatenate(logits, axis=0)

    def read_statistics(self, npz_path: str, activations: Optional[np.ndarray]) -> FIDStatistics:
        obj = np.load(npz_path)
        if "mu" in list(obj.keys()):
            return FIDStatistics(obj["mu"], obj["sigma"])
        return self.compute_statistics(activations)

    def compute_statistics(self, activations: np.ndarray) -> FIDStatistics:
        mu = np.mean(activations, axis=0)
        sigma = np.cov(activations, rowvar=False)
        return FIDStatistics(mu, sigma)

    def compute_inception_score_from_logits(
        self, logits: np.ndarray, split_size: int = 5000
    ) -> float:
        """OpenAI improved-GAN IS over batched softmax splits."""
        e = np.exp(logits - logits.max(axis=-1, keepdims=True))
        preds = e / e.sum(axis=-1, keepdims=True)
        scores = []
        for i in range(0, len(preds), split_size):
            part = preds[i : i + split_size]
            kl = part * (np.log(part) - np.log(np.expand_dims(np.mean(part, 0), 0)))
            kl = np.mean(np.sum(kl, 1))
            scores.append(np.exp(kl))
        return float(np.mean(scores))
