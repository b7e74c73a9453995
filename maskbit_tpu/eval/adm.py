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


class AdmMomentAccumulator:
    """Reduction-friendly ADM-protocol accumulator for multi-host eval.

    Holds the FID moments in f64 — activation sum, outer-product sum and
    count (the streaming form of reference evaluator/evaluator.py:359-364)
    — plus per-IS-split moments: Σᵢ Σ_c p log p (scalar) and Σᵢ p (class
    vector) per split, keyed by each sample's GLOBAL index so split
    boundaries are exact under any host partitioning (strided or
    contiguous). All terms are plain sums, so per-host partials merge
    associatively to exactly the single-host result; a pod reduces ~32 MB
    of moments instead of gathering 50k × 2048 activations (SURVEY §2.5).

    IS identity used:  KL(split) = (Σ p·log p)/n − Σ_c p̄_c log p̄_c with
    p̄ = (Σ p)/n — algebraically equal to the reference's
    `mean_i Σ_c p(log p − log p̄)` (adm_eval_suite.py:135-148 semantics).
    """

    def __init__(self, dim: int = 2048, nclass: int = 1008,
                 total_samples: int = 50_000, split_size: int = 5000):
        self.split_size = split_size
        num_splits = max(1, (total_samples + split_size - 1) // split_size)
        self.count = 0
        self.act_sum = np.zeros(dim, np.float64)
        self.act_outer = np.zeros((dim, dim), np.float64)
        self.split_count = np.zeros(num_splits, np.int64)
        self.split_plogp = np.zeros(num_splits, np.float64)
        self.split_prob_sum = np.zeros((num_splits, nclass), np.float64)

    def update(self, acts: np.ndarray, logits: np.ndarray,
               global_indices: np.ndarray) -> None:
        acts = np.asarray(acts, np.float64)
        logits = np.asarray(logits, np.float64)
        self.count += len(acts)
        self.act_sum += acts.sum(axis=0)
        self.act_outer += acts.T @ acts
        e = np.exp(logits - logits.max(axis=-1, keepdims=True))
        probs = e / e.sum(axis=-1, keepdims=True)
        splits = np.asarray(global_indices) // self.split_size
        np.add.at(self.split_count, splits, 1)
        np.add.at(self.split_plogp, splits, np.sum(probs * np.log(probs), axis=-1))
        np.add.at(self.split_prob_sum, splits, probs)

    # -- cross-host reduction ------------------------------------------------
    _ARRAYS = ("act_sum", "act_outer", "split_count", "split_plogp", "split_prob_sum")

    def state(self) -> dict:
        out = {name: getattr(self, name) for name in self._ARRAYS}
        out["count"] = np.asarray(self.count, np.int64)
        return out

    def merge_state(self, state: dict) -> None:
        self.count += int(state["count"])
        for name in self._ARRAYS:
            getattr(self, name).__iadd__(np.asarray(state[name]))

    def merge_across_hosts(self) -> None:
        """Sum partial moments over all JAX processes (bit-exact reduction:
        the f64 moments travel as raw bits, see process_allgather_f64)."""
        import jax

        if jax.process_count() == 1:
            return
        from maskbit_tpu.parallel.mesh import process_allgather_f64

        state = self.state()
        self.count = int(np.sum(process_allgather_f64(state["count"])))
        for name in self._ARRAYS:
            merged = np.sum(process_allgather_f64(state[name]), axis=0)
            setattr(self, name, merged.astype(getattr(self, name).dtype))

    # -- results ---------------------------------------------------------------
    def fid_statistics(self) -> FIDStatistics:
        from maskbit_tpu.eval.fid import get_covariance

        mu = self.act_sum / self.count
        # unbiased covariance == np.cov(acts, rowvar=False) (ddof=1); one
        # shared implementation of the moment formula (eval/fid.py)
        sigma = get_covariance(self.act_outer, self.act_sum, self.count)
        return FIDStatistics(mu, sigma)

    def inception_score(self) -> float:
        scores = []
        for k in range(len(self.split_count)):
            n = int(self.split_count[k])
            if n == 0:
                continue
            pbar = self.split_prob_sum[k] / n
            kl = self.split_plogp[k] / n - float(np.sum(pbar * np.log(pbar)))
            scores.append(np.exp(kl))
        return float(np.mean(scores))
