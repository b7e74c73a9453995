"""Masked-language-modeling loss for Stage-II training.

Parity target: reference modeling/modules/losses.py:289-339 (`MLMLoss`) —
cross-entropy with label smoothing over ALL positions, plus masked-only
loss/accuracy diagnostics and the (accuracy)^m metric, optional x-splits
scaling.

The reference indexes the masked subset (`inputs[masks]`, dynamic shape);
here the same quantities are computed as mask-weighted means — identical
values, static shapes, jit-friendly.
"""

from __future__ import annotations

from typing import Mapping, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class MLMLossConfig(NamedTuple):
    label_smoothing: float = 0.1
    sum_splits: bool = False

    @classmethod
    def from_config(cls, cfg) -> "MLMLossConfig":
        return cls(
            label_smoothing=cfg.get("label_smoothing", 0.1),
            sum_splits=cfg.get("sum_splits", False),
        )


def _smoothed_ce(logits: jnp.ndarray, targets: jnp.ndarray, label_smoothing: float) -> jnp.ndarray:
    """Per-element cross entropy with label smoothing (torch convention:
    (1-eps) * NLL(target) + eps * mean_c NLL(c))."""
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    num_classes = logits.shape[-1]
    nll_target = -jnp.take_along_axis(log_probs, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    mean_nll = -jnp.mean(log_probs, axis=-1)
    return (1.0 - label_smoothing) * nll_target + label_smoothing * mean_nll


def mlm_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    masks: jnp.ndarray,
    cfg: MLMLossConfig = MLMLossConfig(),
) -> Tuple[jnp.ndarray, Mapping[str, jnp.ndarray]]:
    """Args: logits (b, n, m, C), targets (b, n, m) ints, masks (b, n, m) bool."""
    m = logits.shape[2]
    ce = _smoothed_ce(logits, targets, cfg.label_smoothing)
    loss = jnp.mean(ce)

    predictions = jnp.argmax(logits, axis=-1)
    correct = (predictions == targets).astype(jnp.float32)
    correct_tokens = jnp.mean(correct) ** m

    mask_f = masks.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(mask_f), 1.0)
    masked_loss = jnp.sum(ce * mask_f) / denom
    masked_correct_tokens = (jnp.sum(correct * mask_f) / denom) ** m

    if cfg.sum_splits:
        loss = loss * m
        masked_loss = masked_loss * m

    loss_dict = dict(
        mlm_loss=loss,
        correct_tokens=correct_tokens,
        masked_token_loss=masked_loss,
        masked_correct_tokens=masked_correct_tokens,
    )
    return loss, loss_dict
