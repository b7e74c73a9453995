"""GAN loss functions and gates.

Parity target: reference modeling/modules/gan_utils.py:28-163 —
hinge/vanilla/non-saturating D & G losses (with the numerically stable
sigmoid cross-entropy), LeCam regularization, `adopt_weight` step gating.

All functions are pure jnp; `adopt_weight` takes a traced step so it can
live inside a jit'd train step (jnp.where, not Python if).
"""

from __future__ import annotations

import jax.numpy as jnp


def adopt_weight(weight, global_step, threshold: int = 0, value: float = 0.0):
    """weight if global_step >= threshold else value (jit-safe)."""
    return jnp.where(jnp.asarray(global_step) < threshold, value, weight)


def compute_lecam_loss(
    logits_real_mean: jnp.ndarray,
    logits_fake_mean: jnp.ndarray,
    ema_logits_real_mean: jnp.ndarray,
    ema_logits_fake_mean: jnp.ndarray,
) -> jnp.ndarray:
    """LeCam regularizer (reference gan_utils.py:35-54)."""
    lecam = jnp.mean(jnp.maximum(logits_real_mean - ema_logits_fake_mean, 0.0) ** 2)
    lecam += jnp.mean(jnp.maximum(ema_logits_real_mean - logits_fake_mean, 0.0) ** 2)
    return lecam


def hinge_g_loss(logits_fake: jnp.ndarray) -> jnp.ndarray:
    return -jnp.mean(logits_fake)


def hinge_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray) -> jnp.ndarray:
    loss_real = jnp.mean(jnp.maximum(1.0 - logits_real, 0.0))
    loss_fake = jnp.mean(jnp.maximum(1.0 + logits_fake, 0.0))
    return 0.5 * (loss_real + loss_fake)


def sigmoid_cross_entropy_with_logits(logits: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    """Stable formulation: max(x, 0) - x*z + log1p(exp(-|x|))
    (reference gan_utils.py:86-114, credits Magvit)."""
    zeros = jnp.zeros_like(logits)
    cond = logits >= zeros
    relu_logits = jnp.where(cond, logits, zeros)
    neg_abs_logits = jnp.where(cond, -logits, logits)
    return relu_logits - logits * label + jnp.log1p(jnp.exp(neg_abs_logits))


def non_saturating_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray) -> jnp.ndarray:
    real_loss = jnp.mean(
        sigmoid_cross_entropy_with_logits(logits_real, jnp.ones_like(logits_real))
    )
    fake_loss = jnp.mean(
        sigmoid_cross_entropy_with_logits(logits_fake, jnp.zeros_like(logits_fake))
    )
    return real_loss + fake_loss


def non_saturating_g_loss(logits_fake: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(
        sigmoid_cross_entropy_with_logits(logits_fake, jnp.ones_like(logits_fake))
    )


def vanilla_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray) -> jnp.ndarray:
    softplus = lambda x: jnp.logaddexp(x, 0.0)
    return 0.5 * (jnp.mean(softplus(-logits_real)) + jnp.mean(softplus(logits_fake)))


D_LOSSES = {
    "hinge": hinge_d_loss,
    "vanilla": vanilla_d_loss,
    "non-saturating": non_saturating_d_loss,
}

# NB: the reference maps "vanilla" generators to hinge_g_loss too (losses.py:73-80)
G_LOSSES = {
    "hinge": hinge_g_loss,
    "vanilla": hinge_g_loss,
    "non-saturating": non_saturating_g_loss,
}
