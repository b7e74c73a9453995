"""Learning-rate schedules (optax-compatible: step -> learning rate).

Parity target: reference utils/lr_schedulers.py:23-369 — constant,
constant_with_warmup, linear, cosine, cosine_with_minimum,
cosine_with_restarts, polynomial; all with linear warmup, unified
`get_scheduler` factory.

All schedules are jit-traceable (pure jnp) so they can live inside a
compiled train step.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def _warmup_factor(step, num_warmup_steps):
    return step.astype(jnp.float32) / jnp.maximum(1.0, num_warmup_steps)


def constant_schedule(base_lr: float) -> Schedule:
    return lambda step: jnp.full_like(jnp.asarray(step, jnp.float32), base_lr)


def constant_with_warmup_schedule(base_lr: float, num_warmup_steps: int) -> Schedule:
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        factor = jnp.where(step < num_warmup_steps, _warmup_factor(step, num_warmup_steps), 1.0)
        return base_lr * factor

    return fn


def linear_schedule(base_lr: float, num_warmup_steps: int, num_training_steps: int) -> Schedule:
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        decay = jnp.maximum(
            0.0,
            (num_training_steps - step)
            / max(1, num_training_steps - num_warmup_steps),
        )
        factor = jnp.where(step < num_warmup_steps, _warmup_factor(step, num_warmup_steps), decay)
        return base_lr * factor

    return fn


def cosine_schedule(base_lr: float, num_warmup_steps: int, num_training_steps: int) -> Schedule:
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        progress = (step - num_warmup_steps) / max(1, num_training_steps - num_warmup_steps)
        decay = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(math.pi * progress)))
        factor = jnp.where(step < num_warmup_steps, _warmup_factor(step, num_warmup_steps), decay)
        return base_lr * factor

    return fn


def cosine_with_minimum_schedule(
    base_lr: float, num_warmup_steps: int, num_training_steps: int, minimum_rate: float = 0.1
) -> Schedule:
    """Cosine annealing to `minimum_rate * base_lr` instead of 0
    (reference lr_schedulers.py:108-148)."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        progress = (step - num_warmup_steps) / max(1, num_training_steps - num_warmup_steps)
        cos_term = 0.5 * (1.0 + jnp.cos(math.pi * progress))
        decay = jnp.maximum(0.0, cos_term + minimum_rate - minimum_rate * cos_term)
        factor = jnp.where(step < num_warmup_steps, _warmup_factor(step, num_warmup_steps), decay)
        return base_lr * factor

    return fn


def cosine_with_restarts_schedule(
    base_lr: float, num_warmup_steps: int, num_training_steps: int, num_cycles: int = 1
) -> Schedule:
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        progress = (step - num_warmup_steps) / max(1, num_training_steps - num_warmup_steps)
        cyc = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(math.pi * ((num_cycles * progress) % 1.0))))
        decay = jnp.where(progress >= 1.0, 0.0, cyc)
        factor = jnp.where(step < num_warmup_steps, _warmup_factor(step, num_warmup_steps), decay)
        return base_lr * factor

    return fn


def polynomial_schedule(
    base_lr: float,
    num_warmup_steps: int,
    num_training_steps: int,
    lr_end: float = 1e-7,
    power: float = 1.0,
) -> Schedule:
    if not base_lr > lr_end:
        raise ValueError(f"lr_end ({lr_end}) must be smaller than initial lr ({base_lr})")

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        lr_range = base_lr - lr_end
        decay_steps = num_training_steps - num_warmup_steps
        pct_remaining = 1.0 - (step - num_warmup_steps) / decay_steps
        decay = (lr_range * pct_remaining**power + lr_end) / base_lr
        factor = jnp.where(
            step < num_warmup_steps,
            _warmup_factor(step, num_warmup_steps),
            jnp.where(step > num_training_steps, lr_end / base_lr, decay),
        )
        return base_lr * factor

    return fn


def get_schedule(
    name: str,
    base_lr: float,
    num_warmup_steps: Optional[int] = None,
    num_training_steps: Optional[int] = None,
    num_cycles: int = 1,
    power: float = 1.0,
    minimum_rate: float = 0.1,
) -> Schedule:
    """Unified factory (reference lr_schedulers.py:293-369)."""
    if name == "constant":
        return constant_schedule(base_lr)
    if num_warmup_steps is None:
        raise ValueError(f"{name} requires `num_warmup_steps`.")
    if name == "constant_with_warmup":
        return constant_with_warmup_schedule(base_lr, num_warmup_steps)
    if num_training_steps is None:
        raise ValueError(f"{name} requires `num_training_steps`.")
    if name == "linear":
        return linear_schedule(base_lr, num_warmup_steps, num_training_steps)
    if name == "cosine":
        return cosine_schedule(base_lr, num_warmup_steps, num_training_steps)
    if name == "cosine_with_minimum":
        return cosine_with_minimum_schedule(base_lr, num_warmup_steps, num_training_steps, minimum_rate)
    if name == "cosine_with_restarts":
        return cosine_with_restarts_schedule(base_lr, num_warmup_steps, num_training_steps, num_cycles)
    if name == "polynomial":
        return polynomial_schedule(base_lr, num_warmup_steps, num_training_steps, power=power)
    raise ValueError(f"Unknown scheduler {name!r}")
