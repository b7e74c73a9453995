"""Exponential moving average of a parameter pytree.

Parity target: reference modeling/modules/ema_model.py:13-259 — decay warmup
schedules ((1+step)/(10+step) or power-law), update_after_step gating,
update_every thinning, min_decay floor, store/copy_to/restore swap protocol.

TPU-first: the EMA is a pure pytree-in/pytree-out function that lives inside
the jit'd train step — no parameter copies cross the host boundary.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    params: Any  # shadow parameter pytree
    step: jnp.ndarray  # int32 optimization step counter


def init_ema(params) -> EmaState:
    # a REAL copy, not jnp.asarray (a no-op on jax arrays): the shadow must
    # not alias the live params, or the first donated train step
    # (donate_argnums=0 in the CLIs) would donate the same buffer twice
    return EmaState(
        params=jax.tree.map(lambda x: jnp.asarray(x).copy(), params),
        step=jnp.zeros((), jnp.int32),
    )


def ema_decay(
    optimization_step: jnp.ndarray,
    decay: float = 0.9999,
    min_decay: float = 0.0,
    update_after_step: int = 0,
    use_ema_warmup: bool = False,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
) -> jnp.ndarray:
    """Decay factor at a given step (reference ema_model.py:96-116)."""
    step = jnp.maximum(0, optimization_step - update_after_step - 1).astype(jnp.float32)
    if use_ema_warmup:
        value = 1.0 - (1.0 + step / inv_gamma) ** -power
    else:
        value = (1.0 + step) / (10.0 + step)
    value = jnp.minimum(value, decay)
    value = jnp.maximum(value, min_decay)
    return jnp.where(step <= 0, 0.0, value)


def ema_update(
    state: EmaState,
    new_params,
    decay: float = 0.9999,
    min_decay: float = 0.0,
    update_after_step: int = 0,
    use_ema_warmup: bool = False,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
    update_every: int = 1,
) -> EmaState:
    """One EMA step: shadow <- shadow - (1-d) * (shadow - params)."""
    step = state.step + 1
    d = ema_decay(step, decay, min_decay, update_after_step, use_ema_warmup, inv_gamma, power)

    def blend(shadow, param):
        return shadow - (1.0 - d) * (shadow - param.astype(shadow.dtype))

    updated = jax.tree.map(blend, state.params, new_params)
    if update_every > 1:
        do_update = ((step - 1) % update_every) == 0
        updated = jax.tree.map(
            lambda new, old: jnp.where(do_update, new, old), updated, state.params
        )
    return EmaState(params=updated, step=step)
