"""LR schedules vs the reference lambda formulas; EMA decay schedule parity."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from maskbit_tpu.core.ema import EmaState, ema_decay, ema_update, init_ema
from maskbit_tpu.utils.lr_schedules import get_schedule

BASE_LR = 1e-4
WARM = 10
TOTAL = 100
STEPS = [0, 1, 5, 9, 10, 11, 50, 99, 100, 150]


def ref_lambda(name, step):
    """Direct transcription of the reference lr_lambda formulas."""
    if name == "constant":
        return 1.0
    if step < WARM:
        return step / max(1, WARM)
    if name == "constant_with_warmup":
        return 1.0
    progress = (step - WARM) / max(1, TOTAL - WARM)
    if name == "linear":
        return max(0.0, (TOTAL - step) / max(1, TOTAL - WARM))
    if name == "cosine":
        return max(0.0, 0.5 * (1 + math.cos(math.pi * progress)))
    if name == "cosine_with_minimum":
        cos_term = 0.5 * (1 + math.cos(math.pi * progress))
        return max(0.0, cos_term + 0.1 - 0.1 * cos_term)
    if name == "cosine_with_restarts":
        if progress >= 1.0:
            return 0.0
        return max(0.0, 0.5 * (1 + math.cos(math.pi * ((2.0 * progress) % 1.0))))
    if name == "polynomial":
        lr_end = 1e-7
        if step > TOTAL:
            return lr_end / BASE_LR
        pct = 1 - (step - WARM) / (TOTAL - WARM)
        return ((BASE_LR - lr_end) * pct**1.0 + lr_end) / BASE_LR
    raise ValueError(name)


@pytest.mark.parametrize(
    "name",
    ["constant", "constant_with_warmup", "linear", "cosine",
     "cosine_with_minimum", "cosine_with_restarts", "polynomial"],
)
def test_schedule_matches_reference(name):
    sched = get_schedule(name, BASE_LR, num_warmup_steps=WARM,
                         num_training_steps=TOTAL, num_cycles=2)
    for step in STEPS:
        expected = BASE_LR * ref_lambda(name, step)
        got = float(sched(jnp.asarray(step)))
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-12,
                                   err_msg=f"{name} at step {step}")


def test_ema_decay_schedule():
    # matches reference ema_model.get_decay (:96-116)
    def ref_decay(opt_step, decay=0.999, update_after_step=0):
        step = max(0, opt_step - update_after_step - 1)
        if step <= 0:
            return 0.0
        return min((1 + step) / (10 + step), decay)

    for s in [0, 1, 2, 5, 100, 100000]:
        np.testing.assert_allclose(
            float(ema_decay(jnp.asarray(s), decay=0.999)), ref_decay(s), rtol=1e-6
        )

    # warmup power-law mode
    got = float(ema_decay(jnp.asarray(100), decay=0.9999, use_ema_warmup=True,
                          inv_gamma=1.0, power=2.0 / 3.0))
    expected = min(1 - (1 + 99 / 1.0) ** (-2.0 / 3.0), 0.9999)
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_ema_update_blends():
    params = {"w": jnp.zeros((3,))}
    state = init_ema(params)
    new_params = {"w": jnp.ones((3,))}
    # step 1 -> internal step=max(0, 1-0-1)=0 -> decay 0 -> shadow == params
    state = ema_update(state, new_params, decay=0.5)
    np.testing.assert_allclose(np.asarray(state.params["w"]), 1.0)
    # subsequent steps blend with decay (1+s)/(10+s) capped at 0.5
    state = ema_update(state, {"w": jnp.zeros((3,))}, decay=0.5)
    d = min((1 + 1) / (10 + 1), 0.5)
    np.testing.assert_allclose(np.asarray(state.params["w"]), d, rtol=1e-6)
