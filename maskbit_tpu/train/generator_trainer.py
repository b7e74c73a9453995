"""Stage-II (MaskBit generator) training step.

Parity target: the hot loop of reference scripts/train_maskbit.py:352-522:
  * frozen Stage-I tokenizer encodes images to tokens inline (no_grad)
  * factorized-token split (codebook_splits)
  * arccos-schedule random masking
  * class-label dropout (CFG training)
  * MLM cross-entropy with label smoothing, grad clip, AdamW, EMA

TPU-first: the frozen tokenizer encode is fused into the same jit as the
transformer fwd/bwd (one XLA program per step); randomness is explicit
`jax.random` keys split per consumer.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax import lax

from maskbit_tpu.core.ema import EmaState, ema_update, init_ema
from maskbit_tpu.losses.mlm import MLMLossConfig, mlm_loss
from maskbit_tpu.ops.bitops import split_factorized_tokens
from maskbit_tpu.ops.masking import get_mask_tokens


class GeneratorTrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt: Any
    ema: Optional[EmaState]


def init_generator_train_state(
    model,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    use_ema: bool = True,
) -> GeneratorTrainState:
    tokens = jnp.zeros((1, model.seq_len, model.codebook_splits), jnp.int32)
    labels = jnp.zeros((1,), jnp.int32)
    variables = model.init(rng, tokens, labels)
    params = variables["params"]
    return GeneratorTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt=tx.init(params),
        ema=init_ema(params) if use_ema else None,
    )


def _mlm_step_core(
    model, tx, mlm_cfg, codebook_size, mask_schedule, class_label_dropout,
    ema_kwargs, log_param_grad_norms,
):
    """Shared MLM update given raw (b, n) integer tokens."""
    splits = model.codebook_splits
    mask_token = model.mask_token

    def update(state: GeneratorTrainState, tokens, labels, rng):
        rng_mask, rng_drop, rng_dropout = jax.random.split(rng, 3)
        split_tokens = split_factorized_tokens(tokens, codebook_size, splits)
        masked_tokens, masks = get_mask_tokens(
            rng_mask, split_tokens, mask_token, mode=mask_schedule
        )
        drop_label_mask = (
            jax.random.uniform(rng_drop, (tokens.shape[0],)) < class_label_dropout
        )

        def loss_fn(params):
            logits = model.apply(
                {"params": params},
                masked_tokens,
                labels,
                drop_label_mask,
                deterministic=False,
                rngs={"dropout": rng_dropout},
            )
            loss, loss_dict = mlm_loss(logits, split_tokens, masks, mlm_cfg)
            # non-scalar viz payloads (underscore keys; CLI pops them):
            # ground-truth + argmax-predicted tokens for the recon-vs-pred
            # strips (reference train_maskbit.py:472-480)
            loss_dict = dict(
                loss_dict,
                _input_tokens=split_tokens,
                _predicted_tokens=lax.stop_gradient(jnp.argmax(logits, axis=-1)),
            )
            return loss, loss_dict

        (loss, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        loss_dict = dict(loss_dict, grad_norm=optax.global_norm(grads))
        updates, new_opt = tx.update(grads, state.opt, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_ema = state.ema
        if state.ema is not None:
            new_ema = ema_update(state.ema, new_params, **ema_kwargs)

        new_state = GeneratorTrainState(
            step=state.step + 1, params=new_params, opt=new_opt, ema=new_ema
        )
        metrics = dict(loss_dict)
        metrics["train/masked_fraction"] = jnp.mean(masks.astype(jnp.float32))
        if log_param_grad_norms:
            metrics.update(per_param_grad_norms(grads))
        return new_state, metrics

    return update


def make_generator_train_step(
    model,
    tokenizer,
    tx: optax.GradientTransformation,
    mlm_cfg: MLMLossConfig,
    mask_schedule: str = "arccos",
    class_label_dropout: float = 0.1,
    ema_kwargs: Optional[Mapping[str, Any]] = None,
    log_param_grad_norms: bool = False,
) -> Callable:
    """Build train_step(state, tokenizer_vars, images, labels, rng).

    The frozen Stage-I tokenizer encode runs inline inside the jit
    (reference train_maskbit.py:362-365); images NHWC in [0, 1].
    """
    update = _mlm_step_core(
        model, tx, mlm_cfg, tokenizer.codebook_size, mask_schedule,
        class_label_dropout, dict(ema_kwargs or {}), log_param_grad_norms,
    )

    def train_step(state: GeneratorTrainState, tokenizer_vars, images, labels, rng):
        tokens_grid = tokenizer.apply(tokenizer_vars, images, method="tokenize")
        tokens = lax.stop_gradient(tokens_grid.reshape(images.shape[0], -1))
        return update(state, tokens, labels, rng)

    return train_step


def make_generator_train_step_from_tokens(
    model,
    codebook_size: int,
    tx: optax.GradientTransformation,
    mlm_cfg: MLMLossConfig,
    mask_schedule: str = "arccos",
    class_label_dropout: float = 0.1,
    ema_kwargs: Optional[Mapping[str, Any]] = None,
    log_param_grad_norms: bool = False,
) -> Callable:
    """Build train_step(state, tokens (b, n) int32, labels, rng) for
    pre-tokenized datasets (data/token_shards.py) — no tokenizer in the step."""
    update = _mlm_step_core(
        model, tx, mlm_cfg, codebook_size, mask_schedule,
        class_label_dropout, dict(ema_kwargs or {}), log_param_grad_norms,
    )

    def train_step(state: GeneratorTrainState, tokens, labels, rng):
        return update(state, tokens.astype(jnp.int32), labels, rng)

    return train_step


def per_param_grad_norms(grads) -> dict:
    """Flat {path: norm} dict for the reference's periodic per-parameter
    grad-norm dump (scripts/train_tokenizer.py:656-661)."""
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    out = {}
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        out[f"grad_norm/{name}"] = jnp.linalg.norm(leaf.reshape(-1))
    return out
