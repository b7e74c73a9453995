"""Iterative confidence-based masked sampling (MaskGIT-style) with CFG.

Parity target: reference modeling/modules/sampling.py:13-136, including the
subtle bits that matter for gFID:
  * CFG via doubled batch; guidance annealing none | linear | cosine^scale_pow
  * optional softmax-temperature annealing (0.5 + 0.8*(1-progress))
  * confidence = prob of sampled token, kept tokens pinned to +inf
  * Gumbel noise * randomize_temperature * (1 - progress) on log-confidence
  * re-mask count = clamp(floor(ratio * num_maskable), 1, num_masked-1),
    with num_masked taken from batch element 0 (reference sampling.py:109)
  * threshold = sorted confidence at index (count-1); re-mask conf <= thr.

TPU-first: the whole `num_steps` loop is ONE `jax.lax.scan` inside a single
jit — no host round-trips; the categorical draw, sort and re-mask all run
on-device with static shapes. The final bit-unpack + conv decode fuse into
the same program.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from maskbit_tpu.ops.bitops import combine_factorized_tokens
from maskbit_tpu.ops.masking import get_masking_ratio

# demo default label cycle (reference sampling.py:60-63):
# goldfish, chicken, tiger cat, hourglass, ship, dog, race car, airliner, teddy
DEFAULT_LABELS = (1, 7, 282, 604, 724, 179, 751, 404, 850)


class SamplingConfig(NamedTuple):
    softmax_temperature: float = 1.0
    randomize_temperature: float = 4.5
    mask_schedule_strategy: str = "linear"
    num_steps: int = 12
    guidance_scale: float = 3.0
    mask_token: int = 1024
    patch_size: int = 16
    guidance_annealing: str = "none"
    use_sampling_annealing: bool = False
    scale_pow: float = 4.0
    codebook_size: int = 1024
    codebook_splits: int = 1

    @classmethod
    def from_config(cls, mlm_cfg, vq_cfg) -> "SamplingConfig":
        """Build from `model.mlm_model` + `model.vq_model` config nodes."""
        codebook_size = vq_cfg.get("codebook_size", 1024)
        splits = mlm_cfg.get("codebook_splits", 1)
        bits = int(math.log2(codebook_size))
        return cls(
            softmax_temperature=mlm_cfg.get("softmax_temperature", 1.0),
            randomize_temperature=mlm_cfg.get("randomize_temperature", 4.5),
            mask_schedule_strategy=mlm_cfg.get("gen_mask_schedule_strategy", "arccos"),
            num_steps=mlm_cfg.get("num_steps", 12),
            guidance_scale=mlm_cfg.get("guidance_scale", 3.0),
            mask_token=int(2 ** (bits // splits)),
            patch_size=16,
            guidance_annealing=mlm_cfg.get("guidance_annealing", "none"),
            use_sampling_annealing=mlm_cfg.get("use_sampling_annealing", False),
            scale_pow=mlm_cfg.get("scale_pow", 4.0),
            codebook_size=codebook_size,
            codebook_splits=splits,
        )


def _guidance_scale_at(cfg: SamplingConfig, step: jnp.ndarray) -> jnp.ndarray:
    """guidance_scale * anneal(step) — reference sampling.py:91-98."""
    frac = step.astype(jnp.float32) / cfg.num_steps
    if cfg.guidance_annealing == "none":
        scale_step = jnp.float32(1.0)
    elif cfg.guidance_annealing == "linear":
        scale_step = frac
    elif cfg.guidance_annealing == "cosine":
        scale_step = 0.5 * (1.0 - jnp.cos((frac**cfg.scale_pow) * jnp.pi))
    else:
        raise ValueError(f"Unknown guidance_annealing {cfg.guidance_annealing!r}")
    return cfg.guidance_scale * scale_step


def confidence_remask(
    cfg: SamplingConfig,
    step: jnp.ndarray,
    mask: jnp.ndarray,
    masked_tokens: jnp.ndarray,
    sampled_tokens: jnp.ndarray,
    probabilities: jnp.ndarray,
    gumbel_noise: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pure re-mask math of one sampling step (reference sampling.py:109-130),
    with the categorical draw and Gumbel noise injected — enabling bit-exact
    parity tests against the reference with shared randomness.

    Returns (predicted_tokens, new_masked_tokens)."""
    num_samples = mask.shape[0]
    num_maskable = mask.shape[1] * mask.shape[2]
    progress = (step.astype(jnp.float32) + 1.0) / cfg.num_steps

    # reference quirk: the re-mask count derives from batch element 0
    num_masked = jnp.sum(mask[0])

    predicted_tokens = jnp.where(mask, sampled_tokens, masked_tokens)

    confidence = jnp.take_along_axis(
        probabilities, predicted_tokens[..., None], axis=-1
    )[..., 0]
    confidence = jnp.where(mask, confidence, jnp.inf)
    confidence = jnp.log(confidence) + gumbel_noise * cfg.randomize_temperature * (
        1.0 - progress
    )

    mask_ratio = get_masking_ratio(progress, mode=cfg.mask_schedule_strategy)
    mask_len = jnp.floor(mask_ratio * num_maskable)
    num_tokens_to_mask = jnp.clip(mask_len.astype(jnp.int32), 1, num_masked - 1)

    sorted_confidence = jnp.sort(confidence.reshape(num_samples, -1), axis=-1)
    threshold = jnp.take(sorted_confidence, num_tokens_to_mask - 1, axis=1)

    should_mask = confidence <= threshold[:, None, None]
    new_masked = jnp.where(should_mask, cfg.mask_token, predicted_tokens)
    return predicted_tokens, new_masked


def sample_tokens(
    logits_fn: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    key: jax.Array,
    labels: jnp.ndarray,
    cfg: SamplingConfig,
    return_history=False,
    injected: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Run the iterative unmasking loop; returns final (b, n, m) tokens.

    Args:
        logits_fn: (tokens (b,n,m), labels (b,), drop_mask (b,)) -> logits
            (b, n, m, ecs) — typically `model.apply` closed over params.
        key: PRNG key.
        labels: (b,) int class labels.
        cfg: sampling configuration.
        return_history: True -> also return the (steps, b, n, m) predicted
            tokens (reference `l_full_tokens`); "full" -> return
            (predicted, post-re-mask) pairs per step.
        injected: optional (token_draws, gumbel_draws), each
            (num_steps, b, n, m) — replaces the in-loop categorical draw and
            Gumbel noise so the REAL scan can be driven with shared
            randomness for end-to-end parity tests against the reference
            sampler (tests/test_e2e_parity_chain.py).
    """
    num_samples = labels.shape[0]
    spatial_size = cfg.patch_size**2
    num_splits = cfg.codebook_splits

    init_tokens = jnp.full(
        (num_samples, spatial_size, num_splits), cfg.mask_token, dtype=jnp.int32
    )
    use_cfg = cfg.guidance_scale != 0.0

    def step_fn(carry, xs):
        if injected is None:
            step = xs
        else:
            step, injected_tokens, injected_gumbel = xs
        masked_tokens, _, key = carry
        key, key_cat, key_gumbel = jax.random.split(key, 3)
        progress = (step.astype(jnp.float32) + 1.0) / cfg.num_steps
        mask = masked_tokens == cfg.mask_token

        if use_cfg:
            tokens2 = jnp.concatenate([masked_tokens, masked_tokens], axis=0)
            labels2 = jnp.concatenate([labels, labels], axis=0)
            drop2 = jnp.concatenate(
                [jnp.zeros((num_samples,), bool), jnp.ones((num_samples,), bool)], axis=0
            )
            logits = logits_fn(tokens2, labels2, drop2)
            logits_c, logits_u = jnp.split(logits, 2, axis=0)
            scale = _guidance_scale_at(cfg, step)
            logits = logits_c + scale * (logits_c - logits_u)
        else:
            logits = logits_fn(
                masked_tokens, labels, jnp.zeros((num_samples,), bool)
            )

        if cfg.use_sampling_annealing:
            softmax_temperature = 0.5 + 0.8 * (1.0 - progress)
        else:
            softmax_temperature = cfg.softmax_temperature

        scaled_logits = logits.astype(jnp.float32) / softmax_temperature
        if injected is None:
            sampled = jax.random.categorical(key_cat, scaled_logits, axis=-1).astype(jnp.int32)
            gumbel_noise = jax.random.gumbel(key_gumbel, sampled.shape)
        else:
            sampled = injected_tokens
            gumbel_noise = injected_gumbel
        probabilities = jax.nn.softmax(scaled_logits, axis=-1)

        predicted_tokens, new_masked = confidence_remask(
            cfg, step, mask, masked_tokens, sampled, probabilities, gumbel_noise
        )

        if return_history == "full":
            out = (predicted_tokens, new_masked)
        elif return_history:
            out = predicted_tokens
        else:
            out = None
        return (new_masked, predicted_tokens, key), out

    steps = jnp.arange(cfg.num_steps)
    if injected is None:
        xs = steps
    else:
        xs = (steps, jnp.asarray(injected[0], jnp.int32),
              jnp.asarray(injected[1], jnp.float32))
    (_, final_predicted, _), history = jax.lax.scan(
        step_fn, (init_tokens, init_tokens, key), xs
    )
    # the reference returns the final step's predicted tokens *before*
    # the last re-masking is applied (sampling.py:131-133)
    return final_predicted, history


def make_sampler(
    generator,
    tokenizer,
    cfg: SamplingConfig,
    jit: bool = True,
) -> Callable:
    """Build images = f(gen_vars, tok_vars, key, labels).

    The returned callable runs the full sampling loop + token decode as one
    XLA program (reference sample(): modeling/modules/sampling.py:13-136).
    """

    def _sample(gen_vars, tok_vars, key: jax.Array, labels: jnp.ndarray):
        def logits_fn(tokens, lbls, drop):
            return generator.apply(gen_vars, tokens, lbls, drop, deterministic=True)

        predicted_tokens, history = sample_tokens(logits_fn, key, labels, cfg)
        combined = combine_factorized_tokens(
            predicted_tokens, cfg.codebook_size, cfg.codebook_splits
        )
        images = tokenizer.apply(tok_vars, combined, method="decode_tokens")
        return images, history

    return jax.jit(_sample) if jit else _sample


def default_labels(num_samples: int, key: Optional[jax.Array] = None) -> jnp.ndarray:
    """The reference demo label cycle (sampling.py:60-63)."""
    if key is None:
        key = jax.random.key(0)
    rand = jax.random.randint(key, (1,), 0, 999)
    base = jnp.concatenate([jnp.asarray(DEFAULT_LABELS, jnp.int32), rand.astype(jnp.int32)])
    # reference quirk (sampling.py:60-63), replicated deliberately: reps
    # FLOORS, so e.g. 15 requested -> 10 labels returned. Callers derive
    # their count from the returned shape; do NOT 'fix' to ceil - parity.
    reps = max(1, num_samples // 10)
    return jnp.tile(base, reps)[:num_samples]
