"""Bit-exact sampler parity vs the reference sample() with shared randomness.

Strategy: pre-draw the categorical samples and Gumbel noise with numpy, feed
the SAME draws to (a) the reference torch sample() — via mocked
torch.distributions classes and a mock model returning per-step logit
tables — and (b) this framework's step math (confidence_remask + the CFG
combination), then compare every step's predicted/masked tokens exactly.

This pins the gFID-critical details: CFG combination + cosine annealing,
temperature scaling, confidence gather semantics, +inf pinning, Gumbel
noise scaling by (1-progress), the element-[0] re-mask count quirk, the
clamp to [1, num_masked-1], and the sort/threshold tie behavior.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from maskbit_tpu.sampling.sample import SamplingConfig, confidence_remask  # noqa: E402

from reference_compat import import_reference  # noqa: E402

import_reference()

B, N, M, C = 3, 16, 2, 8  # batch, positions, splits, effective codebook
STEPS = 6
MASK_TOKEN = C


def _make_draws(seed):
    rng = np.random.default_rng(seed)
    logit_tables = rng.normal(size=(STEPS, 2 * B, N, M, C)).astype(np.float32) * 3
    token_draws = rng.integers(0, C, size=(STEPS, B, N, M)).astype(np.int64)
    gumbel_draws = rng.gumbel(size=(STEPS, B, N, M)).astype(np.float32)
    return logit_tables, token_draws, gumbel_draws


class _MockModel:
    device = torch.device("cpu")

    def __init__(self, logit_tables):
        self.logit_tables = logit_tables
        self.call_idx = 0

    def eval(self):
        return self

    def __call__(self, tokens, labels, drop):
        out = torch.from_numpy(self.logit_tables[self.call_idx][: tokens.shape[0]])
        self.call_idx += 1
        return out


class _MockVqgan:
    def eval(self):
        return self

    def decode_tokens(self, tokens):
        return tokens  # pass tokens through as the "image"


class _InjectedCategorical:
    draws = None
    idx = 0

    def __init__(self, probs):
        pass

    def sample(self):
        out = torch.from_numpy(_InjectedCategorical.draws[_InjectedCategorical.idx])
        _InjectedCategorical.idx += 1
        return out


class _InjectedGumbel:
    draws = None
    idx = 0

    def __init__(self, loc, scale):
        pass

    def sample(self, size):
        out = torch.from_numpy(_InjectedGumbel.draws[_InjectedGumbel.idx])
        _InjectedGumbel.idx += 1
        return out


def _run_reference(cfg: SamplingConfig, logit_tables, token_draws, gumbel_draws):
    from modeling.modules import sampling as ref_sampling

    _InjectedCategorical.draws = token_draws
    _InjectedCategorical.idx = 0
    _InjectedGumbel.draws = gumbel_draws
    _InjectedGumbel.idx = 0

    orig_cat = torch.distributions.Categorical
    orig_gum = torch.distributions.Gumbel
    torch.distributions.Categorical = _InjectedCategorical
    torch.distributions.Gumbel = _InjectedGumbel
    try:
        labels = torch.arange(B, dtype=torch.long)
        generated, history = ref_sampling.sample(
            _MockModel(logit_tables),
            _MockVqgan(),
            num_samples=B,
            labels=labels,
            softmax_temperature=cfg.softmax_temperature,
            randomize_temperature=cfg.randomize_temperature,
            mask_schedule_strategy=cfg.mask_schedule_strategy,
            num_steps=cfg.num_steps,
            guidance_scale=cfg.guidance_scale,
            mask_token=cfg.mask_token,
            patch_size=4,  # spatial_size = 16 = N
            guidance_annealing=cfg.guidance_annealing,
            use_sampling_annealing=cfg.use_sampling_annealing,
            scale_pow=cfg.scale_pow,
            codebook_size=cfg.codebook_size,
            codebook_splits=cfg.codebook_splits,
        )
    finally:
        torch.distributions.Categorical = orig_cat
        torch.distributions.Gumbel = orig_gum
    return [h.numpy() for h in history]


def _run_ours(cfg: SamplingConfig, logit_tables, token_draws, gumbel_draws):
    import jax

    masked = jnp.full((B, N, M), cfg.mask_token, jnp.int32)
    history = []
    for i in range(cfg.num_steps):
        mask = masked == cfg.mask_token
        progress = (i + 1) / cfg.num_steps
        logits = jnp.asarray(logit_tables[i])
        logits_c, logits_u = logits[:B], logits[B:]
        if cfg.guidance_scale != 0.0:
            if cfg.guidance_annealing == "none":
                scale_step = 1.0
            elif cfg.guidance_annealing == "linear":
                scale_step = i / cfg.num_steps
            elif cfg.guidance_annealing == "cosine":
                scale_step = 0.5 * (1 - np.cos(((i / cfg.num_steps) ** cfg.scale_pow) * np.pi))
            scale = cfg.guidance_scale * scale_step
            logits = logits_c + scale * (logits_c - logits_u)
        else:
            logits = logits_c
        temperature = (
            0.5 + 0.8 * (1 - progress) if cfg.use_sampling_annealing
            else cfg.softmax_temperature
        )
        probs = jax.nn.softmax(logits / temperature, axis=-1)
        predicted, masked = confidence_remask(
            cfg, jnp.asarray(i), mask, masked,
            jnp.asarray(token_draws[i], jnp.int32),
            probs,
            jnp.asarray(gumbel_draws[i]),
        )
        history.append(np.asarray(predicted))
    return history


CASES = [
    dict(guidance_scale=3.0, guidance_annealing="cosine", scale_pow=2.5,
         randomize_temperature=4.5, mask_schedule_strategy="arccos"),
    dict(guidance_scale=2.0, guidance_annealing="linear", scale_pow=1.0,
         randomize_temperature=0.7, mask_schedule_strategy="cosine"),
    dict(guidance_scale=0.0, guidance_annealing="none", scale_pow=1.0,
         randomize_temperature=2.0, mask_schedule_strategy="root"),
    dict(guidance_scale=1.5, guidance_annealing="none", scale_pow=1.0,
         randomize_temperature=3.0, mask_schedule_strategy="linear",
         use_sampling_annealing=True),
]


@pytest.mark.parametrize("case", CASES)
def test_sampler_step_parity_with_injected_randomness(case):
    cfg = SamplingConfig(
        softmax_temperature=1.0,
        num_steps=STEPS,
        mask_token=MASK_TOKEN,
        patch_size=4,
        codebook_size=C**M,
        codebook_splits=M,
        **case,
    )
    logit_tables, token_draws, gumbel_draws = _make_draws(seed=hash(str(case)) % 2**31)

    # guidance_scale==0 -> reference calls the model with the un-doubled batch
    ref_hist = _run_reference(cfg, logit_tables, token_draws, gumbel_draws)
    our_hist = _run_ours(cfg, logit_tables, token_draws, gumbel_draws)

    assert len(ref_hist) == len(our_hist) == STEPS
    for step, (r, o) in enumerate(zip(ref_hist, our_hist)):
        np.testing.assert_array_equal(o, r, err_msg=f"step {step} ({case})")


def test_training_mask_parity_with_injected_randomness():
    """get_mask_tokens vs the reference masking.py:7-38 with shared draws."""
    from modeling.modules import masking as ref_masking

    from maskbit_tpu.ops.masking import mask_ratio_from_uniform

    rng = np.random.default_rng(5)
    tokens = rng.integers(0, 16, size=(4, 16, 2))
    r_draw = rng.uniform(size=(4,)).astype(np.float32)
    u_draw = rng.uniform(size=(4, 16, 2)).astype(np.float32)

    # reference with torch.rand patched to pop the shared draws
    draws = [torch.from_numpy(r_draw), torch.from_numpy(u_draw)]
    orig_rand = torch.rand
    torch.rand = lambda *a, **k: draws.pop(0)
    try:
        ref_masked, ref_mask = ref_masking.get_mask_tokens(
            torch.from_numpy(tokens), mask_token=16, mode="arccos"
        )
    finally:
        torch.rand = orig_rand

    # our math with the same draws
    val = mask_ratio_from_uniform(jnp.asarray(r_draw), "arccos")
    mask = jnp.asarray(u_draw) < val[:, None, None]
    masked = jnp.where(mask, 16, jnp.asarray(tokens))

    np.testing.assert_array_equal(np.asarray(mask), ref_mask.numpy())
    np.testing.assert_array_equal(np.asarray(masked), ref_masked.numpy())
