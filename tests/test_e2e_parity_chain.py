"""Weight-independent END-TO-END parity chain vs the reference (VERDICT r3 #3).

Individual parity tests pin each stage (modules, quantizers, sampler math,
evaluator formulas); this file closes the SEAMS between them: a random
reference-format `.bin` goes through the REAL converter entry point
(`core/checkpoint.load_pretrained`), the full model chain, and the eval
protocol (clamp ordering, uint8 conversion, evaluator accumulation order),
and the resulting NUMBERS are compared against the reference torch pipeline
run on the very same bins.

Chain A (Stage I, reference scripts/eval_tokenizer.py:116-150):
    images -> model(images) -> clamp [0,1] -> TokenizerEvaluator.update
    -> result() — MAE/MSE/PSNR/SSIM/CodebookUsage/CodebookEntropy compared
    to fp tolerance, min_encoding_indices compared exactly.

Chain B (Stage II, reference scripts/eval_maskbit.py:111-137):
    .bin -> generator + tokenizer -> 4-step CFG sampling with SHARED
    injected randomness (through our REAL lax.scan loop) ->
    combine_factorized_tokens -> decode_tokens -> clamp -> *255 -> uint8
    — per-step token history compared exactly, final uint8 images within 1.

Both model stacks are tiny (32px, 6-bit LFQ) but architecturally complete
(conv stack, sample_with_conv, factorized Bert, CFG).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from maskbit_tpu.core.checkpoint import load_pretrained  # noqa: E402
from maskbit_tpu.eval.streaming import TokenizerEvaluator  # noqa: E402
from maskbit_tpu.models.generator import LFQBert  # noqa: E402
from maskbit_tpu.models.tokenizer import ConvVQModel  # noqa: E402
from maskbit_tpu.ops.bitops import combine_factorized_tokens  # noqa: E402
from maskbit_tpu.sampling.sample import SamplingConfig, sample_tokens  # noqa: E402
from reference_compat import AttrDict, import_reference  # noqa: E402

import_reference()

TOK_CFG = dict(
    resolution=32, num_channels=3, hidden_channels=32, channel_mult=[1, 2],
    num_resolutions=2, num_res_blocks=1, codebook_size=2**6, token_size=6,
    quantizer_type="lookup-free", commitment_cost=0.25,
    entropy_loss_weight=0.02, entropy_loss_temperature=0.01, entropy_gamma=1.0,
    sample_with_conv=True,
)
GEN_CFG = dict(
    img_size=32, hidden_dim=64, codebook_size=2**6, codebook_splits=2,
    depth=2, heads=4, mlp_dim=128, dropout=0.0, nclass=1000, input_stride=2,
)
B, STEPS = 3, 4
PATCH = 16  # 32px / stride 2 -> 16x16 grid
MASK_TOKEN = 2 ** (6 // 2)  # 8


@pytest.fixture(scope="module")
def bins(tmp_path_factory):
    """Random reference-format .bin checkpoints + the reference torch models
    that produced them."""
    from modeling.bert import LFQBert as RefLFQBert
    from modeling.conv_vqgan import ConvVQModel as RefConvVQModel

    out = tmp_path_factory.mktemp("zoo")
    torch.manual_seed(11)
    ref_tok = RefConvVQModel(AttrDict(TOK_CFG), legacy=False)
    ref_gen = RefLFQBert(**GEN_CFG, use_prenorm=False)
    ref_tok.eval()
    ref_gen.eval()
    tok_path, gen_path = str(out / "tokenizer.bin"), str(out / "generator.bin")
    torch.save(ref_tok.state_dict(), tok_path)
    torch.save(ref_gen.state_dict(), gen_path)
    return ref_tok, ref_gen, tok_path, gen_path


def test_e2e_tokenizer_eval_chain(bins, rng):
    """bin -> load_pretrained -> forward -> evaluator protocol vs reference."""
    from evaluator import TokenizerEvaluator as RefTokenizerEvaluator

    ref_tok, _, tok_path, _ = bins

    model = ConvVQModel(
        num_channels=3, hidden_channels=32, channel_mult=(1, 2),
        num_resolutions=2, num_res_blocks=1, token_size=6, codebook_size=2**6,
        quantizer_type="lookup-free", commitment_cost=0.25,
        entropy_loss_weight=0.02, sample_with_conv=True, legacy=False,
    )
    variables = load_pretrained(tok_path)  # the REAL converter entry point

    ref_eval = RefTokenizerEvaluator(
        device="cpu", enable_psnr_score=True, enable_ssim_score=True,
        enable_mse_error=True, enable_mae_error=True,
        enable_codebook_usage_measure=True,
        enable_codebook_entropy_measure=True, num_codebook_entries=2**6,
    )
    our_eval = TokenizerEvaluator(
        enable_psnr_score=True, enable_ssim_score=True, enable_mse_error=True,
        enable_mae_error=True, enable_codebook_usage_measure=True,
        enable_codebook_entropy_measure=True, num_codebook_entries=2**6,
    )

    apply_fn = jax.jit(lambda v, x: model.apply(v, x))
    for batch in range(2):  # two updates: accumulation order is part of the protocol
        images = rng.uniform(0, 1, size=(4, 32, 32, 3)).astype(np.float32)

        # reference pipeline (scripts/eval_tokenizer.py:136-150)
        t_images = torch.from_numpy(images.transpose(0, 3, 1, 2))
        with torch.no_grad():
            t_recon, t_dict = ref_tok(t_images)
        ref_eval.update(
            torch.clamp(t_images.clone(), 0.0, 1.0),
            torch.clamp(t_recon, 0.0, 1.0),
            t_dict["min_encoding_indices"],
        )

        # this framework's pipeline (cli/eval_tokenizer.py:130-138)
        recons, result = apply_fn(variables, jnp.asarray(images))
        np.testing.assert_array_equal(
            np.asarray(result["min_encoding_indices"]),
            t_dict["min_encoding_indices"].numpy().reshape(
                np.asarray(result["min_encoding_indices"]).shape),
            err_msg=f"encode indices diverge (batch {batch})",
        )
        our_eval.update(
            jnp.asarray(images), jnp.clip(recons, 0.0, 1.0),
            codebook_indices=result["min_encoding_indices"],
        )

    ref_result = {k: float(v) for k, v in ref_eval.result().items()}
    our_result = our_eval.result()
    assert set(our_result) == set(ref_result)
    for key in sorted(ref_result):
        np.testing.assert_allclose(
            our_result[key], ref_result[key], rtol=2e-4, atol=1e-5,
            err_msg=f"metric {key}: ours={our_result[key]} ref={ref_result[key]}",
        )


class _InjectedCategorical:
    draws, idx = None, 0

    def __init__(self, probs):
        pass

    def sample(self):
        out = torch.from_numpy(_InjectedCategorical.draws[_InjectedCategorical.idx])
        _InjectedCategorical.idx += 1
        return out


class _InjectedGumbel:
    draws, idx = None, 0

    def __init__(self, loc, scale):
        pass

    def sample(self, size):
        out = torch.from_numpy(_InjectedGumbel.draws[_InjectedGumbel.idx])
        _InjectedGumbel.idx += 1
        return out


def test_e2e_generation_chain(bins):
    """bin -> sample (REAL models + shared randomness) -> decode -> uint8."""
    from modeling.modules import sampling as ref_sampling

    ref_tok, ref_gen, tok_path, gen_path = bins

    draw_rng = np.random.default_rng(23)
    token_draws = draw_rng.integers(
        0, MASK_TOKEN, size=(STEPS, B, PATCH * PATCH, 2)).astype(np.int64)
    gumbel_draws = draw_rng.gumbel(size=(STEPS, B, PATCH * PATCH, 2)).astype(np.float32)
    labels = np.array([1, 7, 282], np.int64)

    common = dict(
        softmax_temperature=1.0, randomize_temperature=2.0,
        mask_schedule_strategy="arccos", num_steps=STEPS, guidance_scale=1.5,
        mask_token=MASK_TOKEN, patch_size=PATCH, guidance_annealing="cosine",
        use_sampling_annealing=False, scale_pow=2.5, codebook_size=2**6,
        codebook_splits=2,
    )

    # ---- reference pipeline (scripts/eval_maskbit.py:111-137) --------------
    _InjectedCategorical.draws, _InjectedCategorical.idx = token_draws, 0
    _InjectedGumbel.draws, _InjectedGumbel.idx = gumbel_draws, 0
    orig_cat, orig_gum = torch.distributions.Categorical, torch.distributions.Gumbel
    torch.distributions.Categorical = _InjectedCategorical
    torch.distributions.Gumbel = _InjectedGumbel
    try:
        with torch.no_grad():
            ref_images, ref_history = ref_sampling.sample(
                ref_gen, ref_tok, num_samples=B,
                labels=torch.from_numpy(labels), **common,
            )
    finally:
        torch.distributions.Categorical = orig_cat
        torch.distributions.Gumbel = orig_gum
    ref_u8 = (
        torch.clamp(ref_images, 0.0, 1.0) * 255.0
    ).permute(0, 2, 3, 1).to(torch.uint8).numpy()

    # ---- this framework: REAL scan loop with the same draws ----------------
    generator = LFQBert(**GEN_CFG)
    tokenizer = ConvVQModel(
        num_channels=3, hidden_channels=32, channel_mult=(1, 2),
        num_resolutions=2, num_res_blocks=1, token_size=6, codebook_size=2**6,
        quantizer_type="lookup-free", commitment_cost=0.25,
        entropy_loss_weight=0.02, sample_with_conv=True, legacy=False,
    )
    gen_vars = load_pretrained(gen_path)
    tok_vars = load_pretrained(tok_path)
    cfg = SamplingConfig(**common)

    def logits_fn(tokens, lbls, drop):
        return generator.apply(gen_vars, tokens, lbls, drop, deterministic=True)

    predicted, history = jax.jit(
        lambda td, gd: sample_tokens(
            logits_fn, jax.random.key(0), jnp.asarray(labels, jnp.int32), cfg,
            return_history=True, injected=(td, gd),
        )
    )(token_draws, gumbel_draws)

    assert len(ref_history) == STEPS
    for step, r in enumerate(ref_history):
        np.testing.assert_array_equal(
            np.asarray(history[step]), r.numpy(),
            err_msg=f"token history diverges at step {step}",
        )

    combined = combine_factorized_tokens(predicted, cfg.codebook_size, cfg.codebook_splits)
    images = tokenizer.apply(tok_vars, combined, method="decode_tokens")
    our_u8 = np.asarray(
        jnp.asarray(jnp.clip(images, 0.0, 1.0) * 255.0, jnp.uint8)
    )

    # decode runs in f32 on both sides; values that land exactly on a
    # truncation boundary may round to neighbouring uint8 values
    assert our_u8.shape == ref_u8.shape == (B, 32, 32, 3)
    delta = np.abs(our_u8.astype(np.int32) - ref_u8.astype(np.int32))
    assert delta.max() <= 1, f"uint8 images differ by {delta.max()}"
    frac = (delta > 0).mean()
    assert frac < 0.02, f"{frac:.1%} of pixels off by one (expected rare ties)"
