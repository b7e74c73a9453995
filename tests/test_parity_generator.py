"""Golden parity: flax Bert/LFQBert vs the PyTorch reference, via converted weights.

Small config (hidden 64, depth 2, 4 heads, 16 tokens) covering: bit-token
preprocessing with mask zeroing, class-label drop, pre/post-norm paths,
packed-QKV attention conversion, the weight-tied Bert head, and the LFQBert
prediction head.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from maskbit_tpu.compat.torch_convert import convert_generator_state  # noqa: E402
from maskbit_tpu.models.generator import Bert, LFQBert  # noqa: E402

from reference_compat import import_reference, torch_state_numpy  # noqa: E402

import_reference()

SMALL = dict(
    img_size=64,
    hidden_dim=64,
    codebook_size=2**8,
    codebook_splits=2,
    depth=2,
    heads=4,
    mlp_dim=128,
    dropout=0.0,
    nclass=10,
    input_stride=16,
)


def _make_pair(model_name, use_prenorm):
    from modeling.bert import Bert as RefBert
    from modeling.bert import LFQBert as RefLFQBert

    torch.manual_seed(0)
    ref_cls = RefLFQBert if model_name == "lfq_bert" else RefBert
    flax_cls = LFQBert if model_name == "lfq_bert" else Bert
    ref = ref_cls(**SMALL, use_prenorm=use_prenorm)
    ref.eval()
    flax_model = flax_cls(**SMALL, use_prenorm=use_prenorm)
    params = convert_generator_state(torch_state_numpy(ref))
    return ref, flax_model, params


@pytest.mark.parametrize("model_name", ["lfq_bert", "bert"])
@pytest.mark.parametrize("use_prenorm", [False, True])
def test_generator_forward_parity(model_name, use_prenorm):
    ref, flax_model, params = _make_pair(model_name, use_prenorm)

    rng = np.random.default_rng(0)
    n, m = flax_model.seq_len, SMALL["codebook_splits"]
    ecs = flax_model.effective_codebook_size
    tokens = rng.integers(0, ecs, size=(3, n, m))
    tokens[:, :5, 0] = flax_model.mask_token  # some masked positions
    labels = rng.integers(0, SMALL["nclass"], size=(3,))
    drop = np.array([False, True, False])

    with torch.no_grad():
        ref_logits = ref(
            torch.from_numpy(tokens.copy()),
            torch.from_numpy(labels.copy()),
            torch.from_numpy(drop.copy()),
        ).numpy()

    logits = flax_model.apply(
        {"params": params["params"]},
        jnp.asarray(tokens),
        jnp.asarray(labels),
        jnp.asarray(drop),
    )
    assert logits.shape == (3, n, m, ecs)
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=2e-5, rtol=1e-4)


def test_lfq_bert_preprocess_tokens_parity():
    ref, flax_model, _ = _make_pair("lfq_bert", False)
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, flax_model.effective_codebook_size + 1, size=(2, 16, 2))
    with torch.no_grad():
        ref_bits = ref.preprocess_tokens(torch.from_numpy(tokens)).numpy()
    bits = np.asarray(flax_model.preprocess_tokens(jnp.asarray(tokens)))
    np.testing.assert_allclose(bits, ref_bits, atol=1e-6)


def test_token_emb_rename():
    """`token_emb.*` keys in old checkpoints map onto input_proj (eval_maskbit.py:52)."""
    ref, flax_model, params = _make_pair("lfq_bert", False)
    state = torch_state_numpy(ref)
    renamed = {
        (k.replace("input_proj.", "token_emb.") if k.startswith("input_proj.") else k): v
        for k, v in state.items()
    }
    params2 = convert_generator_state(renamed)
    a = params["params"]["input_proj"]["kernel"]
    b = params2["params"]["input_proj"]["kernel"]
    np.testing.assert_array_equal(a, b)
