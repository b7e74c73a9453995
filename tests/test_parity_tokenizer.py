"""Golden parity: flax ConvVQModel vs the PyTorch reference, via converted weights.

Uses a small config (hidden_channels 32, 3 resolutions, 64x64 input) so the
test runs in seconds while covering every block type: strided/pool
downsampling, residual stages with channel changes (incl. the nin_shortcut
quirk), upsampling, GroupNorm/SiLU heads, and the LFQ/VQ quantizers.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from maskbit_tpu.compat.torch_convert import convert_tokenizer_state  # noqa: E402
from maskbit_tpu.models.tokenizer import ConvVQModel  # noqa: E402

from reference_compat import AttrDict, import_reference, torch_state_numpy  # noqa: E402

import_reference()

SMALL = dict(
    resolution=64,
    num_channels=3,
    hidden_channels=32,
    channel_mult=[1, 2, 4],
    num_resolutions=3,
    num_res_blocks=1,
    codebook_size=64,
    token_size=6,
    quantizer_type="lookup-free",
    commitment_cost=0.25,
    entropy_loss_weight=0.02,
    entropy_loss_temperature=0.01,
    entropy_gamma=1.0,
    sample_with_conv=True,
)


def build_reference(cfg_dict, legacy=False):
    from modeling.conv_vqgan import ConvVQModel as RefConvVQModel

    model = RefConvVQModel(AttrDict(cfg_dict), legacy=legacy)
    model.eval()
    return model


def build_flax(cfg_dict, legacy=False):
    return ConvVQModel(
        num_channels=cfg_dict["num_channels"],
        hidden_channels=cfg_dict["hidden_channels"],
        channel_mult=tuple(cfg_dict["channel_mult"]),
        num_resolutions=cfg_dict["num_resolutions"],
        num_res_blocks=cfg_dict["num_res_blocks"],
        token_size=cfg_dict["token_size"],
        codebook_size=cfg_dict["codebook_size"],
        quantizer_type=cfg_dict["quantizer_type"],
        commitment_cost=cfg_dict["commitment_cost"],
        entropy_loss_weight=cfg_dict["entropy_loss_weight"],
        sample_with_conv=cfg_dict["sample_with_conv"],
        legacy=legacy,
    )


@pytest.mark.parametrize("sample_with_conv", [True, False])
def test_tokenizer_forward_parity(sample_with_conv):
    cfg = dict(SMALL, sample_with_conv=sample_with_conv)
    torch.manual_seed(0)
    ref = build_reference(cfg)
    flax_model = build_flax(cfg)
    params = convert_tokenizer_state(torch_state_numpy(ref))

    x = np.random.default_rng(0).normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_out, ref_dict = ref(torch.from_numpy(x))

    out, result = flax_model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    out_nchw = np.asarray(out).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(out_nchw, ref_out.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_array_equal(
        np.asarray(result["min_encoding_indices"]),
        ref_dict["min_encoding_indices"].numpy(),
    )
    np.testing.assert_allclose(
        float(result["commitment_loss"]),
        float(ref_dict["commitment_loss"]),
        rtol=1e-4,
    )


def test_tokenizer_legacy_decoder_parity():
    cfg = dict(SMALL)
    torch.manual_seed(1)
    ref = build_reference(cfg, legacy=True)
    flax_model = build_flax(cfg, legacy=True)
    params = convert_tokenizer_state(torch_state_numpy(ref))

    x = np.random.default_rng(1).normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(x))
    out, _ = flax_model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), atol=2e-4, rtol=1e-3
    )


def test_decode_tokens_parity():
    cfg = dict(SMALL)
    torch.manual_seed(2)
    ref = build_reference(cfg)
    flax_model = build_flax(cfg)
    params = convert_tokenizer_state(torch_state_numpy(ref))

    tokens = np.random.default_rng(2).integers(0, 64, size=(2, 64))
    with torch.no_grad():
        ref_img = ref.decode_tokens(torch.from_numpy(tokens))
    img = flax_model.apply(params, jnp.asarray(tokens), method=ConvVQModel.decode_tokens)
    np.testing.assert_allclose(
        np.asarray(img).transpose(0, 3, 1, 2), ref_img.numpy(), atol=2e-4, rtol=1e-3
    )


def test_vq_tokenizer_parity():
    cfg = dict(SMALL, quantizer_type="lookup", token_size=16, codebook_size=128)
    torch.manual_seed(3)
    ref = build_reference(cfg)
    flax_model = build_flax(cfg)
    params = convert_tokenizer_state(torch_state_numpy(ref))

    x = np.random.default_rng(3).normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_out, ref_dict = ref(torch.from_numpy(x))
    out, result = flax_model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), atol=5e-4, rtol=1e-3
    )
    np.testing.assert_array_equal(
        np.asarray(result["min_encoding_indices"]),
        ref_dict["min_encoding_indices"].numpy(),
    )
