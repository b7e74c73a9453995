"""Golden parity: flax Taming VQGAN vs the PyTorch reference.

Builds the reference Encoder/Decoder + VQ quantizer with a small config
(the reference's OriginalVQModel hardcodes the 256px ImageNet config, so we
mirror its wiring manually) and compares against our parameterized
OriginalVQModel with converted weights — covering the AttnBlock, the
asymmetric-pad downsample, quant/post-quant convs and [-1,1] scaling.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from maskbit_tpu.compat.torch_convert import convert_tokenizer_state  # noqa: E402
from maskbit_tpu.models.taming import OriginalVQModel  # noqa: E402

from reference_compat import import_reference, torch_state_numpy  # noqa: E402

import_reference()

SMALL = dict(
    ch=32,
    ch_mult=(1, 2),
    num_res_blocks=1,
    attn_resolutions=(16,),
    resolution=32,  # 32 -> 16 at the last level: attention exercised
    z_channels=64,
    codebook_size=32,
    token_size=48,
)


class _RefWrapper(torch.nn.Module):
    """Reference OriginalVQModel wiring with a parameterized config."""

    def __init__(self):
        super().__init__()
        from modeling.quantizer import SimpleVectorizer
        from modeling.taming.taming_autoencoder import Decoder, Encoder

        cfg = dict(
            double_z=False, z_channels=SMALL["z_channels"], resolution=SMALL["resolution"],
            in_channels=3, out_ch=3, ch=SMALL["ch"], ch_mult=SMALL["ch_mult"],
            num_res_blocks=SMALL["num_res_blocks"],
            attn_resolutions=SMALL["attn_resolutions"], dropout=0.0,
        )
        self.encoder = Encoder(**cfg)
        self.decoder = Decoder(**cfg)
        self.quantize = SimpleVectorizer(SMALL["codebook_size"], SMALL["token_size"], 0.25)
        self.quant_conv = torch.nn.Conv2d(SMALL["z_channels"], SMALL["token_size"], 1)
        self.post_quant_conv = torch.nn.Conv2d(SMALL["token_size"], SMALL["z_channels"], 1)

    def forward(self, x):
        x = x * 2.0 - 1.0
        z = self.quant_conv(self.encoder(x))
        z_q, result = self.quantize(z)
        decoded = self.decoder(self.post_quant_conv(z_q))
        return (decoded + 1.0) / 2.0, result


def test_taming_forward_parity():
    torch.manual_seed(0)
    ref = _RefWrapper()
    ref.eval()

    flax_model = OriginalVQModel(**SMALL)
    params = convert_tokenizer_state(torch_state_numpy(ref))

    x = np.random.default_rng(0).uniform(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref_out, ref_dict = ref(torch.from_numpy(x))

    out, result = flax_model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_array_equal(
        np.asarray(result["min_encoding_indices"]),
        ref_dict["min_encoding_indices"].numpy(),
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), atol=5e-4, rtol=1e-3
    )


def test_taming_loss_keys_filtered():
    torch.manual_seed(1)
    ref = _RefWrapper()
    state = torch_state_numpy(ref)
    state["loss.discriminator.main.0.weight"] = np.zeros((4, 4), np.float32)
    params = convert_tokenizer_state(state)  # must not raise
    assert "loss" not in params["params"]
