"""Golden parity for the adaptive GAN weight — the trickiest training piece
(reference losses.py:95-111: two autograd.grad calls on the decoder's final
conv kernel). Compares the reference's torch-autograd d_weight against this
framework's jax.vjp computation inside the actual train step, with fully
converted tokenizer + discriminator weights and identical inputs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from maskbit_tpu.compat.torch_convert import (  # noqa: E402
    convert_discriminator_state,
    convert_tokenizer_state,
)
from maskbit_tpu.losses.vqgan import VQGANLossConfig  # noqa: E402
from maskbit_tpu.models.tokenizer import ConvVQModel  # noqa: E402
from maskbit_tpu.nn.discriminator import NLayerDiscriminatorv2  # noqa: E402
from maskbit_tpu.train.tokenizer_trainer import (  # noqa: E402
    init_tokenizer_train_state,
    make_optimizer,
    make_tokenizer_train_step,
)

from reference_compat import AttrDict, import_reference, torch_state_numpy  # noqa: E402

import_reference()

VQ = dict(
    resolution=64, num_channels=3, hidden_channels=32, channel_mult=[1, 2],
    num_resolutions=2, num_res_blocks=1, codebook_size=64, token_size=6,
    quantizer_type="lookup-free", commitment_cost=0.25, entropy_loss_weight=0.0,
    entropy_loss_temperature=0.01, entropy_gamma=1.0, sample_with_conv=True,
)
DISC = dict(name="VQGAN+Discriminator", num_channels=3, num_stages=1,
            hidden_channels=32, blur_resample=False, blur_kernel_size=4)
LOSS = dict(
    discriminator_loss="hinge", reconstruction_loss="l2",
    discriminator_gradient_penalty="adopt_weight", quantizer_weight=1.0,
    perceptual_loss="lpips", perceptual_weight=0.0, reconstruction_weight=4.0,
    lecam_regularization_weight=0.0, discriminator_start=0,
    discriminator_factor=1.0, discriminator_weight=0.02,
    discriminator_penalty_cost=10.0, entropy_annealing_steps=100,
    entropy_annealing_factor=0.0,
)


def test_adaptive_weight_matches_reference_autograd(rng):
    import modeling.modules.losses as ref_losses
    from modeling.conv_vqgan import ConvVQModel as RefConvVQModel

    class _ZeroPerceptual(torch.nn.Module):
        def forward(self, a, b):
            return torch.zeros(())

        def eval(self):
            return self

    orig = ref_losses.create_perception_loss
    ref_losses.create_perception_loss = lambda *a, **k: _ZeroPerceptual()
    try:
        ref_loss_module = ref_losses.VQGANLoss(AttrDict(DISC), AttrDict(LOSS))
    finally:
        ref_losses.create_perception_loss = orig

    torch.manual_seed(0)
    ref_model = RefConvVQModel(AttrDict(VQ))

    images = rng.uniform(size=(2, 3, 64, 64)).astype(np.float32)

    # --- reference: autograd-based d_weight ------------------------------
    recons, extra = ref_model(torch.from_numpy(images))
    _, ref_dict = ref_loss_module(
        torch.from_numpy(images), recons, extra, global_step=10,
        last_layer=ref_model.get_last_layer(), mode="gen",
    )
    ref_d_weight = float(ref_dict["d_weight"])  # adaptive * discriminator_weight

    # --- ours: the train step's vjp-based d_weight ------------------------
    model = ConvVQModel(
        num_channels=3, hidden_channels=32, channel_mult=(1, 2), num_resolutions=2,
        num_res_blocks=1, token_size=6, codebook_size=64,
        quantizer_type="lookup-free", entropy_loss_weight=0.0,
    )
    disc = NLayerDiscriminatorv2(num_channels=3, hidden_channels=32, num_stages=1)
    cfg = VQGANLossConfig.from_config(AttrDict(LOSS))
    tx = make_optimizer(0.0, max_grad_norm=None)  # lr 0: inspect metrics only

    state = init_tokenizer_train_state(
        model, disc, tx, tx, jax.random.key(0), (2, 64, 64, 3), use_ema=False
    )
    state = state._replace(
        gen_params=convert_tokenizer_state(torch_state_numpy(ref_model))["params"],
        disc_params=convert_discriminator_state(
            torch_state_numpy(ref_loss_module.discriminator)
        )["params"],
        step=jnp.asarray(10, jnp.int32),
    )
    step_fn = jax.jit(make_tokenizer_train_step(model, disc, tx, tx, cfg))
    _, metrics = step_fn(
        state, jnp.asarray(images.transpose(0, 2, 3, 1)), None, jax.random.key(1)
    )
    my_d_weight = float(metrics["d_weight"])

    # conv-grad norms through two frameworks: agree to ~0.1%
    np.testing.assert_allclose(my_d_weight, ref_d_weight, rtol=2e-3)
    # sanity: the adaptive factor is live (not the disabled-path 1.0 * weight)
    assert abs(my_d_weight - cfg.discriminator_weight) > 1e-6
