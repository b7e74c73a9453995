"""Golden parity for the training-loss stack vs the PyTorch reference:
LFQ entropy terms (train mode), VQGANLoss generator/discriminator modes
(incl. LeCam EMA), and the EMAModel update trajectory.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from reference_compat import AttrDict, import_reference, torch_state_numpy  # noqa: E402

import_reference()


def test_lfq_entropy_terms_match_reference(rng):
    from modeling.quantizer.lookup_free import LookupFreeQuantizer as RefLFQ

    from maskbit_tpu.quantizers import LookupFreeQuantizer

    bits = 8
    ref = RefLFQ(token_bits=bits, commitment_cost=0.25, entropy_loss_weight=0.1,
                 entropy_loss_temperature=0.01, entropy_gamma=1.5)
    ref.train()
    z = rng.normal(size=(2, 4, 4, bits)).astype(np.float32)
    with torch.no_grad():
        _, ref_dict = ref(torch.from_numpy(z.transpose(0, 3, 1, 2)))

    mine = LookupFreeQuantizer(token_bits=bits, commitment_cost=0.25,
                               entropy_loss_weight=0.1,
                               entropy_loss_temperature=0.01, entropy_gamma=1.5)
    _, my_dict = mine.apply({}, jnp.asarray(z), train=True)

    for key in ("commitment_loss", "per_sample_entropy", "avg_entropy",
                "entropy_loss", "quantizer_loss"):
        np.testing.assert_allclose(
            float(my_dict[key]), float(ref_dict[key]), rtol=2e-3, atol=1e-5,
            err_msg=key,
        )
    np.testing.assert_array_equal(
        np.asarray(my_dict["min_encoding_indices"]),
        ref_dict["min_encoding_indices"].numpy(),
    )


def _make_ref_vqgan_loss(disc_start=0, lecam=0.001):
    """Reference VQGANLoss with the perceptual net stubbed to zeros."""
    import modeling.modules.losses as ref_losses

    class _ZeroPerceptual(torch.nn.Module):
        def forward(self, a, b):
            return torch.zeros(())

        def eval(self):
            return self

    orig = ref_losses.create_perception_loss
    ref_losses.create_perception_loss = lambda *a, **k: _ZeroPerceptual()
    try:
        disc_cfg = AttrDict(dict(name="VQGAN+Discriminator", num_channels=3,
                                 num_stages=1, hidden_channels=32,
                                 blur_resample=False, blur_kernel_size=4))
        loss_cfg = AttrDict(dict(
            discriminator_loss="hinge", reconstruction_loss="l2",
            discriminator_gradient_penalty="none", quantizer_weight=1.0,
            perceptual_loss="lpips", perceptual_weight=0.1,
            reconstruction_weight=4.0, lecam_regularization_weight=lecam,
            discriminator_start=disc_start, discriminator_factor=1.0,
            discriminator_weight=0.02, discriminator_penalty_cost=10.0,
            entropy_annealing_steps=100, entropy_annealing_factor=2.0,
        ))
        module = ref_losses.VQGANLoss(disc_cfg, loss_cfg)
    finally:
        ref_losses.create_perception_loss = orig
    module.eval()
    return module


def test_vqgan_generator_loss_parity(rng):
    from maskbit_tpu.losses.vqgan import VQGANLossConfig, generator_loss

    ref = _make_ref_vqgan_loss(disc_start=0)
    inputs = rng.uniform(size=(2, 3, 32, 32)).astype(np.float32)
    recons = np.clip(inputs + rng.normal(scale=0.1, size=inputs.shape), 0, 1).astype(np.float32)
    extra_t = dict(
        quantizer_loss=torch.tensor(0.7), commitment_loss=torch.tensor(0.2),
        entropy_loss=torch.tensor(0.3), per_sample_entropy=torch.tensor(0.1),
        avg_entropy=torch.tensor(0.4),
    )
    # snapshot before the reference call: its entropy-annealing `+=` mutates
    # the 0-dim quantizer_loss tensor in place (reference losses.py:202-206)
    extra_j = {k: jnp.asarray(float(v)) for k, v in extra_t.items()}
    step = 50
    with torch.no_grad():
        ref_total, ref_dict = ref(
            torch.from_numpy(inputs), torch.from_numpy(recons), extra_t,
            global_step=step, last_layer=None, mode="gen",
        )

    cfg = VQGANLossConfig(
        reconstruction_loss="l2", reconstruction_weight=4.0, quantizer_weight=1.0,
        perceptual_loss="none", perceptual_weight=0.1,
        discriminator_loss="hinge", discriminator_factor=1.0,
        discriminator_weight=0.02, discriminator_start=0,
        discriminator_gradient_penalty="none",
        entropy_annealing_steps=100, entropy_annealing_factor=2.0,
    )
    # identical discriminator logits on both sides (copy weights)
    logits_fake_ref = ref.discriminator(torch.from_numpy(recons)).detach()
    my_total, my_dict = generator_loss(
        cfg, jnp.asarray(inputs.transpose(0, 2, 3, 1)),
        jnp.asarray(recons.transpose(0, 2, 3, 1)), extra_j,
        global_step=step, perceptual_fn=lambda a, b: jnp.zeros(()),
        logits_fake=jnp.asarray(logits_fake_ref.numpy().transpose(0, 2, 3, 1)),
        d_weight=1.0,
    )
    np.testing.assert_allclose(float(my_total), float(ref_total), rtol=1e-4)
    for key in ("reconstruction_loss", "quantizer_loss", "weighted_gan_loss", "gan_loss"):
        np.testing.assert_allclose(
            float(my_dict[key]), float(ref_dict[key]), rtol=1e-4, atol=1e-6, err_msg=key
        )


def test_vqgan_discriminator_loss_parity(rng):
    """Hinge + LeCam + EMA buffer updates, two consecutive steps."""
    from maskbit_tpu.losses.vqgan import LecamState, VQGANLossConfig, discriminator_loss

    ref = _make_ref_vqgan_loss(disc_start=0, lecam=0.01)
    cfg = VQGANLossConfig(
        discriminator_loss="hinge", discriminator_factor=1.0,
        discriminator_start=0, lecam_regularization_weight=0.01, ema_decay=0.999,
    )
    state = LecamState.init()
    for step in range(2):
        inputs = rng.uniform(size=(2, 3, 32, 32)).astype(np.float32)
        recons = np.clip(inputs + rng.normal(scale=0.1, size=inputs.shape), 0, 1).astype(np.float32)
        with torch.no_grad():
            ref_loss, ref_dict = ref(
                torch.from_numpy(inputs), torch.from_numpy(recons), {},
                global_step=step, last_layer=None, mode="disc",
            )
            logits_real = ref.discriminator(torch.from_numpy(inputs)).numpy()
            logits_fake = ref.discriminator(torch.from_numpy(recons)).numpy()
        my_loss, my_dict, state = discriminator_loss(
            cfg, jnp.asarray(logits_real), jnp.asarray(logits_fake), step, state
        )
        np.testing.assert_allclose(float(my_loss), float(ref_loss), rtol=1e-4,
                                   err_msg=f"step {step}")
        np.testing.assert_allclose(
            float(state.ema_real_logits_mean), float(ref.ema_real_logits_mean),
            rtol=1e-4, err_msg=f"lecam ema step {step}",
        )


def test_ema_trajectory_matches_reference():
    from modeling.modules.ema_model import EMAModel as RefEMA

    from maskbit_tpu.core.ema import ema_update, init_ema

    torch.manual_seed(0)
    ref_params = [torch.nn.Parameter(torch.randn(4)) for _ in range(2)]
    ref_ema = RefEMA([p for p in ref_params], decay=0.99)

    # np.array(...) copies: on CPU jnp.asarray would alias the torch buffer
    # and the later in-place add_ would corrupt our side
    params = {"a": jnp.asarray(np.array(ref_params[0].detach().numpy())),
              "b": jnp.asarray(np.array(ref_params[1].detach().numpy()))}
    state = init_ema(params)

    rng = np.random.default_rng(0)
    for step in range(5):
        delta = [rng.normal(size=4).astype(np.float32) for _ in range(2)]
        with torch.no_grad():
            for p, d in zip(ref_params, delta):
                p.add_(torch.from_numpy(d))
        params = {"a": params["a"] + delta[0], "b": params["b"] + delta[1]}
        ref_ema.step(ref_params)
        state = ema_update(state, params, decay=0.99)

    np.testing.assert_allclose(
        np.asarray(state.params["a"]), ref_ema.shadow_params[0].numpy(), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(state.params["b"]), ref_ema.shadow_params[1].numpy(), rtol=1e-5
    )


def test_discriminator_v2_forward_parity(rng):
    """NLayerDiscriminatorv2 logits vs the reference via converted weights
    (covers BlurBlock, GroupNorm eps 1e-5, adaptive max pool, logits head)."""
    from modeling.modules.discriminator import NLayerDiscriminatorv2 as RefD

    from maskbit_tpu.compat.torch_convert import convert_discriminator_state
    from maskbit_tpu.nn.discriminator import NLayerDiscriminatorv2

    for blur in (False, True):
        torch.manual_seed(3)
        ref = RefD(num_channels=3, hidden_channels=32, num_stages=2,
                   blur_resample=blur, blur_kernel_size=4)
        ref.eval()
        mine = NLayerDiscriminatorv2(num_channels=3, hidden_channels=32,
                                     num_stages=2, blur_resample=blur,
                                     blur_kernel_size=4)
        params = convert_discriminator_state(
            {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        )
        x = rng.uniform(size=(2, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            expected = ref(torch.from_numpy(x)).numpy()
        got = mine.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), expected,
            atol=2e-4, rtol=1e-3, err_msg=f"blur={blur}",
        )


def test_original_discriminator_forward_parity(rng):
    """Pix2Pix OriginalNLayerDiscriminator (BatchNorm) in eval mode."""
    from modeling.modules.discriminator import OriginalNLayerDiscriminator as RefD

    from maskbit_tpu.compat.torch_convert import convert_original_discriminator_state
    from maskbit_tpu.nn.discriminator import OriginalNLayerDiscriminator

    torch.manual_seed(4)
    ref = RefD(num_channels=3, hidden_channels=32, num_stages=3)
    ref.eval()
    mine = OriginalNLayerDiscriminator(num_channels=3, hidden_channels=32, num_stages=3)
    variables = convert_original_discriminator_state(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}, num_stages=3
    )
    x = rng.uniform(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()
    got = mine.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), expected, atol=2e-4, rtol=1e-3
    )


def test_lpips_forward_parity_with_injected_vgg(rng):
    """Full LPIPS parity: random VGG16 weights injected into the reference
    (torchvision stubbed) and converted into our flax LPIPS; the bundled
    lin-head weights load on both sides."""
    import sys
    import types

    torch.manual_seed(5)
    cfgs = [(3, 64), (64, 64), "M", (64, 128), (128, 128), "M",
            (128, 256), (256, 256), (256, 256), "M",
            (256, 512), (512, 512), (512, 512), "M",
            (512, 512), (512, 512), (512, 512), "M"]
    layers = []
    for c in cfgs:
        if c == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(c[0], c[1], 3, padding=1))
            layers.append(torch.nn.ReLU())
    features = torch.nn.Sequential(*layers)

    tv = sys.modules["torchvision"]  # the stub installed by reference_compat
    class _Weights:
        IMAGENET1K_V1 = object()
    tv.models.vgg16 = lambda **k: types.SimpleNamespace(features=features)
    tv.models.VGG16_Weights = _Weights

    from modeling.modules.lpips import LPIPS as RefLPIPS

    ref = RefLPIPS(use_dropout=True)
    ref.eval()

    from maskbit_tpu.losses.lpips import LPIPS, convert_lpips_weights

    lin_state = torch.load("/root/reference/pretrained/vgg_lpips.pth",
                           map_location="cpu", weights_only=True)
    variables = convert_lpips_weights(
        {k: v.numpy() for k, v in lin_state.items()},
        {k: v.detach().numpy() for k, v in features.state_dict().items()},
    )

    x = rng.uniform(size=(2, 3, 64, 64)).astype(np.float32)
    y = np.clip(x + rng.normal(scale=0.1, size=x.shape), 0, 1).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x), torch.from_numpy(y)).numpy()

    got = LPIPS().apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                        jnp.asarray(y.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).reshape(-1), expected.reshape(-1), atol=1e-5, rtol=1e-3
    )
