import jax.numpy as jnp
import numpy as np
import pytest

from maskbit_tpu.losses import gan
from maskbit_tpu.losses.mlm import MLMLossConfig, mlm_loss
from maskbit_tpu.losses.vqgan import (
    LecamState,
    VQGANLossConfig,
    calculate_adaptive_weight,
    discriminator_loss,
    generator_loss,
)


def test_adopt_weight():
    assert float(gan.adopt_weight(2.0, 10, threshold=20)) == 0.0
    assert float(gan.adopt_weight(2.0, 20, threshold=20)) == 2.0
    assert float(gan.adopt_weight(2.0, 30, threshold=20, value=0.5)) == 2.0
    assert float(gan.adopt_weight(2.0, 5, threshold=20, value=0.5)) == 0.5


def test_hinge_losses(rng):
    real = jnp.asarray(rng.normal(size=(4, 16, 16, 1)), jnp.float32)
    fake = jnp.asarray(rng.normal(size=(4, 16, 16, 1)), jnp.float32)
    d = float(gan.hinge_d_loss(real, fake))
    expected = 0.5 * (
        np.mean(np.maximum(1 - np.asarray(real), 0)) + np.mean(np.maximum(1 + np.asarray(fake), 0))
    )
    np.testing.assert_allclose(d, expected, rtol=1e-5)
    np.testing.assert_allclose(float(gan.hinge_g_loss(fake)), -np.mean(np.asarray(fake)), rtol=1e-5)


def test_sigmoid_ce_matches_naive(rng):
    logits = jnp.asarray(rng.normal(size=(32,)) * 5, jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, size=(32,)), jnp.float32)
    got = np.asarray(gan.sigmoid_cross_entropy_with_logits(logits, labels))
    p = 1 / (1 + np.exp(-np.asarray(logits, np.float64)))
    expected = -(np.asarray(labels) * np.log(p) + (1 - np.asarray(labels)) * np.log(1 - p))
    np.testing.assert_allclose(got, expected, rtol=1e-3)


def test_lecam_loss():
    val = gan.compute_lecam_loss(
        jnp.asarray(1.0), jnp.asarray(-1.0), jnp.asarray(0.5), jnp.asarray(-0.5)
    )
    # relu(1 - (-0.5))^2 + relu(0.5 - (-1))^2 = 1.5^2 + 1.5^2
    np.testing.assert_allclose(float(val), 4.5, rtol=1e-6)


def test_mlm_loss_matches_torch(rng):
    torch = pytest.importorskip("torch")
    b, n, m, c = 2, 8, 2, 16
    logits = rng.normal(size=(b, n, m, c)).astype(np.float32)
    targets = rng.integers(0, c, size=(b, n, m))
    masks = rng.integers(0, 2, size=(b, n, m)).astype(bool)
    masks[0, 0, 0] = True  # ensure nonempty

    criterion = torch.nn.CrossEntropyLoss(label_smoothing=0.1)
    t_logits = torch.from_numpy(logits)
    t_targets = torch.from_numpy(targets)
    expected = float(criterion(t_logits.reshape(-1, c), t_targets.view(-1)))
    expected_masked = float(
        criterion(t_logits[torch.from_numpy(masks), :], t_targets[torch.from_numpy(masks)])
    )

    loss, loss_dict = mlm_loss(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(masks), MLMLossConfig(0.1, False)
    )
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)
    np.testing.assert_allclose(float(loss_dict["masked_token_loss"]), expected_masked, rtol=1e-5)

    # sum_splits doubles the loss for m=2
    loss2, _ = mlm_loss(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(masks), MLMLossConfig(0.1, True)
    )
    np.testing.assert_allclose(float(loss2), 2 * expected, rtol=1e-5)


def test_generator_loss_composition(rng):
    cfg = VQGANLossConfig(
        reconstruction_loss="l2",
        reconstruction_weight=4.0,
        quantizer_weight=1.0,
        perceptual_weight=0.1,
        discriminator_loss="hinge",
        discriminator_factor=1.0,
        discriminator_weight=0.02,
        discriminator_start=10,
        discriminator_gradient_penalty="adopt_weight",
    )
    inputs = jnp.asarray(rng.normal(size=(2, 8, 8, 3)), jnp.float32)
    recons = inputs + 0.1
    extra = dict(
        quantizer_loss=jnp.asarray(0.5),
        commitment_loss=jnp.asarray(0.2),
        entropy_loss=jnp.asarray(0.3),
        per_sample_entropy=jnp.asarray(0.1),
        avg_entropy=jnp.asarray(0.4),
    )
    perceptual_fn = lambda a, b: jnp.mean((a - b) ** 2)

    # before discriminator_start: no GAN term
    total, d = generator_loss(cfg, inputs, recons, extra, global_step=5,
                              perceptual_fn=perceptual_fn, logits_fake=None)
    expected = 4.0 * 0.01 + 0.1 * 0.01 + 0.5
    np.testing.assert_allclose(float(total), expected, rtol=1e-4)
    assert float(d["discriminator_factor"]) == 0.0

    # after start: hinge g loss enters with d_weight * factor
    logits_fake = jnp.asarray(rng.normal(size=(2, 4, 4, 1)), jnp.float32)
    total2, d2 = generator_loss(cfg, inputs, recons, extra, global_step=20,
                                perceptual_fn=perceptual_fn, logits_fake=logits_fake,
                                d_weight=2.0)
    g = -float(jnp.mean(logits_fake))
    np.testing.assert_allclose(float(total2), expected + 2.0 * 0.02 * 1.0 * g, rtol=1e-4)
    np.testing.assert_allclose(float(d2["d_weight"]), 2.0 * 0.02, rtol=1e-6)


def test_entropy_annealing():
    cfg = VQGANLossConfig(
        perceptual_weight=0.0, entropy_annealing_factor=2.0, entropy_annealing_steps=100,
        reconstruction_weight=0.0, quantizer_weight=1.0, discriminator_start=1000,
    )
    inputs = jnp.zeros((1, 4, 4, 3))
    extra = dict(
        quantizer_loss=jnp.asarray(1.0), commitment_loss=jnp.asarray(0.0),
        entropy_loss=jnp.asarray(0.5), per_sample_entropy=jnp.asarray(0.0),
        avg_entropy=jnp.asarray(0.0),
    )
    zero_fn = lambda a, b: jnp.zeros(())
    total, _ = generator_loss(cfg, inputs, inputs, extra, global_step=50,
                              perceptual_fn=zero_fn, logits_fake=None)
    # quantizer 1.0 + (1 - 50/100) * 2.0 * 0.5 = 1.5
    np.testing.assert_allclose(float(total), 1.5, rtol=1e-5)
    total2, _ = generator_loss(cfg, inputs, inputs, extra, global_step=200,
                               perceptual_fn=zero_fn, logits_fake=None)
    np.testing.assert_allclose(float(total2), 1.0, rtol=1e-5)


def test_discriminator_loss_and_lecam(rng):
    cfg = VQGANLossConfig(
        discriminator_loss="hinge", discriminator_factor=1.0, discriminator_start=0,
        lecam_regularization_weight=0.001, ema_decay=0.9,
    )
    real = jnp.asarray(rng.normal(size=(2, 4, 4, 1)), jnp.float32)
    fake = jnp.asarray(rng.normal(size=(2, 4, 4, 1)), jnp.float32)
    state = LecamState.init()
    loss, d, new_state = discriminator_loss(cfg, real, fake, 10, state)
    assert np.isfinite(float(loss))
    # EMA updated towards the batch means
    np.testing.assert_allclose(
        float(new_state.ema_real_logits_mean), 0.1 * float(jnp.mean(real)), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(new_state.ema_fake_logits_mean), 0.1 * float(jnp.mean(fake)), rtol=1e-5
    )


def test_adaptive_weight():
    nll_g = jnp.ones((4, 4)) * 3.0
    g_g = jnp.ones((4, 4)) * 1.5
    w = calculate_adaptive_weight(nll_g, g_g)
    np.testing.assert_allclose(float(w), 12.0 / (6.0 + 1e-4), rtol=1e-5)
