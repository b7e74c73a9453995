"""Full-system training check: train Stage-I + Stage-II from scratch on
synthetic class-structured data, then sample and verify class conditioning.

This is the closest available end-to-end proof (no ImageNet in the build
environment) that the training dynamics work: the VQGAN loss (with the
discriminator engaging mid-run and the adaptive weight live), the frozen
tokenizer -> MLM pipeline, EMA, and the CFG sampler.

Synthetic task: 10 classes; each image is a 2x2 grid of quadrants whose
colors derive from the class id, plus noise. Success = generated samples'
quadrant colors match their label's template far better than chance.

Run:  python tools/system_check.py        (~10 min on one v5e chip)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from maskbit_tpu.losses.mlm import MLMLossConfig
from maskbit_tpu.losses.vqgan import VQGANLossConfig
from maskbit_tpu.models.generator import LFQBert
from maskbit_tpu.models.tokenizer import ConvVQModel
from maskbit_tpu.nn.discriminator import NLayerDiscriminatorv2
from maskbit_tpu.sampling.sample import SamplingConfig, make_sampler
from maskbit_tpu.train.generator_trainer import (
    init_generator_train_state,
    make_generator_train_step,
)
from maskbit_tpu.train.tokenizer_trainer import (
    init_tokenizer_train_state,
    make_optimizer,
    make_tokenizer_train_step,
)

RES = 32
NCLASS = 10
BATCH = 32

_template_rng = np.random.default_rng(1234)
CLASS_COLORS = _template_rng.uniform(0.1, 0.9, size=(NCLASS, 2, 2, 3)).astype(np.float32)


def make_batch(rng, batch=BATCH):
    labels = rng.integers(0, NCLASS, size=(batch,))
    quad = CLASS_COLORS[labels]  # (b, 2, 2, 3)
    imgs = np.repeat(np.repeat(quad, RES // 2, axis=1), RES // 2, axis=2)
    imgs = np.clip(imgs + rng.normal(scale=0.03, size=imgs.shape), 0, 1)
    return imgs.astype(np.float32), labels.astype(np.int32)


def quadrant_means(imgs):
    h = RES // 2
    return np.stack([
        imgs[:, :h, :h].mean((1, 2)), imgs[:, :h, h:].mean((1, 2)),
        imgs[:, h:, :h].mean((1, 2)), imgs[:, h:, h:].mean((1, 2)),
    ], axis=1).reshape(len(imgs), 2, 2, 3)


def main():
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16

    tokenizer = ConvVQModel(
        num_channels=3, hidden_channels=64, channel_mult=(1, 2), num_resolutions=2,
        num_res_blocks=1, token_size=8, codebook_size=256,
        quantizer_type="lookup-free", entropy_loss_weight=0.02, dtype=dtype,
    )
    disc = NLayerDiscriminatorv2(num_channels=3, hidden_channels=64, num_stages=1, dtype=dtype)
    loss_cfg = VQGANLossConfig(
        reconstruction_loss="l2", reconstruction_weight=4.0, quantizer_weight=1.0,
        perceptual_loss="none", perceptual_weight=0.0,
        discriminator_loss="hinge", discriminator_factor=1.0,
        discriminator_weight=0.02, discriminator_start=150,
        discriminator_gradient_penalty="adopt_weight",
        lecam_regularization_weight=0.001, entropy_annealing_steps=100,
        entropy_annealing_factor=2.0,
    )
    gen_tx = make_optimizer(2e-4)
    disc_tx = make_optimizer(2e-4)
    state = init_tokenizer_train_state(
        tokenizer, disc, gen_tx, disc_tx, jax.random.key(0), (BATCH, RES, RES, 3)
    )
    tok_step = jax.jit(
        make_tokenizer_train_step(tokenizer, disc, gen_tx, disc_tx, loss_cfg),
        donate_argnums=0,
    )

    print("=== Stage I: tokenizer + GAN ===", flush=True)
    t0 = time.time()
    recon0 = None
    for i in range(400):
        images, _ = make_batch(rng)
        state, metrics = tok_step(state, jnp.asarray(images), None, jax.random.key(i))
        if i % 100 == 0 or i == 399:
            recon = float(metrics["reconstruction_loss"])
            recon0 = recon0 or recon
            print(f"  step {i}: recon={recon:.4f} d_weight={float(metrics['d_weight']):.4f} "
                  f"disc={float(metrics['discriminator_loss']):.4f}", flush=True)
    recon_final = float(metrics["reconstruction_loss"])
    print(f"  Stage I in {time.time()-t0:.0f}s; recon {recon0:.4f} -> {recon_final:.4f}")
    assert recon_final < recon0 * 0.2, "tokenizer failed to converge"

    tok_vars = {"params": state.ema.params}

    generator = LFQBert(
        img_size=RES, hidden_dim=128, codebook_size=256, codebook_splits=2,
        depth=4, heads=4, mlp_dim=256, dropout=0.1, nclass=NCLASS,
        input_stride=2, dtype=dtype,
    )
    gtx = make_optimizer(4e-4)
    gstate = init_generator_train_state(generator, gtx, jax.random.key(1))
    gen_step = jax.jit(make_generator_train_step(
        generator, tokenizer, gtx, MLMLossConfig(), class_label_dropout=0.1,
        ema_kwargs={"decay": 0.995},
    ), donate_argnums=0)

    print("=== Stage II: masked generator ===", flush=True)
    t0 = time.time()
    for i in range(600):
        images, labels = make_batch(rng)
        gstate, gmetrics = gen_step(
            gstate, tok_vars, jnp.asarray(images), jnp.asarray(labels), jax.random.key(1000 + i)
        )
        if i % 150 == 0 or i == 599:
            print(f"  step {i}: mlm={float(gmetrics['mlm_loss']):.4f} "
                  f"masked_acc={float(gmetrics['masked_correct_tokens']):.4f}", flush=True)
    print(f"  Stage II in {time.time()-t0:.0f}s")

    print("=== Sampling ===", flush=True)
    cfg = SamplingConfig(
        num_steps=12, guidance_scale=2.0, guidance_annealing="cosine", scale_pow=2.5,
        randomize_temperature=2.0, mask_schedule_strategy="arccos",
        mask_token=generator.mask_token, patch_size=RES // 2,
        codebook_size=256, codebook_splits=2,
    )
    sampler = make_sampler(generator, tokenizer, cfg, jit=True)
    labels = np.arange(NCLASS, dtype=np.int32).repeat(3)
    images, _ = sampler({"params": gstate.ema.params}, tok_vars,
                        jax.random.key(7), jnp.asarray(labels))
    images = np.clip(np.asarray(images, np.float32), 0, 1)

    got = quadrant_means(images)
    target = CLASS_COLORS[labels]
    err_match = float(np.mean((got - target) ** 2))
    # chance baseline: compare against every sample matched to a random class
    perm = np.random.default_rng(9).permutation(len(labels))
    err_chance = float(np.mean((got - target[perm]) ** 2))
    print(f"  quadrant-color MSE: matched={err_match:.5f} chance={err_chance:.5f}")
    assert err_match < err_chance * 0.35, "generated samples are not class-conditioned"
    print("SYSTEM CHECK PASSED: two-stage training + CFG sampling are functional")


if __name__ == "__main__":
    main()
