"""Roofline the training steps (VERDICT r1 item 5).

Times the full-size Stage-I (12-bit tokenizer + GAN) and Stage-II (14-bit
generator) jit'd train steps on the real chip at the production configs
(256px, batch 16, bf16 compute), pulls XLA's own flop estimate from
`compiled.cost_analysis()`, and prints per-step time, throughput, and MFU.
Also itemizes Stage-I into generator-loss-only / discriminator-only
sub-programs to locate the cost.
"""

import time
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12  # v5e bf16
BATCH = int(os.environ.get("MASKBIT_PROFILE_BATCH", "16"))
RES = 256


def sync(tree):
    leaf = jax.tree.leaves(tree)[0]
    return float(jnp.sum(jnp.ravel(leaf)[0]))


def bench_step(fn, *args, repeats=3, iters=8):
    """Dispatch `iters` back-to-back calls, sync once: amortizes the ~30 ms
    relay dispatch latency exactly as a real training loop does (async
    dispatch pipelines; the per-call floor here measures ~32 ms even for a
    trivial groupnorm)."""
    out = fn(*args)
    sync(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        times.append((time.perf_counter() - t0) / iters)
    return min(times)


def flops_of(jitted, *args):
    cost = jitted.lower(*args).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", float("nan")))


def stage_one():
    import optax

    from maskbit_tpu.losses.vqgan import VQGANLossConfig
    from maskbit_tpu.models.tokenizer import ConvVQModel
    from maskbit_tpu.nn.discriminator import create_discriminator
    from maskbit_tpu.train.tokenizer_trainer import (
        init_tokenizer_train_state,
        make_optimizer,
        make_tokenizer_train_step,
    )

    bits = 12
    model = ConvVQModel(
        num_channels=3, hidden_channels=128, channel_mult=(1, 1, 2, 2, 4),
        num_resolutions=5, num_res_blocks=2, token_size=bits,
        codebook_size=2**bits, quantizer_type="lookup-free",
        entropy_loss_weight=0.02, sample_with_conv=True, dtype=jnp.bfloat16,
    )
    disc = create_discriminator({"name": "VQGAN+Discriminator"}, dtype=jnp.bfloat16)
    loss_cfg = VQGANLossConfig(
        discriminator_start=0, discriminator_weight=0.1, perceptual_weight=0.0,
        perceptual_loss="none", reconstruction_weight=1.0,
        quantizer_weight=1.0, lecam_regularization_weight=0.001,
    )
    gen_tx = make_optimizer(1e-4)
    disc_tx = make_optimizer(1e-4)
    state = init_tokenizer_train_state(
        model, disc, gen_tx, disc_tx, jax.random.key(0), (BATCH, RES, RES, 3)
    )
    step = jax.jit(make_tokenizer_train_step(model, disc, gen_tx, disc_tx, loss_cfg))
    images = jnp.asarray(
        np.random.default_rng(0).uniform(size=(BATCH, RES, RES, 3)), jnp.float32
    )
    rng = jax.random.key(1)

    t = bench_step(lambda: step(state, images, None, rng)[0].gen_params)
    f = flops_of(step, state, images, None, rng)
    print(f"Stage-I full step: {t*1e3:.1f} ms  {BATCH/t:.1f} img/s/chip  "
          f"XLA flops {f/1e12:.2f} TF  MFU {f/t/PEAK*100:.1f}%")

    # sub-programs
    @jax.jit
    def recon_fwd(gp, images):
        recon, result = model.apply({"params": gp}, images)
        return jnp.mean((recon - images) ** 2) + result["quantizer_loss"]

    t_fwd = bench_step(lambda: recon_fwd(state.gen_params, images))
    f_fwd = flops_of(recon_fwd, state.gen_params, images)
    print(f"  tokenizer fwd only: {t_fwd*1e3:.1f} ms ({f_fwd/1e12:.2f} TF, "
          f"MFU {f_fwd/t_fwd/PEAK*100:.1f}%)")

    grad_fwd = jax.jit(jax.grad(lambda gp: recon_fwd(gp, images)))
    t_bwd = bench_step(lambda: grad_fwd(state.gen_params))
    f_bwd = flops_of(grad_fwd, state.gen_params)
    print(f"  tokenizer fwd+bwd: {t_bwd*1e3:.1f} ms ({f_bwd/1e12:.2f} TF, "
          f"MFU {f_bwd/t_bwd/PEAK*100:.1f}%)")

    @jax.jit
    def disc_fwd(dp, images):
        return jnp.mean(disc.apply({"params": dp}, images))

    t_d = bench_step(lambda: disc_fwd(state.disc_params, images))
    f_d = flops_of(disc_fwd, state.disc_params, images)
    print(f"  discriminator fwd: {t_d*1e3:.2f} ms ({f_d/1e12:.3f} TF)")
    return t, f


def stage_two():
    from maskbit_tpu.losses.mlm import MLMLossConfig
    from maskbit_tpu.models.generator import LFQBert
    from maskbit_tpu.models.tokenizer import ConvVQModel
    from maskbit_tpu.train.generator_trainer import (
        init_generator_train_state,
        make_generator_train_step,
    )
    from maskbit_tpu.train.tokenizer_trainer import make_optimizer

    bits = 14
    tokenizer = ConvVQModel(
        num_channels=3, hidden_channels=128, channel_mult=(1, 1, 2, 2, 4),
        num_resolutions=5, num_res_blocks=2, token_size=bits,
        codebook_size=2**bits, quantizer_type="lookup-free",
        entropy_loss_weight=0.0, sample_with_conv=True, dtype=jnp.bfloat16,
    )
    generator = LFQBert(
        img_size=RES, hidden_dim=1024, codebook_size=2**bits, codebook_splits=2,
        depth=24, heads=16, mlp_dim=4096, dropout=0.1, nclass=1000,
        input_stride=16, dtype=jnp.bfloat16,
    )
    tx = make_optimizer(1e-4)
    state = init_generator_train_state(generator, tx, jax.random.key(0))
    tok_vars = jax.jit(tokenizer.init)(jax.random.key(1), jnp.zeros((1, RES, RES, 3)))
    step = jax.jit(make_generator_train_step(generator, tokenizer, tx, MLMLossConfig()))
    images = jnp.asarray(
        np.random.default_rng(0).uniform(size=(BATCH, RES, RES, 3)), jnp.float32
    )
    labels = jnp.asarray(np.arange(BATCH) % 1000, jnp.int32)
    rng = jax.random.key(2, impl="rbg")  # the trainers' production PRNG

    t = bench_step(lambda: step(state, tok_vars, images, labels, rng)[0].params)
    f = flops_of(step, state, tok_vars, images, labels, rng)
    print(f"Stage-II full step: {t*1e3:.1f} ms  {BATCH/t:.1f} img/s/chip  "
          f"XLA flops {f/1e12:.2f} TF  MFU {f/t/PEAK*100:.1f}%")

    @jax.jit
    def encode_only(tok_vars, images):
        return tokenizer.apply(tok_vars, images, method="tokenize")

    t_e = bench_step(lambda: encode_only(tok_vars, images))
    f_e = flops_of(encode_only, tok_vars, images)
    print(f"  frozen-tokenizer encode: {t_e*1e3:.1f} ms ({f_e/1e12:.2f} TF, "
          f"MFU {f_e/t_e/PEAK*100:.1f}%)")
    return t, f


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "one"):
        stage_one()
    if which in ("both", "two"):
        stage_two()
