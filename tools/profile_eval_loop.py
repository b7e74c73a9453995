"""Measure the 50k gFID eval-loop throughput on the chip (VERDICT r2 #3).

Times one eval_maskbit loop iteration at the production batch (100): the
64-step CFG sampler + on-device InceptionV3 feature pass (random-initialized
params — identical compute to the pt-fid weights), and extrapolates hours
per 50k samples per chip.

Run:  PYTHONPATH=.:/root/.axon_site python -u tools/profile_eval_loop.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[0]))


def main():
    from maskbit_tpu.eval.inception import InceptionV3
    from maskbit_tpu.models.generator import LFQBert
    from maskbit_tpu.models.tokenizer import ConvVQModel
    from maskbit_tpu.sampling.sample import SamplingConfig, make_sampler

    batch = int(os.environ.get("EVAL_BATCH", "100"))
    bits = 14
    dtype = jnp.bfloat16
    tokenizer = ConvVQModel(
        num_channels=3, hidden_channels=128, channel_mult=(1, 1, 2, 2, 4),
        num_resolutions=5, num_res_blocks=2, token_size=bits,
        codebook_size=2**bits, quantizer_type="lookup-free",
        entropy_loss_weight=0.0, sample_with_conv=True, dtype=dtype,
    )
    generator = LFQBert(
        img_size=256, hidden_dim=1024, codebook_size=2**bits, codebook_splits=2,
        depth=24, heads=16, mlp_dim=4096, dropout=0.0, nclass=1000,
        input_stride=16, dtype=dtype,
    )
    cfg = SamplingConfig(
        num_steps=64, guidance_scale=7.1, guidance_annealing="cosine",
        scale_pow=3.0, randomize_temperature=7.8, mask_schedule_strategy="arccos",
        mask_token=generator.mask_token, patch_size=16,
        codebook_size=2**bits, codebook_splits=2,
    )

    def zeros_init(model, *args):
        shapes = jax.eval_shape(model.init, jax.random.key(0), *args)
        return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    gen_vars = zeros_init(
        generator,
        jnp.zeros((1, 256, 2), jnp.int32), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), bool),
    )
    tok_vars = zeros_init(tokenizer, jnp.zeros((1, 256, 256, 3)))

    sampler = make_sampler(generator, tokenizer, cfg, jit=True)
    inception = InceptionV3()
    incep_vars = zeros_init(inception, jnp.zeros((1, 299, 299, 3)))
    incep_fn = jax.jit(lambda img: inception.apply(incep_vars, img))

    labels = jnp.asarray(np.arange(batch) % 1000, jnp.int32)
    key = jax.random.key(0)

    def one_iter(key):
        images, _ = sampler(gen_vars, tok_vars, key, labels)
        feats = incep_fn(jnp.clip(images, 0.0, 1.0) * 255.0)
        return feats

    feats = one_iter(key)  # compile
    sync(feats["2048"])
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        feats = one_iter(jax.random.fold_in(key, i))
        sync(feats["2048"])
        times.append(time.perf_counter() - t0)
    t = min(times)

    # inception-only share
    images = jnp.zeros((batch, 256, 256, 3))
    f = incep_fn(images)
    sync(f["2048"])
    t0 = time.perf_counter()
    for i in range(4):
        f = incep_fn(images + i)
    sync(f["2048"])
    t_incep = (time.perf_counter() - t0) / 4

    per_img = t / batch
    hours_50k = 50_000 * per_img / 3600
    print(
        f"eval loop @ batch {batch}: {t:.2f} s/iter "
        f"({batch/t:.2f} img/s/chip; inception {t_incep*1e3:.0f} ms = "
        f"{100*t_incep/t:.1f}% of the iter) -> 50k in {hours_50k:.2f} h/chip"
    )


if __name__ == "__main__":
    main()
