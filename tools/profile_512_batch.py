"""512px sampling batch sweep (seq 1025, fused Pallas attention, 10-bit).

Round-2 recorded 1.33 img/s/chip at batch 8; sampling is forward-only, so
larger batches may fit HBM and amortize better — sweep and report.

Run:  PYTHONPATH=.:/root/.axon_site python -u tools/profile_512_batch.py
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
    from maskbit_tpu.models.generator import LFQBert
    from maskbit_tpu.models.tokenizer import ConvVQModel
    from maskbit_tpu.sampling.sample import SamplingConfig, make_sampler

    bits = 10
    dtype = jnp.bfloat16
    tokenizer = ConvVQModel(
        num_channels=3, hidden_channels=128, channel_mult=(1, 1, 2, 2, 4),
        num_resolutions=5, num_res_blocks=2, token_size=bits,
        codebook_size=2**bits, quantizer_type="lookup-free",
        entropy_loss_weight=0.0, sample_with_conv=True, dtype=dtype,
    )
    generator = LFQBert(
        img_size=512, hidden_dim=1024, codebook_size=2**bits, codebook_splits=2,
        depth=24, heads=16, mlp_dim=4096, dropout=0.0, nclass=1000,
        input_stride=16, dtype=dtype, attention_impl="fused",
    )
    cfg = SamplingConfig(
        num_steps=64, guidance_scale=7.1, guidance_annealing="cosine",
        scale_pow=3.0, randomize_temperature=7.8, mask_schedule_strategy="arccos",
        mask_token=generator.mask_token, patch_size=32,
        codebook_size=2**bits, codebook_splits=2,
    )

    def zeros_init(model, *args):
        shapes = jax.eval_shape(model.init, jax.random.key(0), *args)
        return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    gen_vars = zeros_init(
        generator, jnp.zeros((1, 1024, 2), jnp.int32), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), bool),
    )
    tok_vars = zeros_init(tokenizer, jnp.zeros((1, 512, 512, 3)))
    sampler = make_sampler(generator, tokenizer, cfg, jit=True)

    for batch in (8, 12, 16):
        labels = jnp.asarray(np.arange(batch) % 1000, jnp.int32)
        key = jax.random.key(0)
        try:
            images, _ = sampler(gen_vars, tok_vars, key, labels)
            sync(images)
            times = []
            for i in range(2):
                t0 = time.perf_counter()
                images, _ = sampler(gen_vars, tok_vars, jax.random.fold_in(key, i), labels)
                sync(images)
                times.append(time.perf_counter() - t0)
            t = min(times)
            print(f"512px batch {batch}: {t:.2f} s  {batch/t:.3f} img/s/chip")
        except Exception as e:  # noqa: BLE001 — OOM etc: report and continue
            print(f"512px batch {batch}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
