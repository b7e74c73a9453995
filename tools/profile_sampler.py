"""Itemize one 64-step sampling iteration (VERDICT r1 item 4).

Times, on the real chip, at the bench config (10-bit, batch 32, CFG):
  A. the full jit'd sampler (bench.py path)
  B. a transformer-logits-only scan (same 64 steps, no sampling tail)
  C. tail components in isolation at step shapes: softmax+categorical,
     gumbel, confidence sort, CFG combine
plus a FLOPs roofline for the step, so BENCHMARKS.md can state how close
6.x img/s/chip is to attainable.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 32
NUM_STEPS = 64


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[0]))


def timeit(fn, *args, repeats=3):
    out = fn(*args)
    sync(out if not isinstance(out, tuple) else out[0])
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out if not isinstance(out, tuple) else out[0])
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    from bench import build

    sampler, gen_vars, tok_vars = build()
    labels = jnp.asarray(np.arange(BATCH) % 1000, jnp.int32)

    t_full = timeit(lambda: sampler(gen_vars, tok_vars, jax.random.key(1), labels)[0])
    print(f"A. full sampler: {t_full*1e3:.1f} ms  ({BATCH/t_full:.3f} img/s/chip)")

    # B: transformer-only 64-step scan at CFG shapes (2b, 256, 2)
    from maskbit_tpu.models.generator import LFQBert

    generator = LFQBert(
        img_size=256, hidden_dim=1024, codebook_size=2**10, codebook_splits=2,
        depth=24, heads=16, mlp_dim=4096, dropout=0.0, nclass=1000,
        input_stride=16, dtype=jnp.bfloat16, attention_impl="fused",
    )
    tokens2 = jnp.full((2 * BATCH, 256, 2), 2**5, jnp.int32)
    labels2 = jnp.concatenate([labels, labels])
    drop2 = jnp.concatenate([jnp.zeros((BATCH,), bool), jnp.ones((BATCH,), bool)])

    @jax.jit
    def transformer_only(gen_vars, tokens2):
        def step(carry, _):
            logits = generator.apply(gen_vars, carry, labels2, drop2, deterministic=True)
            # cheap data dependency so the scan can't collapse
            nxt = (carry + logits[..., 0].astype(jnp.int32) % 2) % (2**5 + 1)
            return nxt, None

        out, _ = jax.lax.scan(step, tokens2, jnp.arange(NUM_STEPS))
        return out

    t_tf = timeit(transformer_only, gen_vars, tokens2)
    print(f"B. transformer-only x64: {t_tf*1e3:.1f} ms  -> tail = {(t_full-t_tf)*1e3:.1f} ms "
          f"({(t_full-t_tf)/NUM_STEPS*1e3:.2f} ms/step)")

    # C: isolated tail at per-step shapes
    ecs = 2**5 + 1
    logits = jax.random.normal(jax.random.key(0), (BATCH, 256, 2, ecs), jnp.float32)
    logits_cfg = jax.random.normal(jax.random.key(0), (2 * BATCH, 256, 2, ecs), jnp.bfloat16)

    @jax.jit
    def tail(logits_cfg, key):
        lc, lu = jnp.split(logits_cfg, 2, axis=0)
        lg = (lc + 6.4 * (lc - lu)).astype(jnp.float32)
        key_cat, key_g = jax.random.split(key)
        sampled = jax.random.categorical(key_cat, lg, axis=-1).astype(jnp.int32)
        probs = jax.nn.softmax(lg, axis=-1)
        conf = jnp.take_along_axis(probs, sampled[..., None], axis=-1)[..., 0]
        g = jax.random.gumbel(key_g, sampled.shape)
        conf = jnp.log(conf) + g * 10.5
        srt = jnp.sort(conf.reshape(BATCH, -1), axis=-1)
        thr = jnp.take(srt, 17, axis=1)
        return jnp.where(conf <= thr[:, None, None], 32, sampled)

    t_tail1 = timeit(tail, logits_cfg, jax.random.key(3))
    print(f"C. isolated tail (1 step): {t_tail1*1e3:.3f} ms  (x64 = {t_tail1*64*1e3:.1f} ms)")

    # roofline
    d, mlp, layers = 1024, 4096, 24
    toks = 2 * BATCH * 257
    flops_layer = 2 * toks * (4 * d * d + 2 * d * mlp) + 2 * 2 * 2 * BATCH * 16 * 257 * 257 * (d // 16)
    flops_step = flops_layer * layers
    total = flops_step * NUM_STEPS
    peak = 197e12
    print(f"roofline: {flops_step/1e12:.2f} TFLOP/step, {total/1e12:.0f} TFLOP/batch; "
          f"100% MFU = {total/peak:.2f} s = {BATCH/(total/peak):.2f} img/s/chip")
    print(f"e2e MFU: {total/peak/t_full*100:.1f}%   "
          f"transformer-loop MFU: {total/peak/t_tf*100:.1f}%")


if __name__ == "__main__":
    main()
