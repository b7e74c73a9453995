"""Per-component timing of one transformer layer at serving shapes
(b=64 [CFG-doubled 32], n=257, d=1024, post-norm) on the real chip."""

import time
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, N, D, H, MLP = 64, 257, 1024, 16, 4096
REPS = 200


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[0]))


def timeit(fn, *args):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / REPS


def chain(body):
    """Run `body` REPS times with a data dependency so nothing is elided."""

    @jax.jit
    def run(x, *weights):
        def step(carry, _):
            return body(carry, *weights), None

        out, _ = jax.lax.scan(step, x, jnp.arange(REPS))
        return out

    return run


def main():
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, N, D), jnp.bfloat16)
    wqkv = jax.random.normal(key, (D, 3 * D), jnp.bfloat16) * 0.02
    wout = jax.random.normal(key, (D, D), jnp.bfloat16) * 0.02
    w1 = jax.random.normal(key, (D, MLP), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(key, (MLP, D), jnp.bfloat16) * 0.02
    scale = jnp.ones((D,), jnp.float32)
    bias = jnp.zeros((D,), jnp.float32)

    def ln(y):
        y32 = y.astype(jnp.float32)
        mu = y32.mean(-1, keepdims=True)
        var = y32.var(-1, keepdims=True)
        return ((y32 - mu) * jax.lax.rsqrt(var + 1e-12) * scale + bias).astype(jnp.bfloat16)

    def matmuls_only(y, *w):
        y = y @ wqkv[:, :D]
        y = y @ wout
        y = y @ w1
        y = (y @ w2).astype(jnp.bfloat16)
        return y

    def attn_xla(y, *w):
        qkv = (y @ wqkv).reshape(B, N, 3, H, D // H)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        att = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (1.0 / np.sqrt(D // H))
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)
        o = jnp.einsum("bhnm,bmhd->bnhd", att, v).reshape(B, N, D)
        return ln(y + o @ wout)

    def ffn_ln(y, *w):
        h = jax.nn.gelu(y @ w1, approximate=False)
        return ln(y + (h @ w2).astype(jnp.bfloat16))

    def full_layer(y, *w):
        return ffn_ln(attn_xla(y))

    flops_mm = 2 * B * N * (4 * D * D + 2 * D * MLP)
    flops_attn = 4 * B * H * N * N * (D // H)

    t = timeit(chain(matmuls_only), x)
    print(f"matmuls only (qkv1/3+out+fc1+fc2): {t*1e3:.3f} ms")
    t_attn = timeit(chain(attn_xla), x)
    print(f"attention block XLA (qkv+attn+out+LN): {t_attn*1e3:.3f} ms")
    t_ffn = timeit(chain(ffn_ln), x)
    print(f"FFN+LN XLA: {t_ffn*1e3:.3f} ms")
    t_full = timeit(chain(full_layer), x)
    mfu = (flops_mm + flops_attn) / t_full / 197e12
    print(f"full layer XLA: {t_full*1e3:.3f} ms  ({mfu*100:.1f}% MFU)")

    # fused Pallas attention block at these shapes
    try:
        from maskbit_tpu.nn.pallas_attention import fused_attention_block

        def fused(y, *w):
            return fused_attention_block(
                y, wqkv, jnp.zeros((3 * D,), jnp.float32), wout,
                jnp.zeros((D,), jnp.float32), scale, bias, num_heads=H,
            )
        t_f = timeit(chain(fused), x)
        print(f"attention block fused Pallas: {t_f*1e3:.3f} ms")
        def layer_fused(y, *w):
            return ffn_ln(fused(y))
        t_lf = timeit(chain(layer_fused), x)
        mfu = (flops_mm + flops_attn) / t_lf / 197e12
        print(f"full layer fused: {t_lf*1e3:.3f} ms  ({mfu*100:.1f}% MFU)")
    except Exception as e:
        print("fused block failed:", repr(e)[:300])


if __name__ == "__main__":
    main()
