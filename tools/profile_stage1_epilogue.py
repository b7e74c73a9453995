"""Stage-I conv-stack epilogue analysis (VERDICT r4 #3, SURVEY §7 item 10).

The tokenizer's ResidualBlock chains GroupNorm(32, 1e-6, f32) -> SiLU ->
conv3x3 (nn/conv.py:36-61). This tool measures, at the decoder's dominant
shapes (flagship 128-hidden, 256px, batch 32):

  * pure conv3x3 (the matmul-limit proxy for the chain)
  * GN+SiLU alone (the epilogue's HBM passes)
  * the full GN->SiLU->conv chain as XLA compiles it
  * fwd AND fwd+bwd (training cost is 2 traversals + the disc/adaptive
    extras)

so BENCHMARKS.md can state how much of the Stage-I step the epilogue
actually costs and whether a fused Pallas GN+SiLU+conv kernel is worth
building. Run on the real chip:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_stage1_epilogue.py
"""

import time
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12  # v5e bf16
BATCH = 32
REPS = 30


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.sum(jnp.ravel(leaf)[0]))


def chain(body, *args, reps=REPS):
    @jax.jit
    def run(x, *rest):
        def step(carry, _):
            out = body(carry, *rest)
            # keep shapes closed: fold the output back into the carry
            return carry + 1e-6 * out.astype(carry.dtype)[..., :carry.shape[-1]] \
                if out.shape == carry.shape else carry + 1e-6 * jnp.mean(out), None

        out, _ = jax.lax.scan(step, x, jnp.arange(reps))
        return out

    out = run(*args)
    sync(out)
    t0 = time.perf_counter()
    out = run(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def gn_silu(x, scale, bias):
    f = x.astype(jnp.float32)
    g = f.reshape(*f.shape[:-1], 32, f.shape[-1] // 32)
    mu = jnp.mean(g, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(g, axis=(1, 2, 4), keepdims=True)
    n = ((g - mu) * jax.lax.rsqrt(var + 1e-6)).reshape(f.shape)
    n = n * scale + bias
    return jax.nn.silu(n).astype(x.dtype)


def conv3x3(x, w):
    # no preferred_element_type: its transpose rule rejects the mixed
    # (bf16 operand, f32 cotangent) pair under jax.grad, and the MXU
    # accumulates in f32 internally for bf16 inputs regardless
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def report(name, t, flops, bytes_moved):
    mfu = flops / t / PEAK
    bw = bytes_moved / t / 1e9
    print(f"| {name} | {t*1e3:7.3f} ms | {flops/1e9:7.1f} GF | {mfu*100:5.1f}% "
          f"| ~{bw:5.0f} GB/s |")


def measure_shape(h, w, c):
    key = jax.random.key(0)
    x = jax.random.normal(key, (BATCH, h, w, c), jnp.bfloat16)
    kern = jax.random.normal(key, (3, 3, c, c), jnp.bfloat16) * 0.02
    scale = jnp.ones((c,), jnp.float32)
    bias = jnp.zeros((c,), jnp.float32)

    nbytes = BATCH * h * w * c * 2
    f_conv = 2 * BATCH * h * w * c * c * 9

    print(f"\n### ({BATCH}, {h}, {w}, {c}) bf16 — activation {nbytes/1e6:.0f} MB")
    print("| op | time | flops | MFU | apparent BW |")
    print("|---|---|---|---|---|")

    t_conv = chain(lambda xx, ww: conv3x3(xx, ww), x, kern)
    report("conv3x3 alone", t_conv, f_conv, 2 * nbytes)

    t_gn = chain(lambda xx, s, b: gn_silu(xx, s, b), x, scale, bias)
    report("GN+SiLU alone", t_gn, 0, 3 * nbytes)

    t_full = chain(lambda xx, s, b, ww: conv3x3(gn_silu(xx, s, b), ww),
                   x, scale, bias, kern)
    report("GN+SiLU+conv chain", t_full, f_conv, 3 * nbytes)

    print(f"epilogue overhead: {(t_full-t_conv)*1e3:.3f} ms "
          f"({(t_full-t_conv)/t_full*100:.1f}% of the chain)")

    # training view: fwd+bwd of the chain (what Stage-I actually pays)
    def loss(ww, xx):
        return jnp.sum(conv3x3(gn_silu(xx, scale, bias), ww).astype(jnp.float32) ** 2) * 1e-6

    grad = jax.jit(jax.grad(loss))
    gw = grad(kern, x)
    sync(gw)
    t0 = time.perf_counter()
    for _ in range(8):
        gw = grad(kern, x)
    sync(gw)
    t_bwd = (time.perf_counter() - t0) / 8

    def loss_conv(ww, xx):
        return jnp.sum(conv3x3(xx, ww).astype(jnp.float32) ** 2) * 1e-6

    grad_c = jax.jit(jax.grad(loss_conv))
    gc = grad_c(kern, x)
    sync(gc)
    t0 = time.perf_counter()
    for _ in range(8):
        gc = grad_c(kern, x)
    sync(gc)
    t_bwd_c = (time.perf_counter() - t0) / 8
    print(f"fwd+bwd chain {t_bwd*1e3:.2f} ms vs conv-only {t_bwd_c*1e3:.2f} ms "
          f"(epilogue bwd overhead {(t_bwd-t_bwd_c)*1e3:.2f} ms)")
    return t_conv, t_gn, t_full


def main():
    print(f"devices: {jax.devices()}")
    # decoder-dominant shapes (flagship 128-hidden, channel_mult (1,1,2,2,4))
    measure_shape(256, 256, 128)   # final upsampling stage (biggest tensor)
    measure_shape(128, 128, 128)
    measure_shape(64, 64, 256)
    measure_shape(16, 16, 512)     # mid stages


if __name__ == "__main__":
    main()
