"""Per-op budget of the serving MFU residual (VERDICT r4 #2).

bench.py measures 7.04 img/s/chip = 73.9% of the 9.52 img/s flops roofline.
This tool itemizes where the missing 26% sits, at the exact serving config
(10-bit generator, batch 24 -> CFG-doubled 48, n=257, d=1024, 24 layers):

  A. full jit'd sampler (the bench number)
  B. transformer-only 64-step scan (loop minus sampling tail)
  C. per-layer components, scan-chained at (48, 257, 1024):
       - the integrated Pallas fused postnorm attention block
       - the XLA FFN exactly as the model computes it (fc1 -> poly-erf gelu
         -> fc2 -> +residual -> LN, f32 norm)
       - pure-matmul chains (the roofline for each component)
  D. embed/head: bits preprocess + input_proj + pos/class emb; prediction
       head
  E. sampling-tail pieces at step shapes + the one-off conv decode

Each row reports time, analytic TFLOPs, achieved MFU, and `excess` =
time - flops/peak — the non-roofline milliseconds the row contributes.
Results + conclusions go to BENCHMARKS.md ("Round 5: serving residual").
"""

import time
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12  # v5e bf16
BATCH = 24     # bench.py serving batch
CFGB = 2 * BATCH
N, D, H, MLP, DEPTH = 257, 1024, 16, 4096, 24
REPS = 100


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[0]))


def timeit_once(fn, *args, repeats=3):
    out = fn(*args)
    sync(out if not isinstance(out, tuple) else out[0])
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out if not isinstance(out, tuple) else out[0])
        times.append(time.perf_counter() - t0)
    return min(times)


def chain(body, x, *weights, reps=REPS):
    """Data-dependent scan of `body` so per-iteration time excludes the
    ~1.3 ms relay dispatch floor (BENCHMARKS round 4). When the body's
    output shape differs from the carry, fold a scalar of it back instead
    (cheap reduction; keeps the loop data-dependent without reshaping)."""

    @jax.jit
    def run(x, *w):
        def step(carry, _):
            out = body(carry, *w)
            if out.shape == carry.shape and out.dtype == carry.dtype:
                return out, None
            return carry + (1e-6 * jnp.sum(out)).astype(carry.dtype), None

        out, _ = jax.lax.scan(step, x, jnp.arange(reps))
        return out

    t = timeit_once(run, x, *weights)
    return t / reps


def row(name, t, flops):
    mfu = flops / t / PEAK if t else 0.0
    excess = t - flops / PEAK
    print(f"| {name} | {t*1e3:7.3f} ms | {flops/1e9:8.2f} GF | "
          f"{mfu*100:5.1f}% | {excess*1e3:+7.3f} ms |")
    return t, flops


def main():
    key = jax.random.key(0)
    print(f"serving budget @ batch {BATCH} (CFG {CFGB}), n={N}, d={D}, "
          f"{DEPTH} layers, bf16\n")

    # ---- A/B: full sampler + transformer-only scan --------------------
    from bench import build

    sampler, gen_vars, tok_vars = build()
    labels = jnp.asarray(np.arange(BATCH) % 1000, jnp.int32)
    t_full = timeit_once(
        lambda: sampler(gen_vars, tok_vars, jax.random.key(1), labels)[0])
    print(f"A. full sampler: {t_full*1e3:.1f} ms "
          f"({BATCH/t_full:.3f} img/s/chip); per step {t_full/64*1e3:.3f} ms")

    from maskbit_tpu.models.generator import LFQBert

    generator = LFQBert(
        img_size=256, hidden_dim=D, codebook_size=2**10, codebook_splits=2,
        depth=DEPTH, heads=H, mlp_dim=MLP, dropout=0.0, nclass=1000,
        input_stride=16, dtype=jnp.bfloat16, attention_impl="fused",
    )
    tokens2 = jnp.full((CFGB, 256, 2), 2**5, jnp.int32)
    labels2 = jnp.concatenate([labels, labels])
    drop2 = jnp.concatenate([jnp.zeros((BATCH,), bool), jnp.ones((BATCH,), bool)])

    @jax.jit
    def transformer_scan(gv, tokens):
        def step(tok, _):
            logits = generator.apply(gv, tok, labels2, drop2,
                                     deterministic=True)
            # GENUINE data dependency back into tokens (a foldable identity
            # like where(c, tok, tok) lets XLA DCE the whole apply)
            bump = (jnp.sum(logits[..., 0].astype(jnp.float32))
                    .astype(jnp.int32) % 2)
            return jnp.clip(tok + bump, 0, 2**5), None

        out, _ = jax.lax.scan(step, tokens, jnp.arange(64))
        return out

    t_tr = timeit_once(transformer_scan, gen_vars, tokens2)
    print(f"B. transformer-only 64-step scan: {t_tr*1e3:.1f} ms "
          f"({t_tr/64*1e3:.3f} ms/step); tail+decode = "
          f"{(t_full-t_tr)*1e3:.1f} ms total, {(t_full-t_tr)/64*1e3:.3f} ms/step\n")

    # ---- C: per-layer components at (CFGB, N, D) -----------------------
    x = jax.random.normal(key, (CFGB, N, D), jnp.bfloat16)
    wqkv = jax.random.normal(key, (D, 3 * D), jnp.bfloat16) * 0.02
    bqkv = jnp.zeros((3 * D,), jnp.bfloat16)
    wout = jax.random.normal(key, (D, D), jnp.bfloat16) * 0.02
    bout = jnp.zeros((D,), jnp.bfloat16)
    w1 = jax.random.normal(key, (D, MLP), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(key, (MLP, D), jnp.bfloat16) * 0.02
    scale = jnp.ones((D,), jnp.float32)
    bias = jnp.zeros((D,), jnp.float32)

    f_qkv_out = 2 * CFGB * N * D * (3 * D) + 2 * CFGB * N * D * D
    f_attn_ein = 2 * 2 * CFGB * H * N * N * (D // H)
    f_attn = f_qkv_out + f_attn_ein
    f_ffn = 2 * CFGB * N * D * MLP * 2

    print("| component (x1 layer) | time | flops | MFU | excess |")
    print("|---|---|---|---|---|")

    # integrated Pallas fused attention block
    from maskbit_tpu.nn.pallas_attention import fused_attention_block

    def attn_block(xx, wqkv, bqkv, wout, bout, scale, bias):
        return fused_attention_block(xx, wqkv, bqkv, wout, bout, scale, bias,
                                     num_heads=H)

    t_ab, _ = row("Pallas fused attn block (postnorm)",
                  chain(attn_block, x, wqkv, bqkv, wout, bout, scale, bias),
                  f_attn)

    # XLA einsum attention block (the non-Pallas path) for reference
    def xla_attn(xx, wqkv, wout, scale, bias):
        qkv = (xx @ wqkv).reshape(CFGB, N, 3, H, D // H)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        att = jnp.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(D // H)
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(xx.dtype)
        o = jnp.einsum("bhnm,bmhd->bnhd", att, v).reshape(CFGB, N, D)
        o = xx + o @ wout
        mu = jnp.mean(o.astype(jnp.float32), -1, keepdims=True)
        var = jnp.var(o.astype(jnp.float32), -1, keepdims=True)
        return (((o - mu) * jax.lax.rsqrt(var + 1e-12)) * scale + bias).astype(xx.dtype)

    row("XLA einsum attn block (reference)",
        chain(xla_attn, x, wqkv, wout, scale, bias), f_attn)

    # attention pure-matmul roofline at the qkv shape: (M,1024)x(1024,3072)
    # then (M,3072)x(3072,1024). The second matmul consumes EVERY column of
    # the first (a [..., :D] slice lets XLA narrow the qkv matmul to 1/3 of
    # its columns — measured 100.6% "MFU"; a .sum(2) fold materializes the
    # (M,3072) intermediate through HBM — measured 38.8%).
    def mm_attn(xx, wqkv):
        y = (xx @ wqkv) @ wqkv.T
        return (xx + 1e-3 * y).astype(xx.dtype)

    f_mm2 = 2 * 2 * CFGB * N * D * (3 * D)
    row("  pure matmul chain @qkv shapes", chain(mm_attn, x, wqkv), f_mm2)

    # the model's FFN exactly (postnorm, poly-erf gelu, f32 LN)
    from maskbit_tpu.ops.activations import gelu_erf

    def ffn(xx, w1, w2, scale, bias):
        h = gelu_erf(xx @ w1)
        o = xx + (h @ w2)
        mu = jnp.mean(o.astype(jnp.float32), -1, keepdims=True)
        var = jnp.var(o.astype(jnp.float32), -1, keepdims=True)
        return (((o - mu) * jax.lax.rsqrt(var + 1e-12)) * scale + bias).astype(xx.dtype)

    t_ffn, _ = row("XLA FFN (gelu_erf + residual + LN)",
                   chain(ffn, x, w1, w2, scale, bias), f_ffn)

    def mm_ffn(xx, w1, w2):
        return ((xx @ w1) @ w2).astype(xx.dtype)

    row("  pure matmul fc1+fc2", chain(mm_ffn, x, w1, w2), f_ffn)

    # one FULL layer exactly as the model chains it (attn block -> FFN):
    # reconciles the standalone rows against the in-model per-layer time —
    # XLA can fuse across the block boundary inside the scan body
    def full_layer(xx, wqkv, bqkv, wout, bout, scale, bias, w1, w2):
        y = fused_attention_block(xx, wqkv, bqkv, wout, bout, scale, bias,
                                  num_heads=H)
        return ffn(y, w1, w2, scale, bias)

    t_layer, _ = row("full layer (attn block -> FFN)",
                     chain(full_layer, x, wqkv, bqkv, wout, bout, scale, bias,
                           w1, w2), f_attn + f_ffn)

    # ---- D: embed + head ------------------------------------------------
    bits_total = 10  # 10-bit, 2 splits -> input bits dim 10? (K bits total)
    head_classes = 2 * 2**5

    win = jax.random.normal(key, (bits_total, D), jnp.bfloat16) * 0.02
    whead = jax.random.normal(key, (D, head_classes), jnp.bfloat16) * 0.02
    xb = jax.random.normal(key, (CFGB, N - 1, bits_total), jnp.bfloat16)

    f_embed = 2 * CFGB * (N - 1) * bits_total * D
    row("input_proj (bits -> d)", chain(lambda b, w: (b @ w), xb, win), f_embed)
    f_head = 2 * CFGB * N * D * head_classes
    row("prediction head", chain(lambda h, w: (h @ w), x, whead), f_head)

    # ---- E: sampling tail at step shapes --------------------------------
    logits_c = jax.random.normal(key, (BATCH, 256, 2, 2**5), jnp.float32)
    logits_u = jax.random.normal(key, (BATCH, 256, 2, 2**5), jnp.float32)

    def tail(lc, lu):
        logits = lc + 6.4 * (lc - lu)
        k = jax.random.key(3)
        sampled = jax.random.categorical(k, logits)
        probs = jax.nn.softmax(logits, -1)
        conf = jnp.take_along_axis(probs, sampled[..., None], -1)[..., 0]
        conf = jnp.log(conf) + jax.random.gumbel(k, conf.shape) * 10.5
        flat = conf.reshape(BATCH, -1)
        srt = jnp.sort(flat, axis=-1)
        thresh = srt[:, 100]
        return jnp.where(flat <= thresh[:, None], 0, sampled.reshape(BATCH, -1))

    t_tail = chain(tail, logits_c, logits_u)
    print(f"| sampling tail (CFG+softmax+cat+gumbel+sort) | {t_tail*1e3:7.3f} ms "
          f"| ~0 | — | {t_tail*1e3:+7.3f} ms |")

    from maskbit_tpu.models.tokenizer import ConvVQModel

    tokenizer = ConvVQModel(
        num_channels=3, hidden_channels=128, channel_mult=(1, 1, 2, 2, 4),
        num_resolutions=5, num_res_blocks=2, token_size=10,
        codebook_size=2**10, quantizer_type="lookup-free",
        entropy_loss_weight=0.0, sample_with_conv=True, dtype=jnp.bfloat16,
    )
    tokv = jax.jit(lambda k: tokenizer.init(
        k, jnp.zeros((1, 256), jnp.int32), method="decode_tokens"))(key)
    tokv = jax.tree.map(lambda v: v.astype(jnp.bfloat16)
                        if v.dtype == jnp.float32 else v, tokv)
    toks = jnp.zeros((BATCH, 256), jnp.int32)
    decode = jax.jit(lambda v, t: tokenizer.apply(v, t, method="decode_tokens"))
    t_dec = timeit_once(decode, tokv, toks)
    print(f"| final conv decode (once/64 steps) | {t_dec*1e3:7.3f} ms | | | |")

    # ---- reconciliation --------------------------------------------------
    per_step = DEPTH * (t_ab + t_ffn)
    print(f"\nreconstructed step = 24*(attn_block + ffn) = {per_step*1e3:.3f} ms")
    print(f"reconstructed step = 24*(full layer)        = {DEPTH*t_layer*1e3:.3f} ms")
    print(f"measured transformer step (B/64)           = {t_tr/64*1e3:.3f} ms")
    print(f"measured full step (A/64)                  = {t_full/64*1e3:.3f} ms")
    # 20.7 TFLOP/image (BENCHMARKS round 2) x 24 images / 64 steps
    roofline_step = 20.7e12 * BATCH / 64 / PEAK
    print(f"roofline step (20.7 TF/img @ {PEAK/1e12:.0f} TF peak)  = "
          f"{roofline_step*1e3:.3f} ms")


if __name__ == "__main__":
    main()
