"""Benchmark: class-conditional 64-step sampling throughput (images/sec/chip).

BASELINE.json config 3 task: MaskBit-Generator 10-bit, 64-step sampling
with CFG — the flagship inference path (reference
modeling/modules/sampling.py:13-136 driven by scripts/eval_maskbit.py,
which samples in batches of 100). Batch is a serving choice; this bench
runs the measured throughput-optimal batch for one v5e chip (24 — see
BENCHMARKS.md for the batch sweep).

The whole sampling loop (64 transformer steps with doubled-batch CFG +
Gumbel-confidence re-masking + final LFQ bit-unpack + conv decode) runs as
ONE jit'd XLA program; weights are random (throughput only).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` compares against bench_baseline.json — the FIRST recorded
run on this hardware (round 1: f32 weights, batch 8). Each round runs the
current best serving configuration, so the ratio is the framework's
cumulative throughput trend, not a fixed-config A/B.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 24  # throughput-optimal serving batch on one v5e chip (round-2 sweep)
NUM_STEPS = 64
REPEATS = 3
# FLOPs roofline for this workload on one v5e (BENCHMARKS.md "Round 2"):
# 64-step CFG sampling costs 20.7 TFLOP/image; 197 bf16 TFLOPs peak
# -> 9.52 img/s/chip at 100% MFU. The BASELINE.json ">=5x A100" target
# (~13-17 img/s) exceeds this bf16 roofline — see BASELINE.md "Throughput
# context": an A100 running the reference as written is ~2.6-3.4 img/s,
# and int8 cannot raise the ceiling here (measured 1.09x bf16 on this
# part at the dominant serving matmul shape, round 4).
ROOFLINE_IMG_S = 9.52
# The honest ceiling: XLA's own pure back-to-back matmuls at the serving
# shapes deliver 68-78% of peak (tools/profile_serving_budget.py, round 5),
# bounding any same-shape implementation at ~7.4 img/s/chip; the sampler
# runs at ~95% of that delivered-matmul bound.
MATMUL_BOUND_IMG_S = 7.4
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")


def build():
    from maskbit_tpu.models.generator import LFQBert
    from maskbit_tpu.models.tokenizer import ConvVQModel
    from maskbit_tpu.sampling.sample import SamplingConfig, make_sampler

    bits = 10
    compute_dtype = jnp.bfloat16

    tokenizer = ConvVQModel(
        num_channels=3, hidden_channels=128, channel_mult=(1, 1, 2, 2, 4),
        num_resolutions=5, num_res_blocks=2, token_size=bits,
        codebook_size=2**bits, quantizer_type="lookup-free",
        entropy_loss_weight=0.0, sample_with_conv=True, dtype=compute_dtype,
    )
    generator = LFQBert(
        img_size=256, hidden_dim=1024, codebook_size=2**bits, codebook_splits=2,
        depth=24, heads=16, mlp_dim=4096, dropout=0.0, nclass=1000,
        input_stride=16, dtype=compute_dtype,
        attention_impl="fused",  # Pallas fused postnorm attention block
    )
    cfg = SamplingConfig(
        softmax_temperature=1.0, randomize_temperature=10.5,
        mask_schedule_strategy="arccos", num_steps=NUM_STEPS,
        guidance_scale=6.4, mask_token=2**5, patch_size=16,
        guidance_annealing="cosine", use_sampling_annealing=False,
        scale_pow=2.5, codebook_size=2**bits, codebook_splits=2,
    )

    key = jax.random.key(0)
    gen_vars = jax.jit(generator.init)(
        key, jnp.zeros((1, 256, 2), jnp.int32), jnp.zeros((1,), jnp.int32)
    )
    tok_vars = jax.jit(
        lambda k: tokenizer.init(k, jnp.zeros((1, 256), jnp.int32), method="decode_tokens")
    )(key)
    # serve in bf16 weight storage: halves weight HBM traffic
    to_bf16 = lambda t: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )
    gen_vars, tok_vars = to_bf16(gen_vars), to_bf16(tok_vars)

    sampler = make_sampler(generator, tokenizer, cfg, jit=True)
    return sampler, gen_vars, tok_vars


ATTEMPTS = 3
# per-attempt wall ceiling: cold relay compile of the full sampler is ~5 min;
# 20 min means a hung device init (observed when the relay tunnel drops) is
# killed and retried instead of stalling the round artifact forever
ATTEMPT_TIMEOUT_S = int(os.environ.get("MASKBIT_BENCH_TIMEOUT", 20 * 60))


def _child_argv():
    """The measure-attempt subprocess command (separate fn for tests: the
    hang-retry plumbing is exercised with a scripted child)."""
    import sys

    return [sys.executable, os.path.abspath(__file__), "--child"]


def main():
    # Two relay failure modes (both observed on this VM, CLAUDE.md notes):
    # the remote-compile helper 500s transiently — an exception — and the
    # tunnel drops, which HANGS in device init (uninterruptible in-process).
    # Run each measure attempt in a subprocess with a hard timeout so both
    # modes become retryable; the child inherits stdout, so the JSON line
    # still lands in the driver's capture.
    import subprocess
    import sys

    for attempt in range(ATTEMPTS):
        try:
            proc = subprocess.run(
                _child_argv(),
                timeout=ATTEMPT_TIMEOUT_S,
            )
            if proc.returncode == 0:
                return
            reason = f"rc={proc.returncode}"
        except subprocess.TimeoutExpired:
            reason = f"hang (> {ATTEMPT_TIMEOUT_S}s, relay device init?)"
        if attempt + 1 < ATTEMPTS:
            print(f"bench attempt {attempt + 1}/{ATTEMPTS} failed ({reason}); "
                  f"retrying in {60 * (attempt + 1)}s", file=sys.stderr)
            time.sleep(60 * (attempt + 1))
    raise SystemExit(f"bench failed after {ATTEMPTS} attempts: {reason}")


def _measure():
    sampler, gen_vars, tok_vars = build()
    labels = jnp.asarray(np.arange(BATCH) % 1000, jnp.int32)

    # compile + warmup. Host sync via a scalar data dependency: transferring
    # one element forces the full program to complete without paying the
    # (slow, tunneled) full-image D2H — block_until_ready alone is not a
    # reliable fence on the experimental axon relay backend.
    def sync(x):
        return float(jnp.sum(x[0, 0, 0]))

    images, _ = sampler(gen_vars, tok_vars, jax.random.key(1), labels)
    sync(images)

    times = []
    for i in range(REPEATS):
        start = time.perf_counter()
        images, _ = sampler(gen_vars, tok_vars, jax.random.key(2 + i), labels)
        sync(images)
        times.append(time.perf_counter() - start)

    best = min(times)
    n_chips = jax.device_count()
    images_per_sec_per_chip = BATCH / best / n_chips

    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f)["value"]
    else:
        baseline = images_per_sec_per_chip
        with open(BASELINE_FILE, "w") as f:
            json.dump(
                {"value": baseline, "note": "first recorded run on this hardware",
                 "device": str(jax.devices()[0])},
                f,
            )

    print(json.dumps({
        "metric": f"images/sec/chip (10-bit generator, 64-step CFG sampling, batch {BATCH})",
        "value": round(images_per_sec_per_chip, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec_per_chip / baseline, 4),
        "mfu": round(images_per_sec_per_chip / ROOFLINE_IMG_S, 4),
        "roofline_img_s_chip": ROOFLINE_IMG_S,
        "matmul_bound_img_s": MATMUL_BOUND_IMG_S,
        "frac_of_matmul_bound": round(images_per_sec_per_chip / MATMUL_BOUND_IMG_S, 4),
        "a100_reference_estimate_img_s": "2.6-3.4 (fp32/TF32 eager, BASELINE.md)",
    }))


if __name__ == "__main__":
    import sys

    if "--child" in sys.argv[1:]:
        _measure()
    else:
        main()
