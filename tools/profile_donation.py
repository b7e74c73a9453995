"""Measure what buffer donation buys (VERDICT r2 item 2 / ROADMAP #0).

For the production train steps, compares XLA's compile-time memory analysis
(the relay device exposes no runtime memory_stats) with and without
donate_argnums=0 + pinned out_shardings, then actually RUNS the donated
512px batch-16 Stage-II step — the configuration that OOM'd in round 2.

Run:  PYTHONPATH=.:/root/.axon_site python tools/profile_donation.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from maskbit_tpu.losses.mlm import MLMLossConfig
from maskbit_tpu.models.generator import LFQBert
from maskbit_tpu.train.generator_trainer import (
    init_generator_train_state,
    make_generator_train_step_from_tokens,
)
from maskbit_tpu.train.tokenizer_trainer import make_optimizer

GB = 1024**3


def sync(tree):
    leaf = jax.tree.leaves(tree)[0]
    return float(jnp.sum(jnp.ravel(leaf)[0]))


def mem_report(tag, compiled):
    m = compiled.memory_analysis()
    if m is None:
        print(f"  {tag}: memory_analysis unavailable")
        return None
    args = m.argument_size_in_bytes
    out = m.output_size_in_bytes
    temp = m.temp_size_in_bytes
    alias = m.alias_size_in_bytes
    peak = args + out + temp - alias
    print(
        f"  {tag}: args={args/GB:.2f} out={out/GB:.2f} temp={temp/GB:.2f} "
        f"aliased={alias/GB:.2f} -> live-set {peak/GB:.2f} GB"
    )
    return peak


def stage_two_tokens(res: int, batch: int, run_steps: int = 0, donated_only=False):
    bits = 14
    stride = 16
    n_tok = (res // stride) ** 2
    generator = LFQBert(
        img_size=res, hidden_dim=1024, codebook_size=2**bits, codebook_splits=2,
        depth=24, heads=16, mlp_dim=4096, dropout=0.1, nclass=1000,
        input_stride=stride, dtype=jnp.bfloat16,
    )
    tx = make_optimizer(1e-4)
    state = init_generator_train_state(generator, tx, jax.random.key(0))
    step_fn = make_generator_train_step_from_tokens(
        generator, 2**bits, tx, MLMLossConfig()
    )
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, 2**bits, (batch, n_tok)), jnp.int32
    )
    labels = jnp.asarray(np.arange(batch) % 1000, jnp.int32)
    rng = jax.random.key(2, impl="rbg")

    print(f"Stage-II token step, {res}px (seq {n_tok + 1}), batch {batch}:")
    if not donated_only:
        plain = jax.jit(step_fn).lower(state, tokens, labels, rng).compile()
        mem_report("no donation ", plain)
        del plain
    donated = jax.jit(step_fn, donate_argnums=0)
    compiled = donated.lower(state, tokens, labels, rng).compile()
    mem_report("donate state", compiled)

    if run_steps:
        state, _ = donated(state, tokens, labels, rng)
        sync(state.params)
        t0 = time.perf_counter()
        for _ in range(run_steps):
            state, metrics = donated(state, tokens, labels, rng)
        sync(state.params)
        dt = (time.perf_counter() - t0) / run_steps
        print(
            f"  RAN {run_steps} donated steps: {dt*1e3:.1f} ms/step "
            f"{batch/dt:.1f} img/s/chip  mlm={float(metrics['mlm_loss']):.3f}"
        )
    del state, compiled


def main():
    print(f"devices: {jax.devices()}")
    # flagship 256px batch 32 (the production Stage-II config)
    stage_two_tokens(256, 32, run_steps=4)
    # the round-2 OOM case: 512px batch 16 (and 8 for reference)
    stage_two_tokens(512, 8)
    stage_two_tokens(512, 16, run_steps=4, donated_only=True)


if __name__ == "__main__":
    main()
