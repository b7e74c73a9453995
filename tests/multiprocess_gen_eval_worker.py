"""Worker: sharded in-train generation eval under multi-process jax.distributed.

VERDICT r3 #5: `cli/train_maskbit._eval_generation` must not redo the same
2000 samples on every host (the reference's eval_generation,
train_maskbit.py:556-600, is per-rank redundant). Each host samples its
i % nproc == pid share with an identically-advanced rng chain, moments merge
via GeneratorEvaluator.merge_across_hosts, and the merged result must equal
a single-host run over ALL batches.
"""

import json
import logging
import os
import sys


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    workspace = sys.argv[4]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc

    import jax.numpy as jnp
    import numpy as np

    import maskbit_tpu.cli.eval_tokenizer as et
    from maskbit_tpu.cli.train_maskbit import _eval_generation
    from maskbit_tpu.core.config import Config
    from maskbit_tpu.eval.fid import load_stats_npz
    from maskbit_tpu.eval.streaming import GeneratorEvaluator
    from maskbit_tpu.parallel.mesh import warmup_collective_rendezvous

    # form the Gloo cliques while skew is import-bounded (30 s hard window)
    warmup_collective_rendezvous()

    # deterministic stub inception: drives the full IS + FID moment path
    proj = np.asarray(np.random.default_rng(0).normal(size=(3, 2048)), np.float32)

    def stub_inception_fn():
        def fn(images_255):
            pooled = jnp.mean(images_255 / 255.0, axis=(1, 2))
            feats = pooled @ jnp.asarray(proj)
            return {"2048": feats, "logits_unbiased": feats[:, :1008]}

        return fn

    et.make_inception_fn = stub_inception_fn

    # deterministic stub sampler: images are a pure function of (key, labels),
    # so every host agrees on what batch i would contain
    calls = []

    def make_sampler(counting: bool):
        def sampler(gen_vars, tok_vars, key, labels):
            if counting:
                calls.append(np.asarray(labels))
            base = jax.random.uniform(key, (labels.shape[0], 8, 8, 3))
            mod = (labels[:, None, None, None] % 7 + 1).astype(jnp.float32) / 8.0
            return base * mod, None

        return sampler

    # identical-by-seed real stats on every host (written per-pid: no race)
    acts = np.random.default_rng(1).normal(size=(64, 2048))
    stats = os.path.join(workspace, f"stats_{pid}.npz")
    np.savez(stats, mu=acts.mean(0), sigma=np.cov(acts, rowvar=False))

    config = Config({"eval": {"stats_path": stats}})
    logger = logging.getLogger("gen_eval_worker")

    NUM, BS = 8, 2
    evaluator = _eval_generation(
        config, make_sampler(True), {"params": {}}, {}, jax.random.key(42),
        logger, num_samples=NUM, batch_size=BS,
    )
    assert evaluator is not None
    local_batches = len(calls)
    evaluator.merge_across_hosts()
    results = {k: float(v) for k, v in evaluator.result().items()}

    # single-host expected: the same chain over ALL batches, no sharding
    mu, sigma = load_stats_npz(stats)
    expected_eval = GeneratorEvaluator(stub_inception_fn(), mu, sigma)
    sampler = make_sampler(False)
    key = jax.random.key(42)
    for _ in range(NUM // BS):
        key, sub_labels, sub = jax.random.split(key, 3)
        labels = jax.random.randint(sub_labels, (BS,), 0, 1000)
        images, _ = sampler(None, None, sub, labels)
        expected_eval.update(jnp.clip(images, 0.0, 1.0))
    expected = {k: float(v) for k, v in expected_eval.result().items()}

    with open(os.path.join(workspace, f"gen_eval_result_{pid}.json"), "w") as f:
        json.dump({"pid": pid, "local_batches": local_batches,
                   "results": results, "expected": expected}, f)
    print(f"gen eval worker {pid}: done", flush=True)


if __name__ == "__main__":
    main()
