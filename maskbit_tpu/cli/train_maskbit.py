"""Stage-II generator training entry point.

Usage (mirrors reference scripts/train_maskbit.py):
    python -m maskbit_tpu.cli.train_maskbit config=configs/generator/maskbit_generator_14bit.yaml

Covers the reference loop (scripts/train_maskbit.py:43-522): frozen Stage-I
tokenizer (loaded from `experiment.vqgan_checkpoint`, .bin or .msgpack),
LFQBert/Bert + EMA + MLM loss + AdamW/LR schedule, resume-latest,
overfit-batch harness, periodic logging / checkpointing / sample viz /
generation eval.
"""

from __future__ import annotations

import itertools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from maskbit_tpu.cli.common import (
    ProfilerHook,
    StepTimer,
    build_dataloaders,
    resolve_compute_dtype,
    setup_experiment,
    validate_generator_config,
)
from maskbit_tpu.core.checkpoint import CheckpointManager, load_pretrained, save_pretrained
from maskbit_tpu.core.config import config_from_cli
from maskbit_tpu.losses.mlm import MLMLossConfig
from maskbit_tpu.models.generator import make_generator
from maskbit_tpu.models.tokenizer import ConvVQModel
from maskbit_tpu.parallel.mesh import global_batch_array, is_main_process
from maskbit_tpu.sampling.sample import SamplingConfig, make_sampler
from maskbit_tpu.train.generator_trainer import (
    init_generator_train_state,
    make_generator_train_step,
    make_generator_train_step_from_tokens,
)
from maskbit_tpu.train.tokenizer_trainer import make_optimizer
from maskbit_tpu.utils.lr_schedules import get_schedule
from maskbit_tpu.utils.viz import make_viz_generated_stage_two, make_viz_reconstructed_stage_two


def main(argv=None):
    config = config_from_cli(argv if argv is not None else sys.argv[1:])
    validate_generator_config(config)
    ctx = setup_experiment(config)
    logger, tracker, mesh = ctx["logger"], ctx["tracker"], ctx["mesh"]
    output_dir = ctx["output_dir"]
    num_devices = jax.device_count()

    dtype = resolve_compute_dtype(config)
    vq_cfg = config.model.vq_model
    mlm_cfg = config.model.mlm_model

    tokenizer = ConvVQModel.from_config(vq_cfg, dtype=dtype)
    generator = make_generator(
        mlm_cfg.get("model_cls", "lfq_bert"), mlm_cfg, vq_cfg, dtype=dtype
    )
    mlm_loss_cfg = MLMLossConfig.from_config(config.select("losses.mlm", {}))

    # frozen Stage-I weights (reference :104-106)
    vqgan_ckpt = config.select("experiment.vqgan_checkpoint", "")
    resolution = config.select("dataset.preprocessing.resolution", 256)
    if vqgan_ckpt and os.path.exists(vqgan_ckpt):
        tokenizer_vars = load_pretrained(vqgan_ckpt)
        logger.info(f"loaded frozen tokenizer from {vqgan_ckpt}")
    else:
        logger.warning(
            f"vqgan_checkpoint {vqgan_ckpt!r} not found — initializing a RANDOM "
            "frozen tokenizer (smoke-test mode only)."
        )
        tokenizer_vars = tokenizer.init(
            jax.random.key(0), jnp.zeros((1, resolution, resolution, 3))
        )

    opt = config.optimizer.params
    tx = make_optimizer(
        get_schedule(
            config.select("lr_scheduler.scheduler", "constant"),
            opt.get("learning_rate", 1e-4),
            num_warmup_steps=config.select("lr_scheduler.params.warmup_steps", 5000),
            num_training_steps=config.select("training.max_train_steps", 1_000_000),
            minimum_rate=config.select("lr_scheduler.params.minimum_rate", 0.1),
        ),
        beta1=opt.get("beta1", 0.9),
        beta2=opt.get("beta2", 0.96),
        weight_decay=opt.get("weight_decay", 0.045),
        epsilon=opt.get("epsilon", 1e-8),
        max_grad_norm=config.select("training.max_grad_norm", 1.0),
        gradient_accumulation_steps=config.select("training.gradient_accumulation_steps", 1),
    )

    per_device_batch = config.select("training.per_device_batch_size", 32)
    global_batch = per_device_batch * num_devices

    with mesh:
        state = init_generator_train_state(
            generator, tx, jax.random.key(ctx["seed"]),
            use_ema=config.select("training.use_ema", True),
        )
        max_steps = config.select("training.max_train_steps", 1_000_000)
        log_grad_norm_every = config.select("experiment.log_grad_norm_every", 0)
        token_shards = config.select("dataset.params.token_shards_path_or_url", "")
        step_kwargs = dict(
            mask_schedule=mlm_cfg.get("train_mask_schedule_strategy", "arccos"),
            class_label_dropout=mlm_cfg.get("class_label_dropout", 0.1),
            ema_kwargs={"decay": 0.9999},
            log_param_grad_norms=0 < log_grad_norm_every <= max_steps,
        )
        from maskbit_tpu.utils.params import summarize_params

        logger.info(summarize_params(state.params, "generator"))
        # place the state on the mesh: params/opt/EMA follow the partition
        # rules (replicated under pure DP; sharded under fsdp/tensor axes)
        from maskbit_tpu.parallel.mesh import shard_train_state

        state = shard_train_state(state, mesh)

        # donate_argnums=0 on both variants: alias the old train state into
        # the new one instead of holding both (~10 GB at flagship Stage-II);
        # out_shardings pins the new state to the input placement so the
        # aliasing holds and the sharding doesn't drift after step 1.
        # ckpt.save's device->host copy is eager, so no reader can observe a
        # donated buffer.
        state_shardings = jax.tree.map(lambda x: x.sharding, state)
        donate_kwargs = dict(donate_argnums=0, out_shardings=(state_shardings, None))
        if token_shards:
            logger.info(f"training from pre-tokenized shards {token_shards}")
            train_step = jax.jit(
                make_generator_train_step_from_tokens(
                    generator, vq_cfg.get("codebook_size", 1024), tx, mlm_loss_cfg,
                    **step_kwargs,
                ),
                **donate_kwargs,
            )
        else:
            train_step = jax.jit(
                make_generator_train_step(generator, tokenizer, tx, mlm_loss_cfg,
                                          **step_kwargs),
                **donate_kwargs,
            )

        ckpt = CheckpointManager(os.path.join(output_dir, "checkpoints"), max_to_keep=3)
        global_step = 0
        if config.select("experiment.resume", True):
            # pod-resume: the template carries each leaf's NamedSharding, so
            # every host restores only its shards, already placed
            template = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
                state,
            )
            restored = ckpt.restore_latest(template)
            if restored is not None:
                state, global_step = restored
                # reference resume opt-outs (train_maskbit.py:313-332)
                if not config.select("experiment.resume_lr_scheduler", True):
                    from maskbit_tpu.cli.common import reset_optimizer_counts

                    state = state._replace(opt=reset_optimizer_counts(state.opt))
                    logger.info("LR schedule position reset on resume")
                if config.select("experiment.dont_resume_optimizer", False):
                    state = state._replace(opt=tx.init(state.params))
                    logger.info("optimizer state reset on resume")
                logger.info(f"resumed from step {global_step}")

        if token_shards:
            from maskbit_tpu.data.token_shards import TokenShardDataset

            token_dataset = TokenShardDataset(
                token_shards, resample=True, seed=ctx["seed"],
                process_index=jax.process_index(), process_count=jax.process_count(),
            )
            train_iter = token_dataset.batches(global_batch // jax.process_count())
        else:
            make_train, _, _ = build_dataloaders(config, logger, global_batch)
            train_iter = make_train()
        if config.select("training.overfit_batch", False):
            n = config.select("training.overfit_batch_num", 1)
            train_iter = itertools.cycle([next(train_iter) for _ in range(n)])
            logger.info(f"overfitting on {n} cached batch(es)")

        sampling_cfg = SamplingConfig.from_config(mlm_cfg, vq_cfg)
        sampler = make_sampler(generator, tokenizer, sampling_cfg, jit=True)

        log_every = config.select("experiment.log_every", 50)
        save_every = config.select("experiment.save_every", 100_000)
        eval_every = config.select("experiment.eval_every", 100_000)
        generate_every = config.select("experiment.generate_every", 10_000)
        num_gen = config.select("training.num_generated_images", 4)
        timer = StepTimer()
        last_saved = -1
        profiler = ProfilerHook(output_dir, config.select("experiment.profile_steps", ""))
        # rbg: the TPU hardware PRNG. threefry dropout-mask generation costs
        # ~60 ms/step on the 24-layer generator (BENCHMARKS.md round 2);
        # rbg generates in hardware at no measurable cost. EXCEPT under
        # remat: rbg bits are not recomputable, so XLA must SAVE every
        # dropout mask — at 512px that is ~4.6 GB of pred[b,h,n,n] buffers,
        # exactly what remat is meant to free. Counter-based threefry
        # recomputes masks bit-exactly in the backward pass.
        remat_on = bool(mlm_cfg.get("remat", False))
        prng_impl = config.select(
            "training.prng_impl", "threefry2x32" if remat_on else "rbg"
        )
        if remat_on and prng_impl == "rbg":
            logger.warning(
                "training.prng_impl=rbg with model.mlm_model.remat=true: rbg "
                "random bits cannot be rematerialized — dropout masks stay "
                "resident and remat frees far less memory"
            )
        rng_step = jax.random.key(ctx["seed"] + 1, impl=prng_impl)
        from maskbit_tpu.cli.common import GracefulShutdown

        shutdown = GracefulShutdown(logger)
        while global_step < max_steps:
            batch = next(train_iter)
            timer.data_tick()
            profiler.step(global_step)
            labels = global_batch_array(batch["class_id"], mesh)
            rng_step, sub = jax.random.split(rng_step)
            if token_shards:
                tokens = global_batch_array(batch["tokens"], mesh)
                state, metrics = train_step(state, tokens, labels, sub)
            else:
                images = global_batch_array(batch["image"], mesh)
                state, metrics = train_step(state, tokenizer_vars, images, labels, sub)
            global_step += 1
            timer.batch_tick()

            if shutdown.should_stop(global_step):
                # preemption (any host): fall through to the final save —
                # the decision is global so the collective save can't hang
                logger.warning(f"preemption: stopping cleanly at step {global_step}")
                break

            viz_payload = {k: metrics[k] for k in list(metrics) if k.startswith("_")}
            metrics = {k: v for k, v in metrics.items() if not k.startswith("_")}

            if log_grad_norm_every and global_step % log_grad_norm_every == 0:
                norms = {k: float(v) for k, v in jax.device_get(metrics).items()
                         if k.startswith("grad_norm/")}
                tracker.log(norms, global_step)

            if global_step % log_every == 0:
                metrics = {k: float(v) for k, v in jax.device_get(metrics).items()
                           if not k.startswith("grad_norm/")}
                samples_per_sec = global_batch / max(timer.batch_time.avg, 1e-9)
                metrics["perf/samples_per_sec_per_device"] = samples_per_sec / num_devices
                tracker.log(metrics, global_step)
                logger.info(
                    f"step {global_step}: mlm={metrics['mlm_loss']:.4f} "
                    f"masked_acc={metrics['masked_correct_tokens']:.4f} "
                    f"{samples_per_sec / num_devices:.1f} samples/s/dev"
                )

            if global_step % generate_every == 0:
                # split on EVERY host (keeps the per-host rng streams in
                # lockstep) and gather the EMA params + viz tokens — a
                # collective when fsdp/tensor span processes, where reading
                # them from main-only host code would crash/deadlock
                from maskbit_tpu.parallel.mesh import (
                    host_accessible,
                    host_local_mesh,
                )

                rng_step, sub = jax.random.split(rng_step)
                eval_params = host_accessible(_eval_params(state))
                viz_payload = host_accessible(viz_payload)
                if is_main_process():
                    # host_local_mesh: this is a main-only host-local call —
                    # the Pallas kernels must not self-partition over a mesh
                    # that spans other processes
                    with host_local_mesh():
                        gen_images, _ = sampler(
                            {"params": eval_params}, tokenizer_vars, sub,
                            jnp.asarray(batch["class_id"][:num_gen]),
                        )
                    _, grid = make_viz_generated_stage_two(np.asarray(jnp.clip(gen_images, 0, 1)))
                    tracker.log_image("train/generated", grid, global_step)

                    # decode ground-truth vs argmax-predicted tokens
                    # (reference reconstructed_and_predicted_images :602-646)
                    _log_decoded_pair(
                        tokenizer, tokenizer_vars, viz_payload, vq_cfg, mlm_cfg,
                        num_gen, tracker, global_step,
                    )

            if global_step % save_every == 0:
                _save(ckpt, state, output_dir, global_step, logger)
                last_saved = global_step

            if global_step % eval_every == 0:
                from maskbit_tpu.parallel.mesh import (
                    host_accessible,
                    host_local_mesh,
                )

                # each host samples its 1/N share of the batches (the
                # reference's eval_generation, train_maskbit.py:556-600, is
                # per-rank redundant — every rank scores the same images);
                # the sampling itself is host-local, so keep the kernels off
                # the cross-process mesh, then merge the f64 moments
                eval_vars = {"params": host_accessible(_eval_params(state))}
                # fold off a dedicated key: _eval_generation chains splits
                # internally, and handing it rng_step itself would replay the
                # train loop's future rng_step/sub draws (split-prefix
                # property), correlating eval rng with later-step mask rng
                eval_key = jax.random.fold_in(rng_step, 0x5EED)
                with host_local_mesh():
                    gen_evaluator = _eval_generation(
                        config, sampler, eval_vars,
                        tokenizer_vars, eval_key, logger,
                    )
                results = {}
                if gen_evaluator is not None:
                    # collective; _eval_generation has already verified every
                    # host agrees on the weights/stats gates (a disagreement
                    # raises there instead of deadlocking here); runs
                    # OUTSIDE the host-local mesh context
                    gen_evaluator.merge_across_hosts()
                    results = gen_evaluator.result()
                if results:
                    tracker.log({f"eval/{k}": v for k, v in results.items()}, global_step)
                    logger.info(f"eval @ {global_step}: {results}")

        if global_step != last_saved:  # avoid a duplicate save at exit
            _save(ckpt, state, output_dir, global_step, logger)
        ckpt.wait()  # commit the final async save before exit
        profiler.close()
        tracker.close()


def _eval_params(state):
    return state.ema.params if state.ema is not None else state.params


def _log_decoded_pair(tokenizer, tokenizer_vars, viz_payload, vq_cfg, mlm_cfg,
                      num_gen, tracker, global_step):
    """Ground-truth vs predicted token decodes (reference :602-646)."""
    from maskbit_tpu.ops.bitops import combine_factorized_tokens

    if "_input_tokens" not in viz_payload:
        return
    codebook_size = vq_cfg.get("codebook_size", 1024)
    splits = mlm_cfg.get("codebook_splits", 1)
    gt = combine_factorized_tokens(
        viz_payload["_input_tokens"][:num_gen], codebook_size, splits)
    pred = combine_factorized_tokens(
        viz_payload["_predicted_tokens"][:num_gen], codebook_size, splits)
    recon = tokenizer.apply(tokenizer_vars, gt, method="decode_tokens")
    predicted = tokenizer.apply(tokenizer_vars, pred, method="decode_tokens")
    _, grid = make_viz_reconstructed_stage_two(
        np.asarray(jnp.clip(recon, 0, 1)), np.asarray(jnp.clip(predicted, 0, 1))
    )
    tracker.log_image("train/decoded", grid, global_step)


def _eval_generation(config, sampler, gen_vars, tok_vars, rng, logger,
                     num_samples: int | None = None,
                     batch_size: int | None = None):
    """In-training generation eval (reference eval_generation :556-600):
    IS (+ FID vs eval.stats_path) over a few thousand EMA samples.
    Skipped (returns None) unless MASKBIT_INCEPTION_WEIGHTS is available.
    Sizing is config-driven (`eval.num_generation_samples`,
    `eval.generation_batch_size`, matching the reference's config-sized
    eval_dataloader) unless the caller overrides it explicitly.

    Sharded across hosts: the rng chain advances identically on every host
    but host h only samples batches with i % nproc == h, so a pod scores
    the SAME global sample set as a single host at 1/N the work (the
    reference is per-rank redundant here). Returns the per-host evaluator;
    the caller must run `merge_across_hosts()` (a collective) on every host
    before reading `result()`."""
    from maskbit_tpu.cli.eval_tokenizer import make_inception_fn
    from maskbit_tpu.eval.fid import load_stats_npz
    from maskbit_tpu.eval.streaming import GeneratorEvaluator
    from maskbit_tpu.parallel.mesh import assert_host_agreement

    if num_samples is None:
        num_samples = config.select("eval.num_generation_samples", 2000)
    if batch_size is None:
        batch_size = config.select("eval.generation_batch_size", 50)
    inception_fn = make_inception_fn()
    stats_path = config.select("eval.stats_path", "")
    has_stats = bool(stats_path and os.path.exists(stats_path))
    # both gates are PER-HOST facts (an env-pointed weights file, a stats
    # .npz on local disk). They decide whether this host later enters the
    # merge collectives, so a pod where one host disagrees must fail loudly
    # HERE rather than deadlock the others in process_allgather
    assert_host_agreement(
        {"inception weights found": inception_fn is not None,
         "eval.stats_path found": has_stats},
        context="in-train generation eval",
    )
    if inception_fn is None:
        logger.info("in-training generation eval skipped (no inception weights); "
                    "run cli.eval_maskbit for the full 50k ADM gFID")
        return None
    real_mu = real_sigma = None
    if has_stats:
        real_mu, real_sigma = load_stats_npz(stats_path)
    evaluator = GeneratorEvaluator(inception_fn, real_mu, real_sigma)
    key = rng
    nproc, pid = jax.process_count(), jax.process_index()
    for i in range(num_samples // batch_size):
        key, sub_labels, sub = jax.random.split(key, 3)
        if i % nproc != pid:
            continue  # another host's share; the key chain stays aligned
        labels = jax.random.randint(sub_labels, (batch_size,), 0, 1000)
        images, _ = sampler(gen_vars, tok_vars, sub, labels)
        evaluator.update(jnp.clip(images, 0.0, 1.0))
    return evaluator


def _save(ckpt, state, output_dir, step, logger):
    from maskbit_tpu.parallel.mesh import host_accessible

    # async: device->host copy now, disk write overlaps with training
    ckpt.save(step, state)
    # gather cross-host-sharded params for the host-side msgpack export
    # (collective, so it runs on EVERY host; pass-through on a single host)
    params = host_accessible(state.params)
    ema_params = host_accessible(state.ema.params) if state.ema is not None else None
    if is_main_process():
        save_pretrained(jax.device_get(params),
                        os.path.join(output_dir, f"model-{step}.msgpack"))
        if ema_params is not None:
            save_pretrained(jax.device_get(ema_params),
                            os.path.join(output_dir, f"ema_model-{step}.msgpack"))
    logger.info(f"saved checkpoint @ step {step}")


if __name__ == "__main__":
    main()
