"""Stage-I tokenizer training entry point.

Usage (mirrors the reference CLI, scripts/train_tokenizer.py / README):
    python -m maskbit_tpu.cli.train_tokenizer config=configs/tokenizer/maskbit_tokenizer_12bit.yaml \
        experiment.name=my_run training.per_device_batch_size=16

Covers the full reference loop (scripts/train_tokenizer.py:41-661): model +
EMA + VQGAN loss + twin AdamW/LR schedules, resume-latest, overfit-batch
harness, periodic logging / checkpointing / reconstruction viz / streaming
eval. Distribution is a jit over the device mesh (batch sharded on `data`).
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from maskbit_tpu.cli.common import (
    ProfilerHook,
    StepTimer,
    build_dataloaders,
    build_perceptual,
    resolve_compute_dtype,
    setup_experiment,
)
from maskbit_tpu.core.checkpoint import CheckpointManager, save_pretrained
from maskbit_tpu.core.config import config_from_cli
from maskbit_tpu.losses.vqgan import VQGANLossConfig
from maskbit_tpu.models.tokenizer import ConvVQModel
from maskbit_tpu.nn.discriminator import create_discriminator
from maskbit_tpu.parallel.mesh import global_batch_array, is_main_process
from maskbit_tpu.train.tokenizer_trainer import (
    init_tokenizer_train_state,
    make_optimizer,
    make_tokenizer_train_step,
)
from maskbit_tpu.utils.lr_schedules import get_schedule
from maskbit_tpu.utils.viz import make_viz_from_samples


def build_optimizers(config, num_devices: int):
    opt = config.optimizer.params
    lr = opt.get("learning_rate", 1e-4)
    disc_lr = opt.get("discriminator_learning_rate", lr)
    if opt.get("scale_lr", False):
        # reference scales by total batch size (train_tokenizer.py:151-163)
        scale = (
            config.select("training.per_device_batch_size", 16)
            * num_devices
            * config.select("training.gradient_accumulation_steps", 1)
        )
        lr, disc_lr = lr * scale, disc_lr * scale

    max_steps = config.select("training.max_train_steps", 1_000_000)
    sched_kwargs = dict(
        num_warmup_steps=config.select("lr_scheduler.params.warmup_steps", 5000),
        num_training_steps=max_steps,
        minimum_rate=config.select("lr_scheduler.params.minimum_rate", 0.1),
    )
    sched_name = config.select("lr_scheduler.scheduler", "constant")
    common = dict(
        beta1=opt.get("beta1", 0.9),
        beta2=opt.get("beta2", 0.999),
        weight_decay=opt.get("weight_decay", 1e-4),
        epsilon=opt.get("epsilon", 1e-8),
        max_grad_norm=config.select("training.max_grad_norm", 1.0),
        gradient_accumulation_steps=config.select("training.gradient_accumulation_steps", 1),
    )
    gen_tx = make_optimizer(get_schedule(sched_name, lr, **sched_kwargs), **common)
    # the disc optimizer only steps once the discriminator is live, so its
    # schedule spans max_steps - discriminator_start (reference :196-207)
    disc_sched_kwargs = dict(
        sched_kwargs,
        num_training_steps=max(1, max_steps - config.select("losses.discriminator_start", 0)),
    )
    disc_tx = make_optimizer(get_schedule(sched_name, disc_lr, **disc_sched_kwargs), **common)

    if config.select("model.vq_model.finetune_decoder", False):
        # decoder-finetune mode: the encoder/quantizer are frozen
        # (stop_gradient in the model), but AdamW weight decay would still
        # shrink them — mask the optimizer to the decoder subtree.
        import optax

        def decoder_only_mask(params):
            return {k: jax.tree.map(lambda _: k == "decoder", v)
                    for k, v in params.items()}

        gen_tx = optax.masked(gen_tx, decoder_only_mask)
    return gen_tx, disc_tx


def main(argv=None):
    config = config_from_cli(argv if argv is not None else sys.argv[1:])
    ctx = setup_experiment(config)
    logger, tracker, mesh = ctx["logger"], ctx["tracker"], ctx["mesh"]
    output_dir = ctx["output_dir"]
    num_devices = jax.device_count()
    logger.info(f"devices={num_devices} mesh={dict(mesh.shape)}")

    dtype = resolve_compute_dtype(config)
    model = ConvVQModel.from_config(config.model.vq_model, dtype=dtype)
    discriminator = create_discriminator(config.model.discriminator, dtype=dtype)
    loss_cfg = VQGANLossConfig.from_config(config.losses)
    perceptual_apply, perceptual_vars = build_perceptual(config, logger)
    if perceptual_apply is None and loss_cfg.perceptual_weight > 0:
        loss_cfg = loss_cfg._replace(perceptual_loss="none", perceptual_weight=0.0)

    gen_tx, disc_tx = build_optimizers(config, num_devices)

    resolution = config.select("dataset.preprocessing.resolution", 256)
    per_device_batch = config.select("training.per_device_batch_size", 16)
    global_batch = per_device_batch * num_devices
    image_shape = (global_batch // jax.process_count(), resolution, resolution, 3)

    rng = jax.random.key(ctx["seed"])
    with mesh:
        state = init_tokenizer_train_state(
            model, discriminator, gen_tx, disc_tx, rng, image_shape,
            use_ema=config.select("training.use_ema", True),
        )
        max_steps = config.select("training.max_train_steps", 1_000_000)
        log_grad_norm_every = config.select("experiment.log_grad_norm_every", 0)
        from maskbit_tpu.utils.params import summarize_params

        logger.info(summarize_params(state.gen_params, "tokenizer"))
        logger.info(summarize_params(state.disc_params, "discriminator"))
        # warm-start from a bare weights file (reference experiment.init_checkpoint)
        init_ckpt = config.select("experiment.init_checkpoint", "")
        if init_ckpt and os.path.exists(init_ckpt):
            from maskbit_tpu.core.checkpoint import load_pretrained
            from maskbit_tpu.core.ema import init_ema

            loaded = load_pretrained(init_ckpt)
            gen_params = loaded.get("params", loaded)
            state = state._replace(
                gen_params=gen_params,
                ema=init_ema(gen_params) if state.ema is not None else None,
            )
            logger.info(f"initialized weights from {init_ckpt}")

        # place the state on the mesh: params/opt/EMA follow the partition
        # rules (replicated under pure DP; sharded under fsdp/tensor axes)
        from maskbit_tpu.parallel.mesh import shard_train_state

        state = shard_train_state(state, mesh)

        # donate_argnums=0: the old train state's buffers are reused for the
        # new state — without it every step holds old+new params+opt+EMA
        # simultaneously (~2x state HBM; the 512px/b16 OOM of ROADMAP #0).
        # out_shardings pins the new state to the input placement: otherwise
        # GSPMD may pick different output shardings, which both defeats the
        # aliasing AND makes the state's sharding drift after step 1.
        # Safe: ckpt.save copies device->host eagerly (async is disk-only)
        # and all other readers (viz/eval/save) fetch before the next step.
        state_shardings = jax.tree.map(lambda x: x.sharding, state)
        train_step = jax.jit(
            make_tokenizer_train_step(
                model, discriminator, gen_tx, disc_tx, loss_cfg,
                perceptual_apply=perceptual_apply,
                ema_kwargs={"decay": 0.999},
                log_param_grad_norms=0 < log_grad_norm_every <= max_steps,
            ),
            donate_argnums=0,
            out_shardings=(state_shardings, None),
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
                if not config.select("experiment.resume_lr_scheduler", True):
                    # reference opt-out (train_tokenizer.py:308-329): keep
                    # the optimizer but restart the LR schedule position
                    from maskbit_tpu.cli.common import reset_optimizer_counts

                    state = state._replace(
                        gen_opt=reset_optimizer_counts(state.gen_opt),
                        disc_opt=reset_optimizer_counts(state.disc_opt),
                    )
                    logger.info("LR schedule position reset on resume")
                if config.select("experiment.dont_resume_optimizer", False):
                    # reference opt-out (train_tokenizer.py:308-329): fresh
                    # optimizer (and thus LR schedule position)
                    state = state._replace(
                        gen_opt=gen_tx.init(state.gen_params),
                        disc_opt=disc_tx.init(state.disc_params),
                    )
                    logger.info("optimizer state reset on resume")
                logger.info(f"resumed from step {global_step}")

        make_train, make_eval, _ = build_dataloaders(config, logger, global_batch)
        train_iter = make_train()

        # overfit-batch harness (reference :265-273)
        overfit = config.select("training.overfit_batch", False)
        if overfit:
            n = config.select("training.overfit_batch_num", 1)
            cached = [next(train_iter) for _ in range(n)]
            import itertools

            train_iter = itertools.cycle(cached)
            logger.info(f"overfitting on {n} cached batch(es)")

        log_every = config.select("experiment.log_every", 50)
        save_every = config.select("experiment.save_every", 20_000)
        eval_every = config.select("experiment.eval_every", 20_000)
        generate_every = config.select("experiment.generate_every", 2000)
        timer = StepTimer()
        last_saved = -1
        profiler = ProfilerHook(output_dir, config.select("experiment.profile_steps", ""))
        # rbg: the TPU hardware PRNG. threefry dropout-mask generation costs
        # ~60 ms/step on the 24-layer generator (BENCHMARKS.md round 2);
        # rbg generates in hardware at no measurable cost.
        rng_step = jax.random.key(
            ctx["seed"] + 1, impl=config.select("training.prng_impl", "rbg")
        )
        from maskbit_tpu.cli.common import GracefulShutdown

        shutdown = GracefulShutdown(logger)
        while global_step < max_steps:
            batch = next(train_iter)
            timer.data_tick()
            profiler.step(global_step)
            images = global_batch_array(batch["image"], mesh)
            rng_step, sub = jax.random.split(rng_step)
            state, metrics = train_step(state, images, perceptual_vars, sub)
            global_step += 1
            timer.batch_tick()

            if shutdown.should_stop(global_step):
                # preemption (any host): fall through to the final save —
                # the decision is global so the collective save can't hang
                logger.warning(f"preemption: stopping cleanly at step {global_step}")
                break

            if log_grad_norm_every and global_step % log_grad_norm_every == 0:
                norms = {k: float(v) for k, v in jax.device_get(metrics).items()
                         if k.startswith("grad_norm/")}
                tracker.log(norms, global_step)

            if global_step % log_every == 0:
                metrics = {k: float(v) for k, v in jax.device_get(metrics).items()
                           if not k.startswith("grad_norm/")}
                samples_per_sec = global_batch / max(timer.batch_time.avg, 1e-9)
                metrics.update({
                    "perf/samples_per_sec_per_device": samples_per_sec / num_devices,
                    "perf/batch_time": timer.batch_time.avg,
                    "perf/data_time": timer.data_time.avg,
                })
                tracker.log(metrics, global_step)
                logger.info(
                    f"step {global_step}: total={metrics.get('total_loss', 0):.4f} "
                    f"recon={metrics.get('reconstruction_loss', 0):.4f} "
                    f"{samples_per_sec / num_devices:.1f} samples/s/dev"
                )

            if global_step % generate_every == 0:
                # all hosts enter (the param gather inside is collective
                # when fsdp/tensor span processes); only main logs
                _log_reconstructions(model, state, batch, tracker, global_step,
                                     config.select("training.num_generated_images", 2))

            if global_step % save_every == 0:
                _save(ckpt, state, model, output_dir, global_step, logger)
                last_saved = global_step

            if global_step % eval_every == 0:
                results = _eval_reconstruction(model, state, make_eval(), config)
                tracker.log({f"eval/{k}": v for k, v in results.items()}, global_step)
                logger.info(f"eval @ {global_step}: {results}")

        if global_step != last_saved:  # avoid a duplicate save at exit
            _save(ckpt, state, model, output_dir, global_step, logger)
        ckpt.wait()  # commit the final async save before exit
        profiler.close()
        tracker.close()


def _eval_params(state):
    return state.ema.params if state.ema is not None else state.gen_params


def _save(ckpt, state, model, output_dir, step, logger):
    from maskbit_tpu.parallel.mesh import host_accessible

    # async: device->host copy now, disk write overlaps with training
    ckpt.save(step, state)
    # the msgpack export reads params from host code: when fsdp/tensor span
    # processes the leaves aren't fully addressable and device_get would
    # raise — gather them (collective, so it runs on EVERY host) first
    gen_params = host_accessible(state.gen_params)
    ema_params = host_accessible(state.ema.params) if state.ema is not None else None
    if is_main_process():
        save_pretrained(
            jax.device_get(gen_params),
            os.path.join(output_dir, f"model-{step}.msgpack"),
        )
        if ema_params is not None:
            save_pretrained(
                jax.device_get(ema_params),
                os.path.join(output_dir, f"ema_model-{step}.msgpack"),
            )
    logger.info(f"saved checkpoint @ step {step}")


def _log_reconstructions(model, state, batch, tracker, step, num_images):
    from maskbit_tpu.parallel.mesh import host_accessible

    # collective when params are cross-host-sharded: all hosts call this
    params = host_accessible(_eval_params(state))
    if not is_main_process():
        return
    images = np.asarray(batch["image"][:num_images])
    recons, _ = model.apply({"params": params}, images)
    recons = jnp.clip(recons, 0.0, 1.0)
    _, grid = make_viz_from_samples(images, np.asarray(recons))
    tracker.log_image("train/reconstructions", grid, step)


def _eval_reconstruction(model, state, eval_loader, config,
                         max_batches: int | None = None):
    """In-training streaming eval (reference eval_reconstruction :553-575).

    Each host evaluates its own eval-shard split, then the accumulators are
    summed across hosts (merge_across_hosts, a collective every host runs at
    the same global step) — the logged metrics cover the WHOLE evaluated set,
    not just host 0's slice, and codebook usage is the global union. The
    per-host batch cap comes from `eval.max_eval_batches` (0 = the full eval
    split, the reference's behavior with a config-sized eval_dataloader)."""
    from maskbit_tpu.eval.streaming import TokenizerEvaluator
    from maskbit_tpu.parallel.mesh import host_accessible, host_local_mesh

    if max_batches is None:
        max_batches = config.select("eval.max_eval_batches", 50)
    evaluator = TokenizerEvaluator(
        enable_psnr_score=True, enable_ssim_score=True,
        enable_mse_error=True, enable_mae_error=True,
        enable_codebook_usage_measure=True, enable_codebook_entropy_measure=True,
        num_codebook_entries=config.select("model.vq_model.codebook_size", 1024),
    )
    # gather cross-host-sharded params (collective; pass-through otherwise)
    # so each host evaluates its shard split with purely local compute
    params = {"params": host_accessible(_eval_params(state))}
    apply_fn = jax.jit(lambda v, x: model.apply(v, x))
    # host_local_mesh: each host's eval compute is HOST-LOCAL (it scores its
    # own shard split) — inside the training `with mesh:` block the decoder's
    # constrain_batch would otherwise turn this jit into a cross-process
    # GSPMD program whose outputs span non-addressable devices
    with host_local_mesh():
        for i, batch in enumerate(eval_loader):
            if max_batches and i >= max_batches:
                break
            images = jnp.asarray(batch["image"])
            recons, result = apply_fn(params, images)
            evaluator.update(
                images, jnp.clip(recons, 0.0, 1.0),
                codebook_indices=result["min_encoding_indices"],
            )
    # the merge is a cross-host collective: OUTSIDE the host-local context
    evaluator.merge_across_hosts()
    return evaluator.result()


if __name__ == "__main__":
    main()
