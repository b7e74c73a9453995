"""End-to-end CLI smoke tests: tiny configs, synthetic data, few steps."""

import json
import os

import pytest
import yaml


def _write_config(tmp_path, tree, name="cfg.yaml"):
    path = tmp_path / name
    path.write_text(yaml.safe_dump(tree))
    return str(path)


TINY_VQ = {
    "model_class": "vqgan+", "quantizer_type": "lookup-free",
    "codebook_size": 16, "token_size": 4, "commitment_cost": 0.25,
    "entropy_loss_weight": 0.01, "entropy_loss_temperature": 0.01,
    "entropy_gamma": 1.0, "num_channels": 3, "hidden_channels": 32,
    "channel_mult": [1, 2], "num_resolutions": 2, "num_res_blocks": 1,
    "sample_with_conv": True,
}

DATASET = {
    "params": {"train_shards_path_or_url": "/nonexistent/{0000..0001}.tar",
               "eval_shards_path_or_url": "/nonexistent/{0000..0001}.tar"},
    "preprocessing": {"resolution": 32, "use_aspect_ratio_aug": False,
                      "use_random_crop": False, "min_scale": 0.8,
                      "interpolation": "bilinear"},
}


def test_train_tokenizer_cli(tmp_path, monkeypatch):
    from maskbit_tpu.cli.train_tokenizer import main

    cfg = {
        "experiment": {"name": "smoke_tok", "max_train_examples": 64,
                       "save_every": 100, "eval_every": 2, "generate_every": 2,
                       "log_every": 1, "logger": "jsonl", "resume": True},
        "model": {
            "vq_model": TINY_VQ,
            "discriminator": {"name": "VQGAN+Discriminator", "num_channels": 3,
                              "num_stages": 1, "hidden_channels": 32,
                              "blur_resample": True, "blur_kernel_size": 4},
        },
        "losses": {
            "quantizer_weight": 1.0, "perceptual_loss": "none",
            "perceptual_weight": 0.0, "reconstruction_loss": "l2",
            "reconstruction_weight": 1.0, "discriminator_start": 2,
            "discriminator_loss": "hinge", "discriminator_factor": 1.0,
            "discriminator_weight": 0.1, "discriminator_gradient_penalty": "adopt_weight",
            "discriminator_penalty_cost": 10.0, "lecam_regularization_weight": 0.001,
            "entropy_annealing_steps": 10, "entropy_annealing_factor": 1.0,
        },
        "dataset": DATASET,
        "optimizer": {"name": "adamw", "params": {"learning_rate": 1e-3}},
        "lr_scheduler": {"scheduler": "constant_with_warmup", "params": {"warmup_steps": 2}},
        "training": {"gradient_accumulation_steps": 1, "per_device_batch_size": 2,
                     "mixed_precision": "no", "use_ema": True, "seed": 0,
                     "max_train_steps": 4, "overfit_batch": True, "overfit_batch_num": 1,
                     "num_generated_images": 1, "max_grad_norm": 1.0},
    }
    config_path = _write_config(tmp_path, cfg)
    monkeypatch.setenv("WORKSPACE", str(tmp_path / "ws"))
    main([f"config={config_path}"])

    out_dir = tmp_path / "ws" / "smoke_tok"
    metrics = [json.loads(l) for l in open(out_dir / "metrics.jsonl")]
    assert any("total_loss" in m for m in metrics)
    # final checkpoint + bare exports written
    assert (out_dir / "model-4.msgpack").exists()
    assert (out_dir / "ema_model-4.msgpack").exists()
    assert any(p.startswith("metadata-") for p in os.listdir(out_dir / "checkpoints"))
    # eval ran and produced scores
    assert any("eval/PSNR" in m for m in metrics)


def test_train_maskbit_cli(tmp_path, monkeypatch):
    from maskbit_tpu.cli.train_maskbit import main

    cfg = {
        "experiment": {"name": "smoke_gen", "max_train_examples": 64,
                       "save_every": 100, "eval_every": 2, "generate_every": 3,
                       "log_every": 1, "logger": "jsonl", "resume": True,
                       "vqgan_checkpoint": ""},
        "model": {
            "vq_model": TINY_VQ,
            "mlm_model": {"model_cls": "lfq_bert", "hidden_dim": 32, "depth": 1,
                          "heads": 2, "mlp_dim": 64, "dropout": 0.1,
                          "guidance_scale": 2.0, "guidance_annealing": "cosine",
                          "num_steps": 3, "train_mask_schedule_strategy": "arccos",
                          "gen_mask_schedule_strategy": "arccos",
                          "softmax_temperature": 1.0, "randomize_temperature": 4.0,
                          "class_label_dropout": 0.1, "scale_pow": 3.0,
                          "use_sampling_annealing": False, "codebook_splits": 2,
                          "use_prenorm": False, "img_size": 32, "input_stride": 2},
        },
        "losses": {"mlm": {"label_smoothing": 0.1, "sum_splits": False}},
        "dataset": DATASET,
        "optimizer": {"name": "adamw", "params": {"learning_rate": 1e-3}},
        "lr_scheduler": {"scheduler": "constant", "params": {}},
        "training": {"gradient_accumulation_steps": 1, "per_device_batch_size": 2,
                     "mixed_precision": "no", "use_ema": True, "seed": 0,
                     "max_train_steps": 3, "overfit_batch": True, "overfit_batch_num": 1,
                     "num_generated_images": 2, "max_grad_norm": 1.0},
    }
    config_path = _write_config(tmp_path, cfg)
    monkeypatch.setenv("WORKSPACE", str(tmp_path / "ws"))
    main([f"config={config_path}"])

    out_dir = tmp_path / "ws" / "smoke_gen"
    metrics = [json.loads(l) for l in open(out_dir / "metrics.jsonl")]
    assert any("mlm_loss" in m for m in metrics)
    assert (out_dir / "model-3.msgpack").exists()
    # generated-sample + decoded-pair viz were produced at step 3
    images = os.listdir(out_dir / "images")
    assert any("generated" in f for f in images)
    assert any("decoded" in f for f in images)


def test_train_tokenizer_resume(tmp_path, monkeypatch):
    """Resume-latest contract: a second run continues from the saved step."""
    import yaml as _yaml

    from maskbit_tpu.cli.train_tokenizer import main

    cfg = {
        "experiment": {"name": "smoke_resume", "max_train_examples": 64,
                       "save_every": 2, "eval_every": 1000, "generate_every": 1000,
                       "log_every": 1, "logger": "jsonl", "resume": True},
        "model": {
            "vq_model": TINY_VQ,
            "discriminator": {"name": "VQGAN+Discriminator", "num_channels": 3,
                              "num_stages": 1, "hidden_channels": 32,
                              "blur_resample": False},
        },
        "losses": {
            "quantizer_weight": 1.0, "perceptual_loss": "none",
            "perceptual_weight": 0.0, "reconstruction_loss": "l2",
            "reconstruction_weight": 1.0, "discriminator_start": 1000,
            "discriminator_loss": "hinge", "discriminator_factor": 1.0,
            "discriminator_weight": 0.1, "discriminator_gradient_penalty": "none",
            "discriminator_penalty_cost": 10.0, "lecam_regularization_weight": 0.0,
        },
        "dataset": DATASET,
        "optimizer": {"name": "adamw", "params": {"learning_rate": 1e-3}},
        "lr_scheduler": {"scheduler": "constant", "params": {}},
        "training": {"gradient_accumulation_steps": 1, "per_device_batch_size": 2,
                     "mixed_precision": "no", "use_ema": True, "seed": 0,
                     "max_train_steps": 2, "overfit_batch": True, "overfit_batch_num": 1,
                     "num_generated_images": 1, "max_grad_norm": 1.0},
    }
    config_path = _write_config(tmp_path, cfg, name="resume.yaml")
    monkeypatch.setenv("WORKSPACE", str(tmp_path / "ws"))
    main([f"config={config_path}"])  # runs steps 1..2, saves at 2

    out_dir = tmp_path / "ws" / "smoke_resume"
    assert (out_dir / "model-2.msgpack").exists()

    # second invocation: must resume from step 2 and run to 4
    main([f"config={config_path}", "training.max_train_steps=4"])
    assert (out_dir / "model-4.msgpack").exists()
    metrics = [json.loads(l) for l in open(out_dir / "metrics.jsonl")]
    steps = [m["step"] for m in metrics if "total_loss" in m]
    # after resume, logged steps continue past the first run's end
    assert max(steps) == 4
    assert 1 in steps and 3 in steps


def test_reset_optimizer_counts_keeps_moments():
    """resume_lr_scheduler=false helper: step counters zero, moments kept —
    so the LR schedule restarts while Adam's mu/nu history continues
    (reference train_tokenizer.py:308-329 semantics)."""
    import jax
    import jax.numpy as jnp
    import optax

    from maskbit_tpu.cli.common import reset_optimizer_counts

    tx = optax.MultiSteps(
        optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(optax.cosine_decay_schedule(1e-3, 100)),
        ),
        every_k_schedule=1,
    )
    params = {"w": jnp.ones((3,))}
    opt = tx.init(params)
    for _ in range(5):
        updates, opt = tx.update({"w": jnp.full((3,), 0.1)}, opt, params)
        params = optax.apply_updates(params, updates)

    reset = reset_optimizer_counts(opt)
    counts_before, counts_after, moments = [], [], []

    def walk(path, a, b):
        name = getattr(path[-1], "name", None) if path else None
        if name in ("count", "gradient_step", "mini_step"):
            counts_before.append(int(a))
            counts_after.append(int(b))
        elif a.ndim > 0:
            moments.append(bool(jnp.all(a == b)))

    jax.tree_util.tree_map_with_path(
        lambda p, a, b: walk(p, a, b), opt, reset
    )
    assert counts_before and max(counts_before) == 5
    assert all(c == 0 for c in counts_after)
    assert moments and all(moments)  # mu/nu untouched


def test_train_tokenizer_finetune_decoder(tmp_path, monkeypatch):
    """Decoder-finetune mode: encoder params stay EXACTLY fixed (no grads,
    no weight decay), decoder params move."""
    import numpy as np

    import jax

    from maskbit_tpu.cli.train_tokenizer import build_optimizers, main
    from maskbit_tpu.core.checkpoint import load_pretrained

    vq = dict(TINY_VQ, finetune_decoder=True)
    cfg = {
        "experiment": {"name": "smoke_ft", "max_train_examples": 64,
                       "save_every": 2, "eval_every": 1000, "generate_every": 1000,
                       "log_every": 1, "logger": "jsonl", "resume": False},
        "model": {
            "vq_model": vq,
            "discriminator": {"name": "VQGAN+Discriminator", "num_channels": 3,
                              "num_stages": 1, "hidden_channels": 32,
                              "blur_resample": False},
        },
        "losses": {
            "quantizer_weight": 1.0, "perceptual_loss": "none",
            "perceptual_weight": 0.0, "reconstruction_loss": "l2",
            "reconstruction_weight": 1.0, "discriminator_start": 1000,
            "discriminator_loss": "hinge", "discriminator_factor": 1.0,
            "discriminator_weight": 0.1, "discriminator_gradient_penalty": "none",
            "discriminator_penalty_cost": 10.0, "lecam_regularization_weight": 0.0,
        },
        "dataset": DATASET,
        "optimizer": {"name": "adamw", "params": {"learning_rate": 1e-2,
                                                  "weight_decay": 0.1}},
        "lr_scheduler": {"scheduler": "constant", "params": {}},
        "training": {"gradient_accumulation_steps": 1, "per_device_batch_size": 2,
                     "mixed_precision": "no", "use_ema": False, "seed": 0,
                     "max_train_steps": 2, "overfit_batch": True, "overfit_batch_num": 1,
                     "num_generated_images": 1, "max_grad_norm": 1.0},
    }
    config_path = _write_config(tmp_path, cfg, name="ft.yaml")
    monkeypatch.setenv("WORKSPACE", str(tmp_path / "ws"))
    main([f"config={config_path}"])

    out_dir = tmp_path / "ws" / "smoke_ft"
    final = load_pretrained(str(out_dir / "model-2.msgpack"))

    # reinit with the same seed to recover the initial params
    from maskbit_tpu.core.config import load_config
    from maskbit_tpu.models.tokenizer import ConvVQModel
    from maskbit_tpu.nn.discriminator import create_discriminator
    from maskbit_tpu.train.tokenizer_trainer import init_tokenizer_train_state
    import jax.numpy as jnp

    config = load_config(config_path)
    model = ConvVQModel.from_config(config.model.vq_model)
    disc = create_discriminator(config.model.discriminator)
    gen_tx, disc_tx = build_optimizers(config, 1)
    state0 = init_tokenizer_train_state(
        model, disc, gen_tx, disc_tx, jax.random.key(0), (2, 32, 32, 3), use_ema=False
    )

    enc_same = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        state0.gen_params["encoder"], final["encoder"],
    )
    assert all(jax.tree.leaves(enc_same)), "frozen encoder must not move"
    dec_changed = jax.tree.map(
        lambda a, b: not np.array_equal(np.asarray(a), np.asarray(b)),
        state0.gen_params["decoder"], final["decoder"],
    )
    assert any(jax.tree.leaves(dec_changed)), "decoder must train"


def test_train_maskbit_cli_bert_variant(tmp_path, monkeypatch):
    """The embedding-table Bert generator (reference bert.py:184-340, the
    non-LFQ variant) through the real train CLI — weight-tied output head,
    per-split embedding tables, EMA, sampling viz."""
    from maskbit_tpu.cli.train_maskbit import main

    cfg = {
        "experiment": {"name": "smoke_bert", "max_train_examples": 64,
                       "save_every": 100, "eval_every": 100, "generate_every": 2,
                       "log_every": 1, "logger": "jsonl", "resume": True,
                       "vqgan_checkpoint": ""},
        "model": {
            "vq_model": TINY_VQ,
            "mlm_model": {"model_cls": "bert", "hidden_dim": 32, "depth": 1,
                          "heads": 2, "mlp_dim": 64, "dropout": 0.1,
                          "guidance_scale": 2.0, "guidance_annealing": "cosine",
                          "num_steps": 3, "train_mask_schedule_strategy": "arccos",
                          "gen_mask_schedule_strategy": "arccos",
                          "softmax_temperature": 1.0, "randomize_temperature": 4.0,
                          "class_label_dropout": 0.1, "scale_pow": 3.0,
                          "use_sampling_annealing": False, "codebook_splits": 2,
                          "use_prenorm": False, "img_size": 32, "input_stride": 2},
        },
        "losses": {"mlm": {"label_smoothing": 0.1, "sum_splits": False}},
        "dataset": DATASET,
        "optimizer": {"name": "adamw", "params": {"learning_rate": 1e-3}},
        "lr_scheduler": {"scheduler": "constant", "params": {}},
        "training": {"gradient_accumulation_steps": 1, "per_device_batch_size": 2,
                     "mixed_precision": "no", "use_ema": True, "seed": 0,
                     "max_train_steps": 2, "overfit_batch": True, "overfit_batch_num": 1,
                     "num_generated_images": 1, "max_grad_norm": 1.0},
    }
    config_path = _write_config(tmp_path, cfg, name="bert.yaml")
    monkeypatch.setenv("WORKSPACE", str(tmp_path / "ws"))
    main([f"config={config_path}"])

    out_dir = tmp_path / "ws" / "smoke_bert"
    metrics = [json.loads(l) for l in open(out_dir / "metrics.jsonl")]
    losses = [m["mlm_loss"] for m in metrics if "mlm_loss" in m]
    assert len(losses) == 2 and all(abs(l) < 1e6 for l in losses)
    assert any("generated" in f for f in os.listdir(out_dir / "images"))


def test_train_tokenizer_cli_fsdp_sharded_resume(tmp_path, monkeypatch):
    """Stage-I GAN training on a NON-trivial mesh (fsdp=2, tensor=2 over the
    8 virtual devices) through the real CLI, WITH the discriminator live from
    step 0 — the adaptive-weight vjp + twin optimizers + LeCam EMA under
    multi-axis GSPMD sharding (the riskiest graph in the repo), plus the
    sharded-template resume path (VERDICT r2 weak #2)."""
    from maskbit_tpu.cli.train_tokenizer import main

    cfg = {
        "experiment": {"name": "smoke_tok_fsdp", "max_train_examples": 64,
                       "save_every": 100, "eval_every": 1000, "generate_every": 1000,
                       "log_every": 1, "logger": "jsonl", "resume": True},
        "parallel": {"data": -1, "fsdp": 2, "tensor": 2},
        "model": {
            "vq_model": TINY_VQ,
            "discriminator": {"name": "VQGAN+Discriminator", "num_channels": 3,
                              "num_stages": 1, "hidden_channels": 32,
                              "blur_resample": True, "blur_kernel_size": 4},
        },
        "losses": {
            "quantizer_weight": 1.0, "perceptual_loss": "none",
            "perceptual_weight": 0.0, "reconstruction_loss": "l2",
            "reconstruction_weight": 1.0, "discriminator_start": 0,
            "discriminator_loss": "hinge", "discriminator_factor": 1.0,
            "discriminator_weight": 0.1, "discriminator_gradient_penalty": "adopt_weight",
            "discriminator_penalty_cost": 10.0, "lecam_regularization_weight": 0.001,
        },
        "dataset": DATASET,
        "optimizer": {"name": "adamw", "params": {"learning_rate": 1e-3}},
        "lr_scheduler": {"scheduler": "constant", "params": {}},
        "training": {"gradient_accumulation_steps": 1, "per_device_batch_size": 1,
                     "mixed_precision": "no", "use_ema": True, "seed": 0,
                     "max_train_steps": 2, "overfit_batch": True, "overfit_batch_num": 1,
                     "num_generated_images": 1, "max_grad_norm": 1.0},
    }
    config_path = _write_config(tmp_path, cfg, name="tok_fsdp.yaml")
    monkeypatch.setenv("WORKSPACE", str(tmp_path / "ws"))
    main([f"config={config_path}"])

    out_dir = tmp_path / "ws" / "smoke_tok_fsdp"
    metrics = [json.loads(l) for l in open(out_dir / "metrics.jsonl")]
    # the GAN path really ran sharded: adaptive weight + disc loss logged
    losses = [m for m in metrics if "total_loss" in m]
    assert len(losses) == 2
    assert all(abs(m["total_loss"]) < 1e6 for m in losses)
    assert all("d_weight" in m and "discriminator_loss" in m for m in losses)

    # resume on the sharded mesh: continue 2 -> 4 (twin opts + LeCam restored)
    cfg["training"]["max_train_steps"] = 4
    config_path = _write_config(tmp_path, cfg, name="tok_fsdp2.yaml")
    main([f"config={config_path}"])
    metrics = [json.loads(l) for l in open(out_dir / "metrics.jsonl")]
    steps = [m["step"] for m in metrics if "total_loss" in m]
    assert max(steps) == 4


def test_train_maskbit_cli_fsdp_sharded_resume(tmp_path, monkeypatch):
    """Generator training with a NON-trivial mesh (fsdp=2, tensor=2 over the
    8 virtual devices): shard_train_state places params/opt/EMA by the
    partition rules, training runs sharded, and the resume path restores
    through the NamedSharding template — the pod configuration end-to-end
    through the real CLI."""
    from maskbit_tpu.cli.train_maskbit import main

    cfg = {
        "experiment": {"name": "smoke_fsdp", "max_train_examples": 64,
                       "save_every": 100, "eval_every": 100, "generate_every": 100,
                       "log_every": 1, "logger": "jsonl", "resume": True,
                       "vqgan_checkpoint": ""},
        "parallel": {"data": -1, "fsdp": 2, "tensor": 2},
        "model": {
            "vq_model": TINY_VQ,
            "mlm_model": {"model_cls": "lfq_bert", "hidden_dim": 32, "depth": 1,
                          "heads": 2, "mlp_dim": 64, "dropout": 0.1,
                          "guidance_scale": 2.0, "guidance_annealing": "cosine",
                          "num_steps": 3, "train_mask_schedule_strategy": "arccos",
                          "gen_mask_schedule_strategy": "arccos",
                          "softmax_temperature": 1.0, "randomize_temperature": 4.0,
                          "class_label_dropout": 0.1, "scale_pow": 3.0,
                          "use_sampling_annealing": False, "codebook_splits": 2,
                          "use_prenorm": False, "img_size": 32, "input_stride": 2},
        },
        "losses": {"mlm": {"label_smoothing": 0.1, "sum_splits": False}},
        "dataset": DATASET,
        "optimizer": {"name": "adamw", "params": {"learning_rate": 1e-3}},
        "lr_scheduler": {"scheduler": "constant", "params": {}},
        "training": {"gradient_accumulation_steps": 1, "per_device_batch_size": 1,
                     "mixed_precision": "no", "use_ema": True, "seed": 0,
                     "max_train_steps": 2, "overfit_batch": True, "overfit_batch_num": 1,
                     "num_generated_images": 1, "max_grad_norm": 1.0},
    }
    config_path = _write_config(tmp_path, cfg, name="fsdp.yaml")
    monkeypatch.setenv("WORKSPACE", str(tmp_path / "ws"))
    main([f"config={config_path}"])

    out_dir = tmp_path / "ws" / "smoke_fsdp"
    metrics = [json.loads(l) for l in open(out_dir / "metrics.jsonl")]
    losses = [m["mlm_loss"] for m in metrics if "mlm_loss" in m]
    assert len(losses) == 2 and all(abs(l) < 1e6 for l in losses)

    # resume on the sharded mesh: continue 2 -> 4
    cfg["training"]["max_train_steps"] = 4
    config_path = _write_config(tmp_path, cfg, name="fsdp2.yaml")
    main([f"config={config_path}"])
    metrics = [json.loads(l) for l in open(out_dir / "metrics.jsonl")]
    steps = [m["step"] for m in metrics if "mlm_loss" in m]
    assert max(steps) == 4


def test_enable_compilation_cache_knobs(monkeypatch, tmp_path):
    """The persistent-cache helper must not clobber an already-configured
    cache dir (the conftest's), must derive the XDG default when none is
    set, and must honor the opt-out and explicit-dir knobs."""
    import jax

    from maskbit_tpu.cli.common import enable_compilation_cache
    from maskbit_tpu.core.config import Config

    before = jax.config.jax_compilation_cache_dir
    before_min_secs = jax.config.jax_persistent_cache_min_compile_time_secs
    assert before  # conftest points the suite at tests/.jax_cache
    enable_compilation_cache(None)
    assert jax.config.jax_compilation_cache_dir == before
    # no-op path must not touch the persistence threshold either
    assert jax.config.jax_persistent_cache_min_compile_time_secs == before_min_secs

    try:
        # no dir configured -> XDG default
        jax.config.update("jax_compilation_cache_dir", None)
        monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
        monkeypatch.delenv("MASKBIT_COMPILE_CACHE", raising=False)
        enable_compilation_cache(None)
        assert jax.config.jax_compilation_cache_dir == os.path.join(
            str(tmp_path), "maskbit_tpu", "xla_cache")
        # enabling raises the persistence threshold to expensive-only
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 5.0

        # config opt-out wins
        jax.config.update("jax_compilation_cache_dir", None)
        enable_compilation_cache(Config({"experiment": {"compilation_cache": False}}))
        assert not jax.config.jax_compilation_cache_dir

        # explicit dir via config
        enable_compilation_cache(Config(
            {"experiment": {"compilation_cache_dir": str(tmp_path / "explicit")}}))
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "explicit")

        # env opt-out
        jax.config.update("jax_compilation_cache_dir", None)
        monkeypatch.setenv("MASKBIT_COMPILE_CACHE", "0")
        enable_compilation_cache(None)
        assert not jax.config.jax_compilation_cache_dir
        # ... and it wins even over an explicit config enable (the
        # documented debug knob for suspected stale-cache miscompiles)
        enable_compilation_cache(Config({"experiment": {"compilation_cache": True}}))
        assert not jax.config.jax_compilation_cache_dir
    finally:
        jax.config.update("jax_compilation_cache_dir", before)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", before_min_secs)
