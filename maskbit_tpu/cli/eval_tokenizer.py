"""Tokenizer reconstruction evaluation entry point.

Usage (mirrors reference scripts/eval_tokenizer.py):
    python -m maskbit_tpu.cli.eval_tokenizer config=configs/tokenizer/maskbit_tokenizer_12bit.yaml \
        experiment.vqgan_checkpoint=/path/maskbit_tokenizer_12bit.bin

Loads a vqgan+ / taming / maskgit tokenizer (reference :56-66) and runs the
streaming TokenizerEvaluator (MAE/MSE/PSNR/SSIM/codebook usage+entropy, and
rFID/IS when inception weights are provided via MASKBIT_INCEPTION_WEIGHTS).
"""

from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp

from maskbit_tpu.cli.common import build_dataloaders, resolve_compute_dtype, setup_experiment
from maskbit_tpu.core.checkpoint import load_pretrained
from maskbit_tpu.core.config import config_from_cli
from maskbit_tpu.eval.streaming import TokenizerEvaluator


def build_tokenizer(config, dtype):
    """vqgan+ (default/new), maskgit (legacy decoder), taming (attention)."""
    vq_cfg = config.model.vq_model
    model_class = vq_cfg.get("model_class", "vqgan+")
    if model_class in ("vqgan+", "maskbit"):
        from maskbit_tpu.models.tokenizer import ConvVQModel

        return ConvVQModel.from_config(vq_cfg, dtype=dtype)
    if model_class == "maskgit":
        from maskbit_tpu.models.tokenizer import ConvVQModel

        return ConvVQModel.from_config(vq_cfg, legacy=True, dtype=dtype)
    if model_class == "taming":
        from maskbit_tpu.models.taming import OriginalVQModel

        return OriginalVQModel(
            ch=vq_cfg.get("hidden_channels", 128),
            ch_mult=tuple(vq_cfg.get("channel_mult", (1, 1, 2, 2, 4))),
            num_res_blocks=vq_cfg.get("num_res_blocks", 2),
            attn_resolutions=tuple(vq_cfg.get("attn_resolutions", (16,))),
            resolution=vq_cfg.get("resolution", 256),
            z_channels=vq_cfg.get("z_channels", 256),
            codebook_size=vq_cfg.get("codebook_size", 1024),
            token_size=vq_cfg.get("token_size", 256),
            dtype=dtype,
        )
    raise ValueError(f"Unknown tokenizer model_class {model_class!r}")


def make_inception_fn():
    """Bound inception apply if weights are available, else None.

    MASKBIT_ADM_PB (the OpenAI classify_image_graph_def.pb, the ADM suite's
    exact headline network — reference utils/adm_eval_suite.py:16-17) takes
    precedence over MASKBIT_INCEPTION_WEIGHTS (the pt-fid torch weights,
    converted from the same graph but not byte-identical)."""
    pb_path = os.environ.get("MASKBIT_ADM_PB", "")
    path = os.environ.get("MASKBIT_INCEPTION_WEIGHTS", "")
    from maskbit_tpu.eval.inception import InceptionV3, load_inception_params

    if pb_path and os.path.exists(pb_path):
        from maskbit_tpu.compat.tf_graphdef import extract_inception_params

        variables = jax.tree.map(jnp.asarray, extract_inception_params(pb_path))
    elif os.path.exists(path):
        variables = load_inception_params(path)
    else:
        return None
    model = InceptionV3()
    return jax.jit(lambda img: model.apply(variables, img.astype(jnp.float32)))


def make_lpips_fn():
    """Bound LPIPS apply if both weight files are available, else None."""
    from maskbit_tpu.losses.lpips import LPIPS, bundled_lin_weights_path, load_lpips_params

    lin_path = os.environ.get("MASKBIT_LPIPS_WEIGHTS", bundled_lin_weights_path())
    vgg_path = os.environ.get("MASKBIT_VGG16_WEIGHTS", "")
    if not (os.path.exists(lin_path) and os.path.exists(vgg_path)):
        return None

    model = LPIPS()
    variables = load_lpips_params(lin_path, vgg_path)
    return jax.jit(lambda real, fake: model.apply(variables, real, fake))


def main(argv=None):
    config = config_from_cli(argv if argv is not None else sys.argv[1:])
    ctx = setup_experiment(config, subdir="eval")
    logger = ctx["logger"]

    dtype = resolve_compute_dtype(config)
    model = build_tokenizer(config, dtype)

    ckpt_path = config.select("experiment.vqgan_checkpoint", "")
    if ckpt_path and os.path.exists(ckpt_path):
        variables = load_pretrained(ckpt_path)
        logger.info(f"loaded tokenizer from {ckpt_path}")
    else:
        logger.warning(f"checkpoint {ckpt_path!r} missing — RANDOM weights (smoke mode)")
        res = config.select("dataset.preprocessing.resolution", 256)
        variables = model.init(jax.random.key(0), jnp.zeros((1, res, res, 3)))

    inception_fn = make_inception_fn()
    if inception_fn is None:
        logger.warning(
            "MASKBIT_INCEPTION_WEIGHTS not set — rFID / InceptionScore disabled"
        )
    lpips_fn = make_lpips_fn()
    if lpips_fn is None:
        logger.warning(
            "MASKBIT_LPIPS_WEIGHTS / MASKBIT_VGG16_WEIGHTS not set — LPIPS disabled"
        )
    evaluator = TokenizerEvaluator(
        inception_fn=inception_fn,
        lpips_fn=lpips_fn,
        enable_rfid=inception_fn is not None,
        enable_inception_score=inception_fn is not None,
        enable_lpips_score=lpips_fn is not None,
        enable_psnr_score=True,
        enable_ssim_score=True,
        enable_mse_error=True,
        enable_mae_error=True,
        enable_codebook_usage_measure=True,
        enable_codebook_entropy_measure=True,
        num_codebook_entries=config.select("model.vq_model.codebook_size", 1024),
    )

    per_device_batch = config.select("training.per_device_batch_size", 16)
    global_batch = per_device_batch * jax.device_count()
    _, make_eval, synthetic = build_dataloaders(config, logger, global_batch)
    max_batches = int(os.environ.get("MASKBIT_EVAL_MAX_BATCHES", "0")) or None

    apply_fn = jax.jit(lambda v, x: model.apply(v, x))
    for i, batch in enumerate(make_eval()):
        if max_batches and i >= max_batches:
            break
        images = jnp.asarray(batch["image"])
        recons, result = apply_fn(variables, images)
        evaluator.update(
            images, jnp.clip(recons, 0.0, 1.0),
            codebook_indices=result["min_encoding_indices"],
        )

    # each host evaluated its shard split; sum accumulators across hosts
    evaluator.merge_across_hosts()

    results = evaluator.result()
    logger.info(f"EVALUATION: {results}")
    print(json.dumps(results))
    with open(os.path.join(ctx["output_dir"], "eval_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    main()
