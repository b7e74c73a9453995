"""Pre-tokenize an image shard set with a frozen Stage-I tokenizer.

Usage:
    python -m maskbit_tpu.cli.pretokenize config=configs/tokenizer/maskbit_tokenizer_14bit.yaml \
        experiment.vqgan_checkpoint=/ckpts/maskbit_tokenizer_14bit.bin \
        pretokenize.shards='/data/imagenet-train-{0000..0252}.tar' \
        pretokenize.output='/data/tokens/train-%04d.npz'

Then train Stage-II from tokens:
    python -m maskbit_tpu.cli.train_maskbit config=... \
        dataset.params.token_shards_path_or_url='/data/tokens/train-{0000..0025}.npz'
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from maskbit_tpu.cli.common import resolve_compute_dtype, setup_experiment
from maskbit_tpu.core.checkpoint import load_pretrained
from maskbit_tpu.core.config import config_from_cli
from maskbit_tpu.data.tar_reader import TarImageDataset, batched
from maskbit_tpu.data.token_shards import TokenShardWriter
from maskbit_tpu.data.transforms import EvalTransform, TrainTransform
from maskbit_tpu.models.tokenizer import ConvVQModel


def main(argv=None):
    config = config_from_cli(argv if argv is not None else sys.argv[1:])
    ctx = setup_experiment(config, subdir="pretokenize")
    logger = ctx["logger"]

    dtype = resolve_compute_dtype(config)
    model = ConvVQModel.from_config(config.model.vq_model, dtype=dtype)
    res = config.select("dataset.preprocessing.resolution", 256)

    ckpt_path = config.select("experiment.vqgan_checkpoint", "")
    if ckpt_path and os.path.exists(ckpt_path):
        variables = load_pretrained(ckpt_path)
        logger.info(f"loaded tokenizer from {ckpt_path}")
    else:
        logger.warning(f"checkpoint {ckpt_path!r} missing — RANDOM weights (smoke mode)")
        variables = model.init(jax.random.key(0), jnp.zeros((1, res, res, 3)))

    use_train_aug = config.select("pretokenize.train_augmentation", True)
    prep = config.dataset.preprocessing
    if use_train_aug:
        transform = TrainTransform(
            resolution=res,
            min_scale=prep.get("min_scale", 0.8),
            use_aspect_ratio_aug=prep.get("use_aspect_ratio_aug", False),
            use_random_crop=prep.get("use_random_crop", True),
            interpolation=prep.get("interpolation", "bicubic"),
            seed=config.select("training.seed", 42),
        )
    else:
        transform = EvalTransform(resolution=res, interpolation=prep.get("interpolation", "bicubic"))

    shards = config.select("pretokenize.shards",
                           config.select("dataset.params.train_shards_path_or_url", ""))
    output = config.select("pretokenize.output", "tokens/train-%04d.npz")
    batch_size = config.select("pretokenize.batch_size", 64)
    max_samples = config.select("pretokenize.max_samples", 0)

    dataset = TarImageDataset(shards, transform, resample=False)
    tokenize = jax.jit(lambda v, x: model.apply(v, x, method="tokenize"))
    writer = TokenShardWriter(output, maxcount=config.select("pretokenize.shard_size", 50_000))

    for batch in batched(iter(dataset), batch_size, drop_last=False):
        tokens = tokenize(variables, jnp.asarray(batch["image"]))
        tokens = np.asarray(tokens).reshape(tokens.shape[0], -1)
        writer.write_batch(tokens, batch["class_id"])
        if writer.total % (batch_size * 50) == 0:
            logger.info(f"tokenized {writer.total} images")
        if max_samples and writer.total >= max_samples:
            break
    writer.close()
    logger.info(f"wrote {writer.total} tokenized samples to {output}")
    return writer.total


if __name__ == "__main__":
    main()
