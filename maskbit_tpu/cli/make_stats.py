"""Compute ADM-format FID reference statistics from tar shards.

The reference ships precomputed `train_imagenet256_stats.npz` (absent from
the public snapshot, .MISSING_LARGE_BLOBS); this tool regenerates the
mu/sigma stats from an ImageNet shard set with the framework's InceptionV3.

Usage:
    MASKBIT_INCEPTION_WEIGHTS=/path/pt_inception.pth \
    python -m maskbit_tpu.cli.make_stats --shards '/data/train-{0000..0252}.tar' \
        --output metrics/stats/train_imagenet256_stats.npz --resolution 256
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

from maskbit_tpu.cli.eval_tokenizer import make_inception_fn
from maskbit_tpu.data.tar_reader import TarImageDataset, batched
from maskbit_tpu.data.transforms import EvalTransform


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--shards", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--resolution", type=int, default=256)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--max_samples", type=int, default=0, help="0 = all")
    args = parser.parse_args(argv)

    inception_fn = make_inception_fn()
    if inception_fn is None:
        raise SystemExit("set MASKBIT_INCEPTION_WEIGHTS to the pt-fid weights file")

    dataset = TarImageDataset(
        args.shards, EvalTransform(resolution=args.resolution), resample=False
    )
    total = np.zeros(2048, np.float64)
    outer = np.zeros((2048, 2048), np.float64)
    n = 0
    for batch in batched(iter(dataset), args.batch_size, drop_last=False):
        images = jnp.asarray(batch["image"] * 255.0, jnp.float32)
        feats = np.asarray(inception_fn(images)["2048"], np.float64)
        total += feats.sum(0)
        outer += feats.T @ feats
        n += feats.shape[0]
        if args.max_samples and n >= args.max_samples:
            break
        if n % (args.batch_size * 50) == 0:
            print(f"processed {n} images")

    mu = total / n
    sigma = (outer - n * np.outer(mu, mu)) / (n - 1)
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    np.savez(args.output, mu=mu, sigma=sigma)
    print(f"wrote {args.output} from {n} images")


if __name__ == "__main__":
    main()
