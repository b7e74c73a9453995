"""Inference/demo API: load models, sample images, visualize.

Parity target: reference demo_utils.py:25-165 — `get_tokenizer` /
`get_generator` (with the token_emb->input_proj rename handled by the
converter), a batch `sample()` wrapper, reconstruction and generation viz —
plus the ImageNet class-name table for labeling.

Runnable:
    python -m maskbit_tpu.cli.demo config=configs/demo/demo.yaml \
        demo.labels=[1,7,282] demo.output=samples.png
"""

from __future__ import annotations

import json
import os
import sys
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from maskbit_tpu.core.checkpoint import load_pretrained
from maskbit_tpu.core.config import Config, config_from_cli
from maskbit_tpu.models.generator import make_generator
from maskbit_tpu.models.tokenizer import ConvVQModel
from maskbit_tpu.sampling.sample import SamplingConfig, default_labels, make_sampler
from maskbit_tpu.utils.viz import make_viz_from_samples, make_viz_generated_stage_two

_CLASSNAMES_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data", "imagenet_classnames.json",
)


def imagenet_classname(idx: int) -> str:
    with open(_CLASSNAMES_PATH) as f:
        return json.load(f)[str(int(idx))]


def get_tokenizer(config: Config, checkpoint_path: Optional[str] = None,
                  dtype=jnp.float32):
    """(module, variables) for the Stage-I tokenizer (demo_utils.py:25-31)."""
    model = ConvVQModel.from_config(config.model.vq_model, dtype=dtype)
    path = checkpoint_path or config.select("experiment.vqgan_checkpoint", "")
    if path and os.path.exists(path):
        variables = load_pretrained(path)
    else:
        res = config.select("dataset.preprocessing.resolution", 256)
        variables = model.init(jax.random.key(0), jnp.zeros((1, res, res, 3)))
    return model, variables


def get_generator(config: Config, checkpoint_path: Optional[str] = None,
                  dtype=jnp.float32):
    """(module, variables) for the Stage-II generator (demo_utils.py:34-57).

    Old checkpoints with `token_emb.*` keys load transparently — the
    converter applies the input_proj rename (demo_utils.py:52)."""
    mlm_cfg = config.model.mlm_model
    model = make_generator(mlm_cfg.get("model_cls", "lfq_bert"), mlm_cfg,
                           config.model.vq_model, dtype=dtype)
    path = checkpoint_path or config.select("experiment.generator_checkpoint", "")
    if path and os.path.exists(path):
        variables = load_pretrained(path)
    else:
        variables = model.init(
            jax.random.key(1),
            jnp.zeros((1, model.seq_len, model.codebook_splits), jnp.int32),
            jnp.zeros((1,), jnp.int32),
        )
    return model, variables


def sample(config: Config, generator, gen_vars, tokenizer, tok_vars,
           labels: Optional[List[int]] = None, num_samples: int = 10,
           seed: int = 0):
    """Batch sampling wrapper (demo_utils.py:108-165). Returns NHWC [0,1]."""
    cfg = SamplingConfig.from_config(config.model.mlm_model, config.model.vq_model)
    res = config.select("dataset.preprocessing.resolution", 256)
    cfg = cfg._replace(
        patch_size=res // 2 ** (config.select("model.vq_model.num_resolutions", 5) - 1)
    )
    sampler = make_sampler(generator, tokenizer, cfg, jit=True)
    key = jax.random.key(seed)
    if labels is None:
        y = default_labels(num_samples, key)
    else:
        y = jnp.asarray(labels, jnp.int32)
    images, _ = sampler(gen_vars, tok_vars, key, y)
    return jnp.clip(images, 0.0, 1.0), y


def visualize_reconstruction(tokenizer, tok_vars, images: np.ndarray):
    """original | reconstruction | diff strips (demo_utils.py:60-84)."""
    recons, _ = tokenizer.apply(tok_vars, jnp.asarray(images))
    _, grid = make_viz_from_samples(images, np.asarray(jnp.clip(recons, 0, 1)))
    return grid


def main(argv=None):
    from maskbit_tpu.cli.common import enable_compilation_cache

    config = config_from_cli(argv if argv is not None else sys.argv[1:])
    enable_compilation_cache(config)
    tokenizer, tok_vars = get_tokenizer(config)
    generator, gen_vars = get_generator(config)
    labels = config.select("demo.labels", None)
    num = config.select("demo.num_samples", 10)
    images, y = sample(config, generator, gen_vars, tokenizer, tok_vars,
                       labels=list(labels) if labels else None, num_samples=num)
    _, grid = make_viz_generated_stage_two(np.asarray(images))
    out = config.select("demo.output", "samples.png")
    from PIL import Image

    Image.fromarray(grid).save(out)
    names = [imagenet_classname(int(i)) for i in np.asarray(y)]
    print(f"wrote {out} with classes: {names}")


if __name__ == "__main__":
    main()
