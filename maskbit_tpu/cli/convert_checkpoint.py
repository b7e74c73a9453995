"""Convert reference PyTorch checkpoints to the native msgpack zoo format.

Usage:
    python -m maskbit_tpu.cli.convert_checkpoint \
        --input /ckpts/maskbit_tokenizer_12bit.bin --output tokenizer_12bit.msgpack

Auto-detects tokenizer vs generator checkpoints from their keys and applies
all rename rules (OIHW->HWIO, packed QKV split, token_emb->input_proj).
"""

from __future__ import annotations

import argparse

import jax
import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True, help=".bin/.pth torch checkpoint")
    parser.add_argument("--output", required=True, help=".msgpack output path")
    args = parser.parse_args(argv)

    from maskbit_tpu.core.checkpoint import load_pretrained, save_pretrained

    variables = load_pretrained(args.input)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables))
    save_pretrained(variables, args.output)
    print(f"converted {args.input} -> {args.output} ({n_params / 1e6:.1f}M params)")


if __name__ == "__main__":
    main()
