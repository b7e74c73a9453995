"""Convert checkpoints between the reference `.bin` and native msgpack formats.

Forward (reference -> native zoo):
    python -m maskbit_tpu.cli.convert_checkpoint \
        --input /ckpts/maskbit_tokenizer_12bit.bin --output tokenizer_12bit.msgpack

Reverse (native zoo -> reference `pytorch_model.bin`, loads with
strict_loading=True in the reference's BaseModel.load_pretrained):
    python -m maskbit_tpu.cli.convert_checkpoint \
        --input tokenizer_12bit.msgpack --output pytorch_model.bin \
        --codebook-size 4096

Direction is inferred from the input extension (`.msgpack` -> torch export;
anything else -> torch import). Tokenizer vs generator checkpoints are
auto-detected from their keys in both directions. LFQ tokenizer export
needs --codebook-size to reconstruct the quantizer buffers (the LFQ
quantizer is embedding-free — nothing in the params encodes it).
"""

from __future__ import annotations

import argparse

import jax
import numpy as np


def _n_params(variables) -> float:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables)) / 1e6


def _export_torch(args) -> None:
    from maskbit_tpu.compat.torch_export import (
        export_generator_state,
        export_tokenizer_state,
        save_torch_state_dict,
    )
    from maskbit_tpu.core.checkpoint import load_pretrained

    variables = load_pretrained(args.input)
    params = variables.get("params", variables)
    if "transformer" in params or "pos_emb" in params:
        state = export_generator_state(
            variables, codebook_splits=args.codebook_splits)
        kind = "generator"
    else:
        state = export_tokenizer_state(
            variables, codebook_size=args.codebook_size)
        kind = "tokenizer"
    save_torch_state_dict(state, args.output)
    print(
        f"exported {kind} {args.input} -> {args.output} "
        f"({_n_params(variables):.1f}M params, {len(state)} torch keys)"
    )


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True,
                        help=".bin/.pth torch checkpoint or .msgpack zoo file")
    parser.add_argument("--output", required=True,
                        help=".msgpack output (import) or .bin output (export)")
    parser.add_argument("--codebook-size", type=int, default=None,
                        help="export only: LFQ tokenizer codebook size "
                             "(model.vq_model.codebook_size)")
    parser.add_argument("--codebook-splits", type=int, default=None,
                        help="export only: override the shape-derived "
                             "LFQBert codebook_splits")
    args = parser.parse_args(argv)

    if args.input.endswith(".msgpack"):
        _export_torch(args)
        return

    from maskbit_tpu.core.checkpoint import load_pretrained, save_pretrained

    variables = load_pretrained(args.input)
    save_pretrained(variables, args.output)
    print(f"converted {args.input} -> {args.output} ({_n_params(variables):.1f}M params)")


if __name__ == "__main__":
    main()
