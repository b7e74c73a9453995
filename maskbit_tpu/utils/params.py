"""Parameter counting / model summaries (reference: torchinfo.summary
printouts at train_tokenizer.py:128-145 and BaseModel param counting)."""

from __future__ import annotations

import jax
import numpy as np


def count_params(tree) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(tree)))


def summarize_params(tree, name: str = "model") -> str:
    """Per-top-level-module parameter counts, human readable."""
    lines = [f"{name}: {count_params(tree) / 1e6:.2f}M params"]
    if isinstance(tree, dict):
        for key in sorted(tree):
            lines.append(f"  {key}: {count_params(tree[key]) / 1e6:.3f}M")
    return "\n".join(lines)
