"""ConvNeXt-Small backbone for the perceptual loss.

The reference's second perceptual option
(modeling/modules/perceptual_loss.py:22-24: torchvision convnext_small,
return_nodes features/classifier). Implemented in Flax (NHWC) with a
converter from the torchvision IMAGENET1K_V1 state dict.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from maskbit_tpu.ops.activations import gelu_erf

Dtype = Any

DEPTHS = (3, 3, 27, 3)
DIMS = (96, 192, 384, 768)


class CNBlock(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        # depthwise 7x7
        x = nn.Conv(self.dim, (7, 7), padding=((3, 3), (3, 3)),
                    feature_group_count=self.dim, dtype=self.dtype, name="dwconv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, name="pw1")(x)
        # fusable exact gelu — lax.erf breaks matmul-epilogue fusion on
        # TPU (ops/activations.py); this runs inside the Stage-I loss
        x = gelu_erf(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pw2")(x)
        gamma = self.param("layer_scale", nn.initializers.constant(1e-6), (self.dim,))
        return residual + x * gamma.astype(self.dtype)


class ConvNeXtSmall(nn.Module):
    """torchvision-layout ConvNeXt-S (NHWC). Returns (features, logits)."""

    num_classes: int = 1000
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # stem: 4x4 stride-4 conv + LayerNorm
        x = nn.Conv(DIMS[0], (4, 4), strides=(4, 4), dtype=self.dtype, name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="stem_norm")(x).astype(self.dtype)

        for stage, (depth, dim) in enumerate(zip(DEPTHS, DIMS)):
            if stage > 0:
                x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                 name=f"down{stage}_norm")(x).astype(self.dtype)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), dtype=self.dtype,
                            name=f"down{stage}_conv")(x)
            for block in range(depth):
                x = CNBlock(dim, dtype=self.dtype, name=f"stage{stage}_block{block}")(x)

        features = x
        pooled = jnp.mean(x, axis=(1, 2))
        pooled = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                              name="head_norm")(pooled).astype(self.dtype)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="head_fc")(pooled)
        return features, logits


def convert_convnext_small_state(state: Mapping[str, np.ndarray]) -> Dict:
    """torchvision convnext_small state dict -> ConvNeXtSmall params."""
    params: Dict = {}

    def put(path: str, value: np.ndarray):
        node = params
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def conv(t, f):
        put(f"{f}/kernel", np.asarray(state[f"{t}.weight"]).transpose(2, 3, 1, 0))
        if f"{t}.bias" in state:
            put(f"{f}/bias", np.asarray(state[f"{t}.bias"]))

    def norm(t, f):
        put(f"{f}/scale", np.asarray(state[f"{t}.weight"]))
        put(f"{f}/bias", np.asarray(state[f"{t}.bias"]))

    def dense(t, f):
        put(f"{f}/kernel", np.asarray(state[f"{t}.weight"]).T)
        put(f"{f}/bias", np.asarray(state[f"{t}.bias"]))

    conv("features.0.0", "stem_conv")
    norm("features.0.1", "stem_norm")
    # torchvision features index: stages at 1,3,5,7; downsamples at 2,4,6
    for stage, depth in enumerate(DEPTHS):
        tv_idx = 1 + 2 * stage
        if stage > 0:
            norm(f"features.{tv_idx - 1}.0", f"down{stage}_norm")
            conv(f"features.{tv_idx - 1}.1", f"down{stage}_conv")
        for block in range(depth):
            t = f"features.{tv_idx}.{block}"
            f = f"stage{stage}_block{block}"
            conv(f"{t}.block.0", f"{f}/dwconv")
            norm(f"{t}.block.2", f"{f}/norm")
            dense(f"{t}.block.3", f"{f}/pw1")
            dense(f"{t}.block.5", f"{f}/pw2")
            put(f"{f}/layer_scale", np.asarray(state[f"{t}.layer_scale"]).reshape(-1))
    norm("classifier.0", "head_norm")
    dense("classifier.2", "head_fc")
    return {"params": {"model": params}}
