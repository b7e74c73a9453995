"""LPIPS learned perceptual metric (VGG16 backbone + learned 1x1 heads).

Parity target: reference modeling/modules/lpips.py:11-130 — VGG16 feature
slices (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3), input scaling layer,
unit-normalized feature differences, 1x1 linear heads, spatial average.

Weights: the LPIPS head weights ship with the reference
(`pretrained/vgg_lpips.pth`, 7 KB); the VGG16 backbone weights are the
standard torchvision IMAGENET1K_V1 ones — both convert via
`convert_lpips_weights` / `convert_vgg16_features`. When no weights are
given the module initializes randomly (architecture tests only — a random
LPIPS is not a meaningful metric).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Mapping, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

Dtype = Any

# VGG16 `features` layout: conv indices and the slice boundaries used by LPIPS
_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]
# torch `features` indices of convs: 0,2, 5,7, 10,12,14, 17,19,21, 24,26,28
_SLICE_AFTER_CONV = {1: 0, 3: 1, 6: 2, 9: 3, 12: 4}  # conv ordinal -> slice id
LPIPS_CHANNELS = (64, 128, 256, 512, 512)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 conv trunk emitting the five LPIPS feature slices (NHWC)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        outputs: List[jnp.ndarray] = [None] * 5
        conv_idx = 0
        for item in _VGG16_CFG:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(item, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"conv_{conv_idx}")(x)
            x = nn.relu(x)
            if conv_idx in _SLICE_AFTER_CONV:
                outputs[_SLICE_AFTER_CONV[conv_idx]] = x
            conv_idx += 1
        return outputs


class LPIPS(nn.Module):
    """val = sum_k spatial_mean(lin_k((norm(f_k(x)) - norm(f_k(y)))^2)).

    Inputs are NHWC images in [0, 1] (the scaling layer rescales to [-1, 1]
    and applies the LPIPS shift/scale, reference lpips.py:55-63).
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        net = VGG16Features(dtype=self.dtype, name="net")

        def scale(x):
            x = x.astype(jnp.float32) * 2.0 - 1.0
            return ((x - _SHIFT) / _SCALE).astype(self.dtype)

        feats0 = net(scale(input))
        feats1 = net(scale(target))

        val = 0.0
        for k in range(5):
            f0 = _unit_normalize(feats0[k])
            f1 = _unit_normalize(feats1[k])
            diff = (f0 - f1) ** 2
            lin = nn.Conv(1, (1, 1), use_bias=False, dtype=jnp.float32,
                          name=f"lin_{k}")(diff.astype(jnp.float32))
            val = val + jnp.mean(lin, axis=(1, 2), keepdims=True)
        return val  # (b, 1, 1, 1)


def _unit_normalize(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True))
    return (x / (norm + eps)).astype(x.dtype)


def convert_vgg16_features(state: Mapping[str, np.ndarray]) -> Dict:
    """torchvision vgg16().features state dict -> VGG16Features params.

    Accepts either bare `features.{i}.weight` keys or the LPIPS-nested
    `net.slice{k}.{i}.weight` naming."""
    # torch `features` sequential index -> conv ordinal
    conv_positions = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    pos_to_ordinal = {p: i for i, p in enumerate(conv_positions)}
    params: Dict = {}
    for key, value in state.items():
        parts = key.split(".")
        if parts[-1] not in ("weight", "bias"):
            continue
        idx = int(parts[-2])
        if idx not in pos_to_ordinal:
            continue
        name = f"conv_{pos_to_ordinal[idx]}"
        node = params.setdefault(name, {})
        if parts[-1] == "weight":
            node["kernel"] = np.asarray(value).transpose(2, 3, 1, 0)
        else:
            node["bias"] = np.asarray(value)
    return params


def convert_lpips_weights(
    lpips_state: Mapping[str, np.ndarray],
    vgg_state: Optional[Mapping[str, np.ndarray]] = None,
) -> Dict:
    """Reference vgg_lpips.pth (lin heads, keys `lin{k}.model.1.weight`)
    [+ torchvision VGG16] -> full LPIPS params tree."""
    params: Dict = {}
    for key, value in lpips_state.items():
        if ".model." in key and key.endswith("weight"):
            k = int(key.split(".")[0][len("lin"):])
            params[f"lin_{k}"] = {"kernel": np.asarray(value).transpose(2, 3, 1, 0)}
    if vgg_state is not None:
        params["net"] = convert_vgg16_features(vgg_state)
    return {"params": params}


def bundled_lin_weights_path() -> str:
    """The repo-bundled converted LPIPS lin heads (the reference ships these
    in-repo at pretrained/vgg_lpips.pth; converted by
    tools/convert_lpips_lin.py — the VGG16 backbone stays env-gated)."""
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "assets", "vgg_lpips_lin.msgpack")


def load_lpips_params(lpips_path: str, vgg_path: Optional[str] = None) -> Dict:
    from maskbit_tpu.compat.torch_convert import load_torch_state_dict

    if lpips_path.endswith(".msgpack"):
        from flax import serialization

        with open(lpips_path, "rb") as f:
            params = serialization.msgpack_restore(f.read())
    else:
        params = convert_lpips_weights(load_torch_state_dict(lpips_path))["params"]
    if vgg_path:
        params["net"] = convert_vgg16_features(load_torch_state_dict(vgg_path))
    return {"params": params}
