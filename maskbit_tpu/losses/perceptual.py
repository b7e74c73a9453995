"""Perceptual loss on classifier logits or features (ResNet-50 backbone).

Parity target: reference modeling/modules/perceptual_loss.py:9-63 —
bilinear-resize both images to 224 (antialiased), ImageNet-normalize, run a
frozen ImageNet classifier, MSE between logits (default) or between
layer4 features + logits.

The ResNet-50 is implemented in Flax (NHWC, frozen BatchNorm running stats)
with a converter from the torchvision IMAGENET1K_V1 state dict. When no
weights are available the module can run with random init (useful for
tests; not a meaningful loss).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm using stored running stats as parameters."""

    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        return (x.astype(jnp.float32) - mean) * inv + bias


class Bottleneck(nn.Module):
    filters: int
    strides: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = FrozenBatchNorm(self.filters, name="bn1")(y).astype(self.dtype)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), strides=(self.strides, self.strides),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = FrozenBatchNorm(self.filters, name="bn2")(y).astype(self.dtype)
        y = nn.relu(y)
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = FrozenBatchNorm(self.filters * 4, name="bn3")(y).astype(self.dtype)
        if self.downsample:
            residual = nn.Conv(self.filters * 4, (1, 1), strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            residual = FrozenBatchNorm(self.filters * 4, name="downsample_bn")(residual).astype(self.dtype)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    """torchvision-layout ResNet-50 (NHWC). Returns (features, logits)."""

    num_classes: int = 1000
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(64, name="bn1")(x).astype(self.dtype)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        stage_sizes = (3, 4, 6, 3)
        for stage, num_blocks in enumerate(stage_sizes):
            filters = 64 * 2**stage
            for block in range(num_blocks):
                strides = 2 if (stage > 0 and block == 0) else 1
                x = Bottleneck(filters, strides=strides, downsample=(block == 0),
                               dtype=self.dtype, name=f"layer{stage + 1}_{block}")(x)

        features = x  # layer4 output
        pooled = jnp.mean(x, axis=(1, 2))
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(pooled)
        return features, logits


def resize_224_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """Antialiased bilinear resize to 224x224 (matches torch antialias=True
    closely; jax.image.resize applies the anti-aliasing filter when
    downscaling with linear methods)."""
    b, _, _, c = x.shape
    return jax.image.resize(x.astype(jnp.float32), (b, 224, 224, c), method="bilinear")


class PerceptualLoss(nn.Module):
    """MSE between frozen-classifier outputs of input and target (NHWC, [0,1])."""

    model_name: str = "resnet50"
    compute_on_logits: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        if self.model_name == "resnet50":
            model = ResNet50(dtype=self.dtype, name="model")
        elif self.model_name == "convnext_s":
            from maskbit_tpu.losses.convnext import ConvNeXtSmall

            model = ConvNeXtSmall(dtype=self.dtype, name="model")
        else:
            raise NotImplementedError(
                f"Perceptual backbone {self.model_name!r} not implemented; "
                "use 'resnet50' or 'convnext_s'."
            )

        def prep(x):
            x = resize_224_bilinear(x)
            return ((x - _IMAGENET_MEAN) / _IMAGENET_STD).astype(self.dtype)

        feat_in, logit_in = model(prep(input))
        feat_tg, logit_tg = model(prep(target))
        if self.compute_on_logits:
            return jnp.mean((logit_in.astype(jnp.float32) - logit_tg.astype(jnp.float32)) ** 2)
        loss = jnp.mean((feat_in.astype(jnp.float32) - feat_tg.astype(jnp.float32)) ** 2)
        loss += jnp.mean((logit_in.astype(jnp.float32) - logit_tg.astype(jnp.float32)) ** 2)
        return loss


def convert_resnet50_state(state: Mapping[str, np.ndarray]) -> Dict:
    """torchvision resnet50 state dict -> ResNet50 params tree."""
    params: Dict = {}

    def put(path: str, value: np.ndarray):
        node = params
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def bn(prefix_t: str, prefix_f: str):
        put(f"{prefix_f}/scale", np.asarray(state[f"{prefix_t}.weight"]))
        put(f"{prefix_f}/bias", np.asarray(state[f"{prefix_t}.bias"]))
        put(f"{prefix_f}/mean", np.asarray(state[f"{prefix_t}.running_mean"]))
        put(f"{prefix_f}/var", np.asarray(state[f"{prefix_t}.running_var"]))

    put("conv1/kernel", np.asarray(state["conv1.weight"]).transpose(2, 3, 1, 0))
    bn("bn1", "bn1")
    stage_sizes = (3, 4, 6, 3)
    for stage, num_blocks in enumerate(stage_sizes):
        for block in range(num_blocks):
            t = f"layer{stage + 1}.{block}"
            f = f"layer{stage + 1}_{block}"
            for conv in ("conv1", "conv2", "conv3"):
                put(f"{f}/{conv}/kernel", np.asarray(state[f"{t}.{conv}.weight"]).transpose(2, 3, 1, 0))
            for bni in ("bn1", "bn2", "bn3"):
                bn(f"{t}.{bni}", f"{f}/{bni}")
            if f"{t}.downsample.0.weight" in state:
                put(f"{f}/downsample_conv/kernel",
                    np.asarray(state[f"{t}.downsample.0.weight"]).transpose(2, 3, 1, 0))
                bn(f"{t}.downsample.1", f"{f}/downsample_bn")
    put("fc/kernel", np.asarray(state["fc.weight"]).T)
    put("fc/bias", np.asarray(state["fc.bias"]))
    return {"params": {"model": params}}
