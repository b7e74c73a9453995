"""PatchGAN discriminators.

Parity targets (reference modeling/modules/discriminator.py):
  * BlurBlock               :12-63  — anti-aliased stride-2 downsample with a
                                      fixed separable blur kernel (1,2,1)/(1,3,3,1)/(1,4,6,4,1)
  * NLayerDiscriminatorv2   :66-153 — 5x5 conv in, per-stage 3x3 conv +
                                      (AvgPool|Blur) + GroupNorm(32, eps 1e-5) +
                                      LeakyReLU(0.1)|SiLU, AdaptiveMaxPool(16,16),
                                      1x1 + 5x5 logits head
  * OriginalNLayerDiscriminator :156-209 — Pix2Pix-style with BatchNorm

NHWC throughout; the blur is a depthwise conv with a constant kernel.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import lax

Dtype = Any

BLUR_KERNEL_MAP = {
    3: (1, 2, 1),
    4: (1, 3, 3, 1),
    5: (1, 4, 6, 4, 1),
}


def blur_pool_2d(x: jnp.ndarray, kernel: Tuple[int, ...]) -> jnp.ndarray:
    """Anti-aliased 2x downsample: depthwise stride-2 conv with a fixed
    normalized outer-product blur kernel (reference BlurBlock)."""
    k1 = np.asarray(kernel, np.float32)
    k2 = np.outer(k1, k1)
    k2 /= k2.sum()
    c = x.shape[-1]
    # depthwise: HWIO with I=1, feature_group_count=C
    kern = jnp.asarray(k2, x.dtype)[:, :, None, None] * jnp.ones((1, 1, 1, c), x.dtype)
    return lax.conv_general_dilated(
        x, kern, window_strides=(2, 2), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def adaptive_max_pool_2d(x: jnp.ndarray, output_size: Tuple[int, int]) -> jnp.ndarray:
    """AdaptiveMaxPool2d for inputs whose spatial dims are divisible by the
    output size (the only case the reference architecture exercises:
    256 input -> 16x16 after 4 stages)."""
    h, w = x.shape[1], x.shape[2]
    oh, ow = output_size
    if h == oh and w == ow:
        return x
    if h % oh != 0 or w % ow != 0:
        raise ValueError(f"adaptive_max_pool_2d requires divisible sizes, got {(h, w)} -> {(oh, ow)}")
    kh, kw = h // oh, w // ow
    return nn.max_pool(x, (kh, kw), strides=(kh, kw))


def _activation(name: str):
    if name == "leaky_relu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.1)
    return nn.silu


class NLayerDiscriminatorv2(nn.Module):
    num_channels: int = 3
    hidden_channels: int = 64
    num_stages: int = 3
    activation_fn: str = "leaky_relu"
    blur_resample: bool = False
    blur_kernel_size: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.num_stages > 0, "Discriminator cannot have 0 stages"
        act = _activation(self.activation_fn)
        in_channel_mult = (1,) + tuple(2**t for t in range(self.num_stages))

        x = x.astype(self.dtype)
        x = nn.Conv(self.hidden_channels, (5, 5), padding="SAME",
                    dtype=self.dtype, name="block_in_conv")(x)
        x = act(x)

        for i_level in range(self.num_stages):
            out_channels = self.hidden_channels * in_channel_mult[i_level + 1]
            x = nn.Conv(out_channels, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"block_{i_level}_conv")(x)
            if self.blur_resample:
                x = blur_pool_2d(x, BLUR_KERNEL_MAP[self.blur_kernel_size])
            else:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            # torch.nn.GroupNorm default eps (1e-5), unlike the autoencoder's 1e-6
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32,
                             name=f"block_{i_level}_norm")(x).astype(self.dtype)
            x = act(x)

        x = adaptive_max_pool_2d(x, (16, 16))

        x = nn.Conv(x.shape[-1], (1, 1), padding="SAME", dtype=self.dtype,
                    name="to_logits_conv1")(x)
        x = act(x)
        x = nn.Conv(1, (5, 5), padding="SAME", dtype=self.dtype,
                    name="to_logits_conv2")(x)
        return x


class OriginalNLayerDiscriminator(nn.Module):
    """Pix2Pix PatchGAN (reference :156-209). BatchNorm runs in train mode
    during GAN training, matching torch defaults."""

    num_channels: int = 3
    hidden_channels: int = 64
    num_stages: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        init = nn.initializers.normal(stddev=0.02)  # discriminator_weights_init
        x = x.astype(self.dtype)
        x = nn.Conv(self.hidden_channels, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    kernel_init=init, dtype=self.dtype, name="conv_0")(x)
        x = nn.leaky_relu(x, negative_slope=0.2)

        nf_mult = 1
        for n in range(1, self.num_stages):
            nf_mult = min(2**n, 8)
            x = nn.Conv(self.hidden_channels * nf_mult, (4, 4), strides=(2, 2),
                        padding=((1, 1), (1, 1)), use_bias=False, kernel_init=init,
                        dtype=self.dtype, name=f"conv_{n}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             dtype=jnp.float32, name=f"bn_{n}")(x).astype(self.dtype)
            x = nn.leaky_relu(x, negative_slope=0.2)

        nf_mult = min(2**self.num_stages, 8)
        x = nn.Conv(self.hidden_channels * nf_mult, (4, 4), strides=(1, 1),
                    padding=((1, 1), (1, 1)), use_bias=False, kernel_init=init,
                    dtype=self.dtype, name=f"conv_{self.num_stages}")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name=f"bn_{self.num_stages}")(x).astype(self.dtype)
        x = nn.leaky_relu(x, negative_slope=0.2)

        x = nn.Conv(1, (4, 4), strides=(1, 1), padding=((1, 1), (1, 1)),
                    kernel_init=init, dtype=self.dtype, name="conv_out")(x)
        return x


def create_discriminator(cfg, dtype: Dtype = jnp.float32):
    """Factory mirroring reference gan_utils.create_discriminator (:166-190)."""
    name = cfg.get("name", "VQGAN+Discriminator")
    if name == "Original":
        return OriginalNLayerDiscriminator(
            num_channels=cfg.get("num_channels", 3),
            hidden_channels=cfg.get("hidden_channels", 64),
            num_stages=cfg.get("num_stages", 3),
            dtype=dtype,
        )
    if name == "VQGAN+Discriminator":
        return NLayerDiscriminatorv2(
            num_channels=cfg.get("num_channels", 3),
            hidden_channels=cfg.get("hidden_channels", 64),
            num_stages=cfg.get("num_stages", 3),
            blur_resample=cfg.get("blur_resample", False),
            blur_kernel_size=cfg.get("blur_kernel_size", 4),
            dtype=dtype,
        )
    raise ValueError(f"Discriminator {name!r} is not implemented.")
