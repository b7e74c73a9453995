"""VQGAN+ convolutional building blocks — TPU-native (NHWC, XLA SAME padding).

Parity targets (reference modeling/modules/autoencoder.py):
  * Conv2dSame           :7-36   — XLA's native SAME convention computes the
                                   identical asymmetric [pad//2, pad-pad//2]
                                   split, so plain padding="SAME" suffices.
  * GroupNorm(32, 1e-6)  :39-43
  * ResidualBlock        :46-96  — incl. the reference quirk that the 1x1
                                   `nin_shortcut` is applied to the *output*
                                   (not the input) when in!=out channels
                                   (autoencoder.py:93-94); replicated here so
                                   converted checkpoints match bit-for-bit.
  * Residual/Down/Up stages :99-227
  * ConvEncoder          :230-286 (no attention anywhere, unlike taming)
  * ConvDecoder(+Legacy) :289-423

All activations flow NHWC so convs tile directly onto the MXU; norms run in
float32 regardless of the compute dtype.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def group_norm(name: str, dtype=jnp.float32) -> nn.GroupNorm:
    """GroupNorm with 32 groups, eps 1e-6 (computed in float32)."""
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32, name=name)


class ResidualBlock(nn.Module):
    in_channels: int
    out_channels: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_channels = self.in_channels if self.out_channels is None else self.out_channels
        residual = x

        h = group_norm("norm1")(x).astype(self.dtype)
        h = nn.silu(h)
        h = nn.Conv(out_channels, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv1")(h)

        h = group_norm("norm2")(h).astype(self.dtype)
        h = nn.silu(h)
        h = nn.Conv(out_channels, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv2")(h)

        if self.in_channels != out_channels:
            # Reference quirk: shortcut conv consumes the transformed output.
            residual = nn.Conv(out_channels, (1, 1), padding="SAME", use_bias=False,
                               dtype=self.dtype, name="nin_shortcut")(h)

        return h + residual


class ResidualStage(nn.Module):
    in_channels: int
    out_channels: int
    num_res_blocks: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = self.in_channels
        for i in range(self.num_res_blocks):
            x = ResidualBlock(in_ch, self.out_channels, dtype=self.dtype,
                              name=f"res_blocks_{i}")(x)
            in_ch = self.out_channels
        return x


class DownsamplingStage(nn.Module):
    in_channels: int
    out_channels: int
    num_res_blocks: int
    sample_with_conv: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = self.in_channels
        for i in range(self.num_res_blocks):
            x = ResidualBlock(in_ch, self.out_channels, dtype=self.dtype,
                              name=f"res_blocks_{i}")(x)
            in_ch = self.out_channels
        if self.sample_with_conv:
            x = nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding="SAME",
                        dtype=self.dtype, name="down_conv")(x)
        else:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x


class UpsamplingStage(nn.Module):
    in_channels: int
    out_channels: int
    num_res_blocks: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = self.in_channels
        for i in range(self.num_res_blocks):
            x = ResidualBlock(in_ch, self.out_channels, dtype=self.dtype,
                              name=f"res_blocks_{i}")(x)
            in_ch = self.out_channels
        # nearest-neighbour 2x upsample: exact repeat along H and W
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        x = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    dtype=self.dtype, name="upsample_conv")(x)
        return x


class ConvEncoder(nn.Module):
    """256x256x3 -> 16x16xtoken_size downstack (with channel_mult [1,1,2,2,4])."""

    num_channels: int = 3
    hidden_channels: int = 128
    channel_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_resolutions: int = 5
    num_res_blocks: int = 2
    token_size: int = 12
    sample_with_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        x = pixel_values.astype(self.dtype)
        x = nn.Conv(self.hidden_channels, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv_in")(x)

        in_channel_mult = (1,) + tuple(self.channel_mult)
        out_channels = self.hidden_channels
        for i_level in range(self.num_resolutions):
            in_channels = self.hidden_channels * in_channel_mult[i_level]
            out_channels = self.hidden_channels * in_channel_mult[i_level + 1]
            if i_level < self.num_resolutions - 1:
                x = DownsamplingStage(in_channels, out_channels, self.num_res_blocks,
                                      self.sample_with_conv, dtype=self.dtype,
                                      name=f"down_{i_level}")(x)
            else:
                x = ResidualStage(in_channels, out_channels, self.num_res_blocks,
                                  dtype=self.dtype, name=f"down_{i_level}")(x)

        x = ResidualStage(out_channels, out_channels, self.num_res_blocks,
                          dtype=self.dtype, name="mid")(x)

        x = group_norm("norm_out")(x).astype(self.dtype)
        x = nn.silu(x)
        x = nn.Conv(self.token_size, (1, 1), padding="SAME",
                    dtype=self.dtype, name="conv_out")(x)
        return x


class ConvDecoder(nn.Module):
    """Mirror upstack: 16x16xtoken_size -> 256x256x3."""

    num_channels: int = 3
    hidden_channels: int = 128
    channel_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_resolutions: int = 5
    num_res_blocks: int = 2
    token_size: int = 12
    quantizer_type: str = "lookup-free"
    num_res_blocks_decoder: Optional[int] = None
    legacy: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z_quantized: jnp.ndarray) -> jnp.ndarray:
        # explicit None check, not `or`: the reference's cfg.get semantics
        # honor num_res_blocks_decoder: 0 (zero decoder res blocks per stage)
        num_res_blocks = (
            self.num_res_blocks
            if self.legacy or self.num_res_blocks_decoder is None
            else self.num_res_blocks_decoder
        )
        block_in = self.hidden_channels * self.channel_mult[self.num_resolutions - 1]
        in_channel_mult = tuple(self.channel_mult) + (self.channel_mult[-1],)

        from maskbit_tpu.parallel.mesh import constrain_batch

        x = z_quantized.astype(self.dtype)
        x = nn.Conv(block_in, (3, 3), padding="SAME", dtype=self.dtype, name="conv_in")(x)
        x = ResidualStage(block_in, block_in, num_res_blocks, dtype=self.dtype,
                          name="mid")(x)

        # Stage i_level runs at the (num_resolutions-1-i)-th position. The
        # reference's ConvDecoder stores stages lowest-resolution-first and
        # iterates forward; ConvDecoderLegacy stores them reversed and
        # iterates reversed — identical compute, different param names
        # (up_0..up_{L-1} indexing flips). `legacy` mirrors the naming only.
        order = list(reversed(range(self.num_resolutions)))
        out_channels = block_in
        for pos, i_level in enumerate(order):
            in_channels = self.hidden_channels * in_channel_mult[i_level + 1]
            out_channels = self.hidden_channels * in_channel_mult[i_level]
            name = f"up_{i_level if self.legacy else pos}"
            if i_level > 0:
                x = UpsamplingStage(in_channels, out_channels, num_res_blocks,
                                    dtype=self.dtype, name=name)(x)
            else:
                x = ResidualStage(in_channels, out_channels, num_res_blocks,
                                  dtype=self.dtype, name=name)(x)
            # keep decode activations (and, via the transpose rule, their
            # backward cotangents) batch-sharded at stage boundaries — see
            # parallel.mesh.constrain_batch
            x = constrain_batch(x)

        x = group_norm("norm_out")(x).astype(self.dtype)
        x = nn.silu(x)
        x = nn.Conv(self.num_channels, (3, 3), padding="SAME",
                    dtype=self.dtype, name="conv_out")(x)
        return x
