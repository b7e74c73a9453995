"""Taming-Transformers VQGAN (external baseline, inference/debugging).

Parity target: reference modeling/taming_vqgan.py:19-129 and
modeling/taming/taming_autoencoder.py — the CompVis encoder/decoder WITH
single-head spatial AttnBlocks at attn_resolutions=(16,) and in the mid
block, asymmetric-padded stride-2 downsampling, quant/post-quant 1x1 convs,
[-1, 1] input/output scaling, and the classic VQ codebook (1024 x 256).

Param names mirror the torch module tree so the generic tokenizer-state
converter maps checkpoints directly (with `loss.*` keys filtered, reference
taming_vqgan.py:101-113).
"""

from __future__ import annotations

import math
from typing import Any, Mapping, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from maskbit_tpu.quantizers import SimpleVectorizer

Dtype = Any


def _norm(name: str) -> nn.GroupNorm:
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32, name=name)


class ResnetBlock(nn.Module):
    in_channels: int
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _norm("norm1")(x).astype(self.dtype)
        h = nn.swish(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv1")(h)
        h = _norm("norm2")(h).astype(self.dtype)
        h = nn.swish(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2")(h)
        if self.in_channels != self.out_channels:
            # taming uses the PROPER input shortcut (unlike vqgan+'s quirk)
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention over the h*w grid."""

    in_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = _norm("norm")(x).astype(self.dtype)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(y).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(y).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(y).reshape(b, h * w, c)
        attn = jnp.einsum("bqc,bkc->bqk", q, k) * (c**-0.5)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class Downsample(nn.Module):
    in_channels: int
    with_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            # asymmetric (0,1,0,1) pad + VALID stride-2 conv (taming :49-56)
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return nn.Conv(self.in_channels, (3, 3), strides=(2, 2), padding="VALID",
                           dtype=self.dtype, name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Upsample(nn.Module):
    in_channels: int
    with_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if self.with_conv:
            x = nn.Conv(self.in_channels, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name="conv")(x)
        return x


class _DownLevel(nn.Module):
    block_specs: Sequence[Tuple[int, int]]
    use_attn: bool
    downsample: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for j, (cin, cout) in enumerate(self.block_specs):
            x = ResnetBlock(cin, cout, dtype=self.dtype, name=f"block_{j}")(x)
            if self.use_attn:
                x = AttnBlock(cout, dtype=self.dtype, name=f"attn_{j}")(x)
        if self.downsample:
            x = Downsample(self.block_specs[-1][1], dtype=self.dtype, name="downsample")(x)
        return x


class _UpLevel(nn.Module):
    block_specs: Sequence[Tuple[int, int]]
    use_attn: bool
    upsample: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for j, (cin, cout) in enumerate(self.block_specs):
            x = ResnetBlock(cin, cout, dtype=self.dtype, name=f"block_{j}")(x)
            if self.use_attn:
                x = AttnBlock(cout, dtype=self.dtype, name=f"attn_{j}")(x)
        if self.upsample:
            x = Upsample(self.block_specs[-1][1], dtype=self.dtype, name="upsample")(x)
        return x


class _Mid(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock(self.channels, self.channels, dtype=self.dtype, name="block_1")(x)
        x = AttnBlock(self.channels, dtype=self.dtype, name="attn_1")(x)
        x = ResnetBlock(self.channels, self.channels, dtype=self.dtype, name="block_2")(x)
        return x


class TamingEncoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    resolution: int = 256
    z_channels: int = 256
    double_z: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        num_resolutions = len(self.ch_mult)
        x = nn.Conv(self.ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_in")(x.astype(self.dtype))
        curr_res = self.resolution
        in_ch_mult = (1,) + tuple(self.ch_mult)
        for i_level in range(num_resolutions):
            block_in = self.ch * in_ch_mult[i_level]
            block_out = self.ch * self.ch_mult[i_level]
            specs = []
            cin = block_in
            for _ in range(self.num_res_blocks):
                specs.append((cin, block_out))
                cin = block_out
            is_last = i_level == num_resolutions - 1
            x = _DownLevel(specs, curr_res in self.attn_resolutions, not is_last,
                           dtype=self.dtype, name=f"down_{i_level}")(x)
            if not is_last:
                curr_res //= 2

        block_in = self.ch * self.ch_mult[-1]
        x = _Mid(block_in, dtype=self.dtype, name="mid")(x)
        x = _norm("norm_out")(x).astype(self.dtype)
        x = nn.swish(x)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        x = nn.Conv(out_ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_out")(x)
        return x


class TamingDecoder(nn.Module):
    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    resolution: int = 256
    z_channels: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        num_resolutions = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[num_resolutions - 1]
        curr_res = self.resolution // 2 ** (num_resolutions - 1)

        x = nn.Conv(block_in, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_in")(z.astype(self.dtype))
        x = _Mid(block_in, dtype=self.dtype, name="mid")(x)

        # process levels from lowest resolution (i_level = L-1) down to 0;
        # param names keep the torch indexing (up.insert(0, ...))
        cin = block_in
        for i_level in reversed(range(num_resolutions)):
            block_out = self.ch * self.ch_mult[i_level]
            specs = []
            c = cin
            for _ in range(self.num_res_blocks + 1):
                specs.append((c, block_out))
                c = block_out
            x = _UpLevel(specs, curr_res in self.attn_resolutions, i_level != 0,
                         dtype=self.dtype, name=f"up_{i_level}")(x)
            cin = block_out
            if i_level != 0:
                curr_res *= 2

        x = _norm("norm_out")(x).astype(self.dtype)
        x = nn.swish(x)
        x = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_out")(x)
        return x


class OriginalVQModel(nn.Module):
    """Taming VQGAN wrapper with [-1,1] scaling and quant convs."""

    ch: int = 128
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    resolution: int = 256
    z_channels: int = 256
    codebook_size: int = 1024
    token_size: int = 256
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = TamingEncoder(
            ch=self.ch, ch_mult=tuple(self.ch_mult), num_res_blocks=self.num_res_blocks,
            attn_resolutions=tuple(self.attn_resolutions), resolution=self.resolution,
            z_channels=self.z_channels, double_z=False, dtype=self.dtype,
        )
        self.decoder = TamingDecoder(
            ch=self.ch, out_ch=3, ch_mult=tuple(self.ch_mult),
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=tuple(self.attn_resolutions), resolution=self.resolution,
            z_channels=self.z_channels, dtype=self.dtype,
        )
        self.quantize = SimpleVectorizer(
            codebook_size=self.codebook_size, token_size=self.token_size,
            commitment_cost=0.25,
        )
        self.quant_conv = nn.Conv(self.token_size, (1, 1), dtype=self.dtype,
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(self.z_channels, (1, 1), dtype=self.dtype,
                                       name="post_quant_conv")

    def encode(self, x: jnp.ndarray, train: bool = False
               ) -> Tuple[jnp.ndarray, Mapping[str, jnp.ndarray]]:
        x = x * 2.0 - 1.0
        z = self.encoder(x)
        z = self.quant_conv(z)
        return self.quantize(z, train=train)

    def decode(self, z_quantized: jnp.ndarray) -> jnp.ndarray:
        z = self.post_quant_conv(z_quantized)
        decoded = self.decoder(z)
        return (decoded + 1.0) / 2.0

    def tokenize(self, x: jnp.ndarray) -> jnp.ndarray:
        _, result_dict = self.encode(x)
        return result_dict["min_encoding_indices"]

    def decode_tokens(self, tokens: jnp.ndarray) -> jnp.ndarray:
        z_quantized = self.quantize.get_codebook_entry(tokens)
        ss = int(math.isqrt(int(tokens.shape[1])))
        z_quantized = z_quantized.reshape(tokens.shape[0], ss, ss, -1)
        return self.decode(z_quantized)

    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, Mapping[str, jnp.ndarray]]:
        z_quantized, result_dict = self.encode(x, train=train)
        decoded = self.decode(z_quantized)
        return decoded, result_dict
