"""ConvVQModel: the Stage-I tokenizer (encoder -> quantizer -> decoder).

Parity target: reference modeling/conv_vqgan.py:14-152, including
  * quantizer factory (lookup | lookup-free | vae)   (:14-36)
  * encode / decode / decode_tokens / forward        (:71-132)
  * decoder-finetune mode: frozen encoder + zeroed quantizer losses (:134-152)

TPU-first: images and latents are NHWC end-to-end; `decode_tokens` is a pure
function of integer tokens so the whole generator sampling loop (including
the final decode) stays inside one jit.
"""

from __future__ import annotations

import math
from typing import Any, Mapping, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from maskbit_tpu.nn.conv import ConvDecoder, ConvEncoder
from maskbit_tpu.quantizers import LookupFreeQuantizer, SimpleVectorizer

Dtype = Any


def _make_quantizer(cfg: "TokenizerSpec"):
    if cfg.quantizer_type == "lookup":
        return SimpleVectorizer(
            codebook_size=cfg.codebook_size,
            token_size=cfg.token_size,
            commitment_cost=cfg.commitment_cost,
            entropy_loss_weight=cfg.entropy_loss_weight,
            entropy_loss_temperature=cfg.entropy_loss_temperature,
            entropy_gamma=cfg.entropy_gamma,
            use_l2_normalisation=cfg.use_l2_normalisation,
            name="quantize",
        )
    if cfg.quantizer_type == "lookup-free":
        return LookupFreeQuantizer(
            token_bits=cfg.token_size,
            commitment_cost=cfg.commitment_cost,
            entropy_loss_weight=cfg.entropy_loss_weight,
            entropy_loss_temperature=cfg.entropy_loss_temperature,
            entropy_gamma=cfg.entropy_gamma,
            entropy_chunk_size=cfg.entropy_chunk_size,
            name="quantize",
        )
    if cfg.quantizer_type == "vae":
        raise NotImplementedError("VAE bottleneck is not supported (matches reference).")
    raise ValueError(f"Unknown vector quantizer class {cfg.quantizer_type!r}")


class ConvVQModel(nn.Module):
    """Stage-I tokenizer. Construct via `ConvVQModel.from_config(cfg)`."""

    num_channels: int = 3
    hidden_channels: int = 128
    channel_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_resolutions: int = 5
    num_res_blocks: int = 2
    num_res_blocks_decoder: Optional[int] = None
    token_size: int = 12
    codebook_size: int = 4096
    quantizer_type: str = "lookup-free"
    commitment_cost: float = 0.25
    # same default as from_config's absent-key fallback: the two
    # construction paths must build the same training loss
    entropy_loss_weight: float = 0.0
    entropy_loss_temperature: float = 0.01
    entropy_gamma: float = 1.0
    entropy_chunk_size: int = 4096  # streamed-entropy chunk (>=14-bit LFQ)
    use_l2_normalisation: bool = False
    sample_with_conv: bool = True
    legacy: bool = False
    finetune_decoder: bool = False
    dtype: Dtype = jnp.float32

    @classmethod
    def from_config(cls, cfg, legacy: bool = False, finetune_decoder: Optional[bool] = None,
                    dtype: Dtype = jnp.float32) -> "ConvVQModel":
        """Build from a `model.vq_model` config node (reference YAML schema)."""
        if finetune_decoder is None:
            finetune_decoder = cfg.get("finetune_decoder", False)
        return cls(
            num_channels=cfg.get("num_channels", 3),
            hidden_channels=cfg.get("hidden_channels", 128),
            channel_mult=tuple(cfg.get("channel_mult", (1, 1, 2, 2, 4))),
            num_resolutions=cfg.get("num_resolutions", 5),
            num_res_blocks=cfg.get("num_res_blocks", 2),
            num_res_blocks_decoder=cfg.get("num_res_blocks_decoder", None),
            token_size=cfg.get("token_size", 12),
            codebook_size=cfg.get("codebook_size", 4096),
            quantizer_type=cfg.get("quantizer_type", "lookup-free"),
            commitment_cost=cfg.get("commitment_cost", 0.25),
            entropy_loss_weight=cfg.get("entropy_loss_weight", 0.0),
            entropy_loss_temperature=cfg.get("entropy_loss_temperature", 0.01),
            entropy_gamma=cfg.get("entropy_gamma", 1.0),
            entropy_chunk_size=cfg.get("entropy_chunk_size", 4096),
            use_l2_normalisation=cfg.get("use_l2_normalisation", False),
            sample_with_conv=cfg.get("sample_with_conv", True),
            legacy=legacy,
            finetune_decoder=finetune_decoder,
            dtype=dtype,
        )

    def setup(self):
        self.encoder = ConvEncoder(
            num_channels=self.num_channels,
            hidden_channels=self.hidden_channels,
            channel_mult=tuple(self.channel_mult),
            num_resolutions=self.num_resolutions,
            num_res_blocks=self.num_res_blocks,
            token_size=self.token_size,
            sample_with_conv=self.sample_with_conv,
            dtype=self.dtype,
        )
        self.decoder = ConvDecoder(
            num_channels=self.num_channels,
            hidden_channels=self.hidden_channels,
            channel_mult=tuple(self.channel_mult),
            num_resolutions=self.num_resolutions,
            num_res_blocks=self.num_res_blocks,
            num_res_blocks_decoder=self.num_res_blocks_decoder,
            token_size=self.token_size,
            quantizer_type=self.quantizer_type,
            legacy=self.legacy,
            dtype=self.dtype,
        )
        self.quantize = _make_quantizer(self)

    def encode(self, x: jnp.ndarray, train: bool = False
               ) -> Tuple[jnp.ndarray, Mapping[str, jnp.ndarray]]:
        """NHWC image -> (quantized NHWC latent, quantizer result dict)."""
        z = self.encoder(x)
        return self.quantize(z, train=train)

    def decode(self, z_quantized: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(z_quantized)

    def tokenize(self, x: jnp.ndarray) -> jnp.ndarray:
        """NHWC image -> integer token grid (b, h', w')."""
        _, result_dict = self.encode(x, train=False)
        return result_dict["min_encoding_indices"]

    def decode_tokens(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """Integer tokens (b, n) -> decoded NHWC image."""
        z_quantized = self.quantize.get_codebook_entry(tokens)
        ss = int(math.isqrt(int(tokens.shape[1])))
        z_quantized = z_quantized.reshape(tokens.shape[0], ss, ss, -1)
        return self.decode(z_quantized)

    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, Mapping[str, jnp.ndarray]]:
        if self.finetune_decoder:
            z_quantized, result_dict = self._finetuning_encoder_forward(x)
        else:
            z_quantized, result_dict = self.encode(x, train=train)
        decoded = self.decode(z_quantized)
        # expose the latent for the adaptive-GAN-weight vjp in the trainer
        result_dict = dict(result_dict, z_quantized=z_quantized)
        return decoded, result_dict

    def _finetuning_encoder_forward(self, x: jnp.ndarray
                                    ) -> Tuple[jnp.ndarray, Mapping[str, jnp.ndarray]]:
        """Frozen-encoder forward with zeroed quantizer losses (reference :134-152)."""
        z_quantized, result_dict = self.encode(x, train=False)
        z_quantized = jax.lax.stop_gradient(z_quantized)
        result_dict = dict(result_dict)
        for key in ("quantizer_loss", "commitment_loss", "codebook_loss", "entropy_loss"):
            if key in result_dict:
                result_dict[key] = result_dict[key] * 0.0
        return z_quantized, result_dict
