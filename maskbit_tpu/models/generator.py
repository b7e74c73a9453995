"""Stage-II masked-token generators: `Bert` (embedding tables) and
`LFQBert` (embedding-free bit-token input — the paper's contribution).

Parity targets (reference modeling/bert.py):
  * Bert     :184-340 — per-split token embeddings (+1 mask id), class
              embedding (+1 drop label), learned pos-emb over seq_len+1,
              class token appended, weight-tied output head with a learned
              per-position bias.
  * LFQBert  :344-508 — tokens -> ±1 bits with masked positions zeroed
              (:440-454), concatenated split bits linearly projected in,
              plain linear prediction head reshaped to (b, n, m, c).

TPU-first: class-label dropout is a `jnp.where` (no in-place mutation), all
token/bit conversions are static-shape integer ops fused into the encoder.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from maskbit_tpu.nn.transformer import TransformerEncoder, layer_norm
from maskbit_tpu.ops import bitops
from maskbit_tpu.ops.activations import gelu_erf

Dtype = Any

trunc_normal = nn.initializers.truncated_normal(stddev=0.02)


class _GeneratorBase(nn.Module):
    """Shared geometry/bookkeeping for both generator variants."""

    img_size: int = 256
    hidden_dim: int = 768
    codebook_size: int = 1024
    codebook_splits: int = 1
    depth: int = 24
    heads: int = 8
    mlp_dim: int = 3072
    dropout: float = 0.1
    nclass: int = 1000
    input_stride: int = 16
    use_prenorm: bool = False
    remat: bool = False
    attention_impl: str = "einsum"  # "einsum" | "fused" (Pallas inference block)
    # None: attention-prob dropout follows `dropout` (torch-MHA parity);
    # 0.0 drops the (b, h, n, n) attention dropout masks — the dominant
    # training residual at seq 1025 (512px) — while keeping hidden dropout
    attention_dropout: "float | None" = None
    # training-mode attention dropout through the Pallas in-kernel-mask
    # path (nn/pallas_attention.dropout_attention): reference semantics at
    # near-dropout-free speed (the HBM mask is elided)
    fused_attention_dropout: bool = False
    dtype: Dtype = jnp.float32

    @property
    def drop_label(self) -> int:
        return self.nclass

    @property
    def seq_len(self) -> int:
        return (self.img_size // self.input_stride) ** 2

    @property
    def bits(self) -> int:
        return int(math.log2(self.codebook_size))

    @property
    def effective_codebook_size(self) -> int:
        return int(2 ** (self.bits // self.codebook_splits))

    @property
    def mask_token(self) -> int:
        return self.effective_codebook_size

    def get_group_splits(self) -> int:
        return self.codebook_splits

    @classmethod
    def from_config(cls, mlm_cfg, vq_cfg, dtype: Dtype = jnp.float32):
        """Build from `model.mlm_model` + `model.vq_model` config nodes."""
        return cls(
            img_size=mlm_cfg.get("img_size", 256),
            hidden_dim=mlm_cfg.get("hidden_dim", 768),
            codebook_size=vq_cfg.get("codebook_size", 1024),
            codebook_splits=mlm_cfg.get("codebook_splits", 1),
            depth=mlm_cfg.get("depth", 24),
            heads=mlm_cfg.get("heads", 8),
            mlp_dim=mlm_cfg.get("mlp_dim", 3072),
            dropout=mlm_cfg.get("dropout", 0.1),
            nclass=mlm_cfg.get("nclass", 1000),
            input_stride=mlm_cfg.get("input_stride", 16),
            use_prenorm=mlm_cfg.get("use_prenorm", False),
            remat=mlm_cfg.get("remat", False),
            attention_impl=mlm_cfg.get("attention_impl", "einsum"),
            attention_dropout=mlm_cfg.get("attention_dropout", None),
            fused_attention_dropout=mlm_cfg.get("fused_attention_dropout", False),
            dtype=dtype,
        )

    def _class_tokens(self, class_labels, drop_label_mask):
        cls_token = class_labels.reshape(-1).astype(jnp.int32)
        if drop_label_mask is not None:
            cls_token = jnp.where(drop_label_mask.reshape(-1), self.drop_label, cls_token)
        return cls_token

    def _trunk(self, tok_embeddings, cls_embedding, deterministic):
        x = jnp.concatenate([tok_embeddings, cls_embedding], axis=1)
        pos_emb = self.param("pos_emb", trunc_normal, (1, self.seq_len + 1, self.hidden_dim))
        x = x + pos_emb.astype(self.dtype)

        x = layer_norm("first_norm")(x).astype(self.dtype)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = TransformerEncoder(
            dim=self.hidden_dim,
            depth=self.depth,
            heads=self.heads,
            mlp_dim=self.mlp_dim,
            dropout=self.dropout,
            use_prenorm=self.use_prenorm,
            remat=self.remat,
            attention_impl=self.attention_impl,
            attention_dropout=self.attention_dropout,
            fused_dropout=self.fused_attention_dropout,
            dtype=self.dtype,
            name="transformer",
        )(x, deterministic=deterministic)
        if self.use_prenorm:
            x = layer_norm("norm_after_transformer")(x).astype(self.dtype)

        x = nn.Dense(self.hidden_dim, kernel_init=trunc_normal, dtype=self.dtype,
                     name="last_dense")(x)
        x = gelu_erf(x)  # fusable exact gelu (ops/activations.py)
        x = layer_norm("last_norm")(x).astype(self.dtype)
        return x


class Bert(_GeneratorBase):
    """Embedding-table generator with a weight-tied output head."""

    @nn.compact
    def __call__(
        self,
        img_tokens: jnp.ndarray,
        class_labels: jnp.ndarray,
        drop_label_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        m = self.codebook_splits
        ecs = self.effective_codebook_size

        tok_embs = [
            nn.Embed(ecs + 1, self.hidden_dim, embedding_init=trunc_normal,
                     dtype=self.dtype, name=f"tok_emb_{i}")
            for i in range(m)
        ]
        embedded = tok_embs[0](img_tokens[..., 0].astype(jnp.int32))
        for i in range(1, m):
            embedded = embedded + tok_embs[i](img_tokens[..., i].astype(jnp.int32))

        cls_token = self._class_tokens(class_labels, drop_label_mask)
        cls_embedding = nn.Embed(self.nclass + 1, self.hidden_dim,
                                 embedding_init=trunc_normal, dtype=self.dtype,
                                 name="class_emb")(cls_token)[:, None, :]

        x = self._trunk(embedded, cls_embedding, deterministic)

        # weight-tied output: logits_i = x @ emb_i.T[:, :ecs] + per-position bias
        logits = []
        for i in range(m):
            table = tok_embs[i].embedding[:ecs].astype(self.dtype)  # (ecs, d)
            bias = self.param(f"bias_{i}", nn.initializers.zeros, (self.seq_len, ecs))
            logit = jnp.einsum("bnd,cd->bnc", x, table)
            logits.append(logit[:, : self.seq_len, :] + bias.astype(self.dtype))
        return jnp.stack(logits, axis=2)  # (b, n, m, ecs)


class LFQBert(_GeneratorBase):
    """Embedding-free generator: bit tokens in, factorized logits out."""

    def preprocess_tokens(self, img_tokens: jnp.ndarray) -> jnp.ndarray:
        """(b, n, m) indices -> (b, n, m*eb) ±1 bits, masked positions zeroed."""
        eb = self.bits // self.codebook_splits
        mask = img_tokens == self.mask_token
        bits = bitops.indices_to_bits(img_tokens, eb, dtype=self.dtype)
        bits = jnp.where(mask[..., None], 0.0, bits)
        b, n = img_tokens.shape[:2]
        return bits.reshape(b, n, self.codebook_splits * eb)

    @nn.compact
    def __call__(
        self,
        img_tokens: jnp.ndarray,
        class_labels: jnp.ndarray,
        drop_label_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        bits = self.preprocess_tokens(img_tokens)

        cls_token = self._class_tokens(class_labels, drop_label_mask)
        cls_embedding = nn.Embed(self.nclass + 1, self.hidden_dim,
                                 embedding_init=trunc_normal, dtype=self.dtype,
                                 name="class_emb")(cls_token)[:, None, :]

        projected = nn.Dense(self.hidden_dim, kernel_init=trunc_normal,
                             dtype=self.dtype, name="input_proj")(bits)

        x = self._trunk(projected, cls_embedding, deterministic)

        logits = nn.Dense(self.codebook_splits * self.effective_codebook_size,
                          kernel_init=trunc_normal, dtype=self.dtype,
                          name="prediction_layer")(x)
        b, n_plus_1 = logits.shape[:2]
        logits = logits.reshape(b, n_plus_1, self.codebook_splits,
                                self.effective_codebook_size)
        return logits[:, : self.seq_len, ...]


def make_generator(model_cls: str, mlm_cfg, vq_cfg, dtype: Dtype = jnp.float32):
    """Factory mirroring the reference's model_cls switch
    (scripts/train_maskbit.py:117-133)."""
    if model_cls == "bert":
        return Bert.from_config(mlm_cfg, vq_cfg, dtype=dtype)
    if model_cls == "lfq_bert":
        return LFQBert.from_config(mlm_cfg, vq_cfg, dtype=dtype)
    raise ValueError(f"Unknown generator model_cls {model_cls!r}")
