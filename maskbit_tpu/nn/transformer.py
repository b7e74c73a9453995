"""BERT-style bidirectional transformer blocks.

Parity targets (reference modeling/bert.py):
  * BertFeedForward   :16-70  — Linear/GELU/Linear/Dropout + LayerNorm(1e-12),
                                pre/post-norm switchable.
  * BertAttention     :73-141 — torch MultiheadAttention equivalent: fused QKV
                                projection, per-head scaled dot-product,
                                output projection; LayerNorm(1e-12).
  * TransformerEncoder:144-181

TPU-first: attention is a pair of einsums that XLA maps straight onto the
MXU (seq length is 257 — far below where a flash-attention Pallas kernel
pays off); softmax runs in float32, everything else in the compute dtype.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

LAYERNORM_EPS = 1e-12


def layer_norm(name: str) -> nn.LayerNorm:
    return nn.LayerNorm(epsilon=LAYERNORM_EPS, dtype=jnp.float32, name=name)


class MultiHeadSelfAttention(nn.Module):
    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b, n, e = x.shape
        assert e == self.embed_dim
        head_dim = self.embed_dim // self.num_heads

        # fused QKV projection: kernel (E, 3E) = torch in_proj_weight.T
        qkv = nn.Dense(3 * self.embed_dim, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, self.num_heads, head_dim)
        k = k.reshape(b, n, self.num_heads, head_dim)
        v = v.reshape(b, n, self.num_heads, head_dim)

        scale = head_dim**-0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        weights = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        weights = nn.Dropout(self.dropout)(weights, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(b, n, e)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="out_proj")(out)


class BertAttention(nn.Module):
    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    use_prenorm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        mha = MultiHeadSelfAttention(self.embed_dim, self.num_heads, self.dropout,
                                     dtype=self.dtype, name="mha")
        norm = layer_norm("norm")
        drop = nn.Dropout(self.dropout)
        if self.use_prenorm:
            y = norm(x).astype(self.dtype)
            attn = drop(mha(y, deterministic), deterministic=deterministic)
            return attn + x
        attn = drop(mha(x, deterministic), deterministic=deterministic)
        return norm(attn + x).astype(self.dtype)


class BertFeedForward(nn.Module):
    dim: int
    hidden_dim: int
    dropout: float = 0.0
    use_prenorm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        norm = layer_norm("norm")

        def net(h):
            h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
            return nn.Dropout(self.dropout)(h, deterministic=deterministic)

        if self.use_prenorm:
            return net(norm(x).astype(self.dtype)) + x
        return norm(net(x) + x).astype(self.dtype)


class TransformerEncoder(nn.Module):
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    dropout: float = 0.0
    use_prenorm: bool = False
    remat: bool = False  # rematerialize per-layer activations (trade FLOPs for HBM)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        attn_cls, ffn_cls = BertAttention, BertFeedForward
        if self.remat:
            attn_cls = nn.remat(BertAttention, static_argnums=(2,))
            ffn_cls = nn.remat(BertFeedForward, static_argnums=(2,))
        for i in range(self.depth):
            x = attn_cls(self.dim, self.heads, self.dropout, self.use_prenorm,
                         dtype=self.dtype, name=f"layers_{i}_attn")(x, deterministic)
            x = ffn_cls(self.dim, self.mlp_dim, self.dropout, self.use_prenorm,
                        dtype=self.dtype, name=f"layers_{i}_ffn")(x, deterministic)
        return x
