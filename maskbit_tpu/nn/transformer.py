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
import jax
import jax.numpy as jnp

from maskbit_tpu.ops.activations import gelu_erf

Dtype = Any

LAYERNORM_EPS = 1e-12


def layer_norm(name: str) -> nn.LayerNorm:
    return nn.LayerNorm(epsilon=LAYERNORM_EPS, dtype=jnp.float32, name=name)


class DenseParams(nn.Module):
    """Raw Dense parameters (same tree layout as nn.Dense: kernel + bias) —
    lets callers route the matmul through either XLA or a Pallas kernel."""

    features_in: int
    features_out: int
    kernel_init: Any = nn.initializers.xavier_uniform()

    def setup(self):
        self.kernel = self.param(
            "kernel", self.kernel_init, (self.features_in, self.features_out)
        )
        self.bias = self.param("bias", nn.initializers.zeros, (self.features_out,))


class NormParams(nn.Module):
    """Raw LayerNorm parameters (same tree layout as nn.LayerNorm)."""

    features: int

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones, (self.features,))
        self.bias = self.param("bias", nn.initializers.zeros, (self.features,))


def _manual_layer_norm(x, scale, bias, eps=LAYERNORM_EPS):
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


class MultiHeadSelfAttention(nn.Module):
    """torch-MHA-equivalent self attention; params held raw so the fused
    Pallas block (BertAttention attention_impl='fused') can consume them.
    torch init parity: in_proj xavier_uniform (MHA default — the reference's
    _init_weights does not reach it), out_proj trunc_normal(0.02)."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    # None: attention-prob dropout = `dropout` (torch-MHA parity). At long
    # sequences the (b, h, n, n) dropout mask is the dominant training
    # residual (~290 MB/layer at seq 1025, BENCHMARKS.md round 3); setting
    # this to 0.0 removes that randomness entirely while keeping the
    # hidden-state dropouts.
    attention_dropout: "float | None" = None
    # route training-mode attention-prob dropout through the Pallas kernel
    # that draws the mask in-kernel (fwd) and regenerates it in the custom
    # bwd — the (b, h, n, n) mask never exists in HBM (the dominant Stage-II
    # training residual, ~22% of the 256px step; BENCHMARKS.md round 3)
    fused_dropout: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        # fused QKV projection: kernel (E, 3E) = torch in_proj_weight.T
        self.qkv = DenseParams(self.embed_dim, 3 * self.embed_dim)
        self.out_proj = DenseParams(
            self.embed_dim, self.embed_dim,
            kernel_init=nn.initializers.truncated_normal(stddev=0.02),
        )
        p = self.dropout if self.attention_dropout is None else self.attention_dropout
        self.attn_drop = nn.Dropout(p)

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b, n, e = x.shape
        assert e == self.embed_dim
        head_dim = self.embed_dim // self.num_heads

        qkv = x @ self.qkv.kernel.astype(self.dtype) + self.qkv.bias.astype(self.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, self.num_heads, head_dim)
        k = k.reshape(b, n, self.num_heads, head_dim)
        v = v.reshape(b, n, self.num_heads, head_dim)

        if self.fused_dropout and not deterministic and self.attn_drop.rate > 0.0:
            from maskbit_tpu.nn.pallas_attention import dropout_attention

            # one 32-bit seed per (batch, head) from the flax dropout
            # stream — a GLOBAL-shaped draw, so data-parallel shards get
            # independent masks exactly like nn.Dropout would (the kernel's
            # mask is a pure hash of (row, col, seed): mesh-invariant)
            seeds = jax.random.bits(
                self.make_rng("dropout"), (b, self.num_heads), jnp.uint32)
            out = dropout_attention(
                q, k, v, seeds, self.attn_drop.rate,
                interpret=jax.default_backend() != "tpu",
            ).reshape(b, n, e).astype(self.dtype)
            return out @ self.out_proj.kernel.astype(self.dtype) + self.out_proj.bias.astype(self.dtype)

        scale = head_dim**-0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        weights = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        weights = self.attn_drop(weights, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(b, n, e)
        return out @ self.out_proj.kernel.astype(self.dtype) + self.out_proj.bias.astype(self.dtype)


class BertAttention(nn.Module):
    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    use_prenorm: bool = False
    attention_impl: str = "einsum"  # "einsum" | "fused" (Pallas, postnorm inference)
    attention_dropout: "float | None" = None
    fused_dropout: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.mha = MultiHeadSelfAttention(self.embed_dim, self.num_heads, self.dropout,
                                          attention_dropout=self.attention_dropout,
                                          fused_dropout=self.fused_dropout,
                                          dtype=self.dtype)
        self.norm = NormParams(self.embed_dim)
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        # fused-block VMEM budget: the in-kernel f32 qkv intermediate is
        # (n, 3E). Beyond the default ~16 MB VMEM scope the kernel raises
        # `vmem_limit_bytes` itself (measured 1.8x over XLA at 512px/n=1025);
        # cap at the largest measured-working size (n_pad=1040, E=1024 ->
        # 12.8 MB) and fall back to einsum beyond it.
        qkv_f32_bytes = x.shape[1] * 3 * self.embed_dim * 4
        if (
            self.attention_impl == "fused"
            and not self.use_prenorm
            and deterministic
            and qkv_f32_bytes <= 13_000_000
        ):
            from maskbit_tpu.nn.pallas_attention import fused_attention_block

            return fused_attention_block(
                x,
                self.mha.qkv.kernel.astype(self.dtype),
                self.mha.qkv.bias.astype(jnp.float32),
                self.mha.out_proj.kernel.astype(self.dtype),
                self.mha.out_proj.bias.astype(jnp.float32),
                self.norm.scale.astype(jnp.float32),
                self.norm.bias.astype(jnp.float32),
                num_heads=self.num_heads,
                eps=LAYERNORM_EPS,
                interpret=jax.default_backend() != "tpu",
            ).astype(self.dtype)

        if self.use_prenorm:
            y = _manual_layer_norm(x, self.norm.scale, self.norm.bias).astype(self.dtype)
            attn = self.drop(self.mha(y, deterministic), deterministic=deterministic)
            return attn + x
        attn = self.drop(self.mha(x, deterministic), deterministic=deterministic)
        return _manual_layer_norm(attn + x, self.norm.scale, self.norm.bias).astype(self.dtype)


class BertFeedForward(nn.Module):
    dim: int
    hidden_dim: int
    dropout: float = 0.0
    use_prenorm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        norm = layer_norm("norm")
        # reference _init_weights: all plain Linears get trunc_normal(0.02)
        init = nn.initializers.truncated_normal(stddev=0.02)

        def net(h):
            h = nn.Dense(self.hidden_dim, kernel_init=init, dtype=self.dtype, name="fc1")(h)
            # exact gelu via the fusable erf polynomial — lax.erf breaks the
            # matmul-epilogue fusion on TPU (ops/activations.py)
            h = gelu_erf(h)
            h = nn.Dense(self.dim, kernel_init=init, dtype=self.dtype, name="fc2")(h)
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
    attention_impl: str = "einsum"
    attention_dropout: "float | None" = None
    fused_dropout: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        attn_cls, ffn_cls = BertAttention, BertFeedForward
        if self.remat:
            attn_cls = nn.remat(BertAttention, static_argnums=(2,))
            ffn_cls = nn.remat(BertFeedForward, static_argnums=(2,))
        for i in range(self.depth):
            x = attn_cls(self.dim, self.heads, self.dropout, self.use_prenorm,
                         attention_impl=self.attention_impl,
                         attention_dropout=self.attention_dropout,
                         fused_dropout=self.fused_dropout,
                         dtype=self.dtype, name=f"layers_{i}_attn")(x, deterministic)
            x = ffn_cls(self.dim, self.mlp_dim, self.dropout, self.use_prenorm,
                        dtype=self.dtype, name=f"layers_{i}_ffn")(x, deterministic)
        return x
