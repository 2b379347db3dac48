"""Shared few-shot head machinery.

Capability parity with the episodic helpers in the reference
(models/base/few_shot.py):
  * ``cos_sim`` — epsilon-regularized cosine similarity (:1115-1124);
  * ``TransformerV1`` — the q/k/v prototype-modulation transformer
    (:979-999 with Attention_qkv :1035-1073, FeedForward :1643-1654);
  * ``class_mean`` — static-shape replacement for the
    torch.unique + index_select class-prototype averaging (:2809-2811);
  * ``PositionalEncoding`` / sinusoidal tables (:1204-1223, 1658-1685).

Static-shape note: episodes always contain exactly WAY classes with labels
0..WAY-1, so class means are a one-hot segment-mean — torch.unique's
sorted order is reproduced exactly without dynamic shapes.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from clip_fsar_tpu.ops.attention import merge_heads, mha, split_heads


def cos_sim(x: jnp.ndarray, y: jnp.ndarray, epsilon: float = 0.01) -> jnp.ndarray:
    """Cosine similarity between last dims with epsilon added to the
    denominator *product* (reference quirk, few_shot.py:1115-1124)."""
    numerator = jnp.matmul(x, jnp.swapaxes(y, -1, -2))
    xnorm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    ynorm = jnp.linalg.norm(y, axis=-1, keepdims=True)
    denominator = jnp.matmul(xnorm, jnp.swapaxes(ynorm, -1, -2)) + epsilon
    return numerator / denominator


def class_mean(feats: jnp.ndarray, labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Mean of ``feats`` per class id, rows ordered by class id.

    feats: [N, ...]; labels: [N] ints in [0, num_classes).  Every class is
    assumed present (episodes have exactly WAY classes).
    """
    onehot = jnp.asarray(labels[:, None] == jnp.arange(num_classes)[None, :], dtype=feats.dtype)  # [N, C]
    counts = onehot.sum(axis=0)  # [C]
    flat = feats.reshape(feats.shape[0], -1)
    sums = onehot.T @ flat  # [C, prod(...)]
    means = sums / counts[:, None]
    return means.reshape((num_classes,) + feats.shape[1:])


class FeedForward(nn.Module):
    dim: int
    hidden_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x)
        h = nn.gelu(h, approximate=False)  # torch nn.GELU default is exact erf
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(h)
        return nn.Dropout(self.dropout, deterministic=deterministic)(h)


class AttentionQKV(nn.Module):
    """Separate-source q/k/v attention (reference Attention_qkv,
    few_shot.py:1035-1073): biasless projections, output projection with
    dropout."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, deterministic: bool = True) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        dense = lambda f, name: nn.Dense(f, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name=name)
        qh = split_heads(dense(inner, "to_q")(q), self.heads)
        kh = split_heads(dense(inner, "to_k")(k), self.heads)
        vh = split_heads(dense(inner, "to_v")(v), self.heads)
        out = merge_heads(mha(qh, kh, vh))
        if self.heads == 1 and self.dim_head == self.dim:
            return out
        out = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=deterministic)(out)


class TransformerV1(nn.Module):
    """Prototype-modulation transformer (reference Transformer_v1,
    few_shot.py:979-999).

    Layer 0: x = attn(LN(q), LN(k), LN(v)) + q; x = ff(x) + x.  Deeper
    layers are plain pre-norm self-attention.  The LayerNorm is shared
    across q/k/v within a layer (PreNormattention_qkv:970-976).
    """

    dim: int
    heads: int = 8
    dim_head_k: int = 256
    dropout_atte: float = 0.05
    mlp_dim: int = 2048
    dropout_ffn: float = 0.05
    depth: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, deterministic: bool = True) -> jnp.ndarray:
        x = q
        for layer in range(self.depth):
            ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name=f"norm_{layer}")
            attn = AttentionQKV(
                self.dim, heads=self.heads, dim_head=self.dim_head_k, dropout=self.dropout_atte,
                dtype=self.dtype, name=f"attn_{layer}",
            )
            qq, kk, vv = (x, x, x) if layer > 0 else (q, k, v)
            normed = lambda t: ln(t.astype(jnp.float32)).astype(t.dtype)
            x = attn(normed(qq), normed(kk), normed(vv), deterministic=deterministic) + qq
            x = FeedForward(
                self.dim, self.mlp_dim, dropout=self.dropout_ffn, dtype=self.dtype, name=f"ff_{layer}"
            )(x, deterministic=deterministic) + x
        return x


def hyrsm_positional_table(max_len: int, d_model: int) -> np.ndarray:
    """HyRSM's PositionalEncoder table (reference few_shot.py:1658-1674):
    pe[pos, i] = sin(pos / 10000^(2i/d)), pe[pos, i+1] = cos(pos /
    10000^(2(i+1)/d)) for even i — note the exponent uses the raw even
    index (a reference quirk, kept for parity).  Apply as
    ``x * sqrt(d/A) + B * pe``."""
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    pos = np.arange(max_len)[:, None].astype(np.float64)
    even = np.arange(0, d_model, 2).astype(np.float64)
    pe[:, 0::2] = np.sin(pos / np.power(10000.0, 2 * even / d_model))
    pe[:, 1::2] = np.cos(pos / np.power(10000.0, 2 * (even + 1) / d_model))
    return pe


def trx_positional_table(max_len: int, d_model: int, pe_scale_factor: float = 0.1) -> np.ndarray:
    """TRX's PositionalEncoding table (reference few_shot.py:1204-1223):
    the standard transformer sinusoid scaled by pe_scale_factor; applied
    additively."""
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    pos = np.arange(max_len)[:, None].astype(np.float64)
    div = np.exp(np.arange(0, d_model, 2).astype(np.float64) * -(np.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(pos * div) * pe_scale_factor
    pe[:, 1::2] = np.cos(pos * div) * pe_scale_factor
    return pe


class ResidualMHA(nn.Module):
    """Post-norm residual MHA (reference MultiHeadAttention,
    few_shot.py:1594-1640): biasless q/k/v projections, scaled-dot
    attention with dropout on the probabilities, output projection +
    dropout, then LayerNorm(output + residual-q)."""

    n_head: int
    d_model: int
    d_k: int
    d_v: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, deterministic: bool = True) -> jnp.ndarray:
        residual = q
        dense = lambda f, name: nn.Dense(f, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name=name)
        qh = split_heads(dense(self.n_head * self.d_k, "w_qs")(q), self.n_head)
        kh = split_heads(dense(self.n_head * self.d_k, "w_ks")(k), self.n_head)
        vh = split_heads(dense(self.n_head * self.d_v, "w_vs")(v), self.n_head)
        # ScaledDotProductAttention applies dropout to the probabilities
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh).astype(jnp.float32) / (self.d_k**0.5)
        probs = nn.softmax(logits, axis=-1).astype(qh.dtype)
        probs = nn.Dropout(0.1, deterministic=deterministic)(probs)
        out = merge_heads(jnp.einsum("bhqk,bhkd->bhqd", probs, vh))
        out = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32, name="fc")(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name="layer_norm")
        return ln((out + residual).astype(jnp.float32)).astype(out.dtype)


class PreNormSelfAttention(nn.Module):
    """x + Attention(LN(x)) (reference PreNormattention + Attention,
    few_shot.py:1024-1033, 1086-1113)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> jnp.ndarray:
        ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name="norm")
        y = ln(x.astype(jnp.float32)).astype(x.dtype)
        inner = self.heads * self.dim_head
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="to_qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = merge_heads(mha(split_heads(q, self.heads), split_heads(k, self.heads), split_heads(v, self.heads)))
        if not (self.heads == 1 and self.dim_head == self.dim):
            out = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="to_out")(out)
            out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return out + x


def class_sorted_order(labels: jnp.ndarray) -> jnp.ndarray:
    """Stable argsort by episode-local label: gives the class-blocked
    support order the reference materializes with unique+index_select
    (static shapes: every class has the same shot count)."""
    return jnp.argsort(labels, stable=True)
