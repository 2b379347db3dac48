"""Multi-head attention core shared by every tower in the framework.

One entry point, ``mha``, operating on head-split tensors.  The default
path is pure XLA (einsum + softmax — XLA fuses this well on TPU for the
short sequences CLIP uses: 50-257 tokens).  ``backend="pallas"`` selects
the fused-attention Pallas kernel in ``clip_fsar_tpu.ops.flash_attention``
for long-sequence / large-batch regimes.

Replaces: torch.nn.MultiheadAttention / F.multi_head_attention_forward
usage in the reference (models/base/few_shot.py:623-640, 469-539).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import nn as jnn


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    backend: str = "xla",
    causal: bool = False,
    prob_dropout_rate: float = 0.0,
    prob_dropout_rng=None,
) -> jnp.ndarray:
    """Scaled dot-product attention over head-split tensors.

    q: [B, H, Nq, Dh], k/v: [B, H, Nk, Dh]; mask: additive, broadcastable
    to [B, H, Nq, Nk] (use -inf for disallowed).  ``causal`` builds the
    mask structurally (in-kernel on the pallas path).  Returns
    [B, H, Nq, Dh].

    Softmax dtype: by default the logits are materialized and softmaxed in
    float32 (parity with the reference's fp32 torch softmax, autocast-off).
    ``backend="xla:bf16"`` keeps the logits in the input dtype instead —
    on a bf16 tower this halves the [B,H,Nq,Nk] HBM traffic (measured +6%
    step throughput on ViT-B/16 train, see PERFORMANCE.md) at the cost of
    lower-precision probabilities; gated by ``TPU.SOFTMAX_DTYPE``.
    """
    if backend == "pallas" and not (prob_dropout_rate > 0.0 and prob_dropout_rng is not None):
        from clip_fsar_tpu.ops.flash_attention import flash_mha

        return flash_mha(q, k, v, mask=mask, causal=causal)

    dtype = q.dtype
    smax_dtype = dtype if backend == "xla:bf16" else jnp.float32
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=smax_dtype)
    logits = logits.astype(smax_dtype) * jnp.asarray(scale, smax_dtype)
    if causal and mask is None:
        mask = causal_mask(q.shape[2])
    if mask is not None:
        logits = logits + mask.astype(smax_dtype)
    probs = jnn.softmax(logits, axis=-1)
    if prob_dropout_rate > 0.0 and prob_dropout_rng is not None:
        # dropout on the softmaxed attention probabilities (reference
        # transformer.py:68,94 applies nn.Dropout(ATTN_DROPOUT) there)
        import jax

        keep = 1.0 - prob_dropout_rate
        probs = probs * jax.random.bernoulli(prob_dropout_rng, keep, probs.shape).astype(probs.dtype) / keep
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(dtype), v, preferred_element_type=jnp.float32)
    return out.astype(dtype)


def mha_nhd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    bf16_softmax: bool = False,
) -> jnp.ndarray:
    """Attention in the UNSPLIT [B, N, H, Dh] layout.

    Skips the physical [B,N,D] -> [B,H,N,Dh] head transposes entirely:
    the QKV projection output is viewed as [B, N, H, Dh] (a free reshape)
    and the head axis rides along as an einsum batch dim — XLA folds the
    layout change into the matmul instead of materializing relayout
    copies (the reshape/copy + split buckets of the step profile,
    PERFORMANCE.md).  Output is [B, N, H, Dh]; a free reshape gives
    [B, N, D] for the out-projection.
    """
    dtype = q.dtype
    smax_dtype = dtype if bf16_softmax else jnp.float32
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=smax_dtype)
    logits = logits.astype(smax_dtype) * jnp.asarray(scale, smax_dtype)
    if causal and mask is None:
        mask = causal_mask(q.shape[1])
    if mask is not None:
        logits = logits + mask.astype(smax_dtype)
    probs = jnn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dtype), v, preferred_element_type=jnp.float32)
    return out.astype(dtype)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[B, N, D] -> [B, H, N, D/H]"""
    b, n, d = x.shape
    return x.reshape(b, n, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, N, Dh] -> [B, N, H*Dh]"""
    b, h, n, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * dh)


def causal_mask(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Additive causal mask [n, n]: 0 on/below diagonal, -inf above
    (reference CLIP.build_attention_mask, few_shot.py:778-784)."""
    return jnp.triu(jnp.full((n, n), -jnp.inf, dtype=dtype), k=1)
