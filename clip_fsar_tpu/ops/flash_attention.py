"""Fused (flash) attention Pallas kernel for TPU.

Online-softmax attention computed block-by-block in VMEM: for each query
block the kernel streams key/value blocks, maintaining running max and
normalizer so the full [N, N] probability matrix never materializes in
HBM.  This is the ``backend="pallas"`` path of
clip_fsar_tpu.ops.attention.mha — worthwhile for long token sequences
(ViT-L/14@336px: 577 tokens; video transformers: T*N tokens); for CLIP's
197-token frames XLA's fused softmax is already near-optimal, so the
default stays "xla".

Shapes: q [B, H, Nq, D], k/v [B, H, Nk, D].  D and block sizes are padded
to the TPU lane/sublane tiling (last dim 128; see
/opt/skills/guides/pallas_guide.md).  Additive masks fall back to XLA.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, scale: float, nk: int):
    """One (batch*head, q-block) program: stream k/v blocks with online
    softmax."""
    q = q_ref[0].astype(jnp.float32) * scale  # [block_q, d]
    block_q, d = q.shape
    num_kb = pl.cdiv(nk, block_k)

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)  # [block_k, d]
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [block_q, block_k]
        # mask out padded keys
        key_ids = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(key_ids < nk, s, _NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_kb, body, (acc, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    block_q: int = 128,
    block_k: int = 128,
) -> jnp.ndarray:
    """Drop-in for ops.attention.mha on head-split tensors."""
    if mask is not None:
        # masked attention (causal text etc.): XLA path
        from clip_fsar_tpu.ops import attention as _attn

        return _attn.mha(q, k, v, mask=mask, backend="xla")

    b, h, nq, d = q.shape
    nk = k.shape[2]
    scale = d**-0.5

    # pad D to the lane width and N to block multiples
    qp = _pad_to(_pad_to(q, 3, 128), 2, block_q).reshape(b * h, -1, max(d, 128) if d % 128 else d)
    kp = _pad_to(_pad_to(k, 3, 128), 2, block_k).reshape(b * h, -1, qp.shape[-1])
    vp = _pad_to(_pad_to(v, 3, 128), 2, block_k).reshape(b * h, -1, qp.shape[-1])
    nq_p, nk_p = qp.shape[1], kp.shape[1]
    d_p = qp.shape[-1]

    grid = (b * h, nq_p // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, block_k=block_k, scale=scale, nk=nk),
        out_shape=jax.ShapeDtypeStruct((b * h, nq_p, d_p), q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d_p), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nk_p, d_p), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nk_p, d_p), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, d_p), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
    )(qp, kp, vp)
    return out.reshape(b, h, nq_p, d_p)[:, :, :nq, :d]
