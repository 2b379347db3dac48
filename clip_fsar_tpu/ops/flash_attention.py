"""Fused (flash) attention for TPU — Pallas forward AND backward kernels.

Online-softmax attention computed block-by-block in VMEM: for each query
block the kernel streams key/value blocks, maintaining a running max and
normalizer so the full [Nq, Nk] probability matrix never materializes in
HBM.  The backward pass is the standard two-kernel FlashAttention-2
recomputation scheme (dQ kernel over query blocks; dK/dV kernel over key
blocks) wired up as a ``jax.custom_vjp`` — the op is trainable, so the
``backend="pallas"`` path serves the flagship CLIP train step, not just
inference.

Causal masking is computed in-kernel from block indices (used by the CLIP
text tower); arbitrary additive masks fall back to the XLA path.

Shapes: q [B, H, Nq, D], k/v [B, H, Nk, D].  D and sequence lengths are
padded to the TPU tiling (last dim 128, block multiples; see
/opt/skills/guides/pallas_guide.md).  The LSE rows are carried in a
[BH, Nq, 128] lane-replicated buffer to respect the (sublane, 128) tile.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_LANES = 128


def _causal_mask_block(s, q_start, k_start):
    """Additive in-kernel causal mask for an [bq, bk] score block."""
    q_ids = q_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    k_ids = k_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    return jnp.where(k_ids <= q_ids, 0.0, _NEG_INF)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_k: int, scale: float, nk: int, causal: bool, block_q: int, block_b: int
):
    qb = pl.program_id(1)
    num_kb = pl.cdiv(nk, block_k)

    # statically unrolled loop over block_b (b,h) pairs per program: at
    # CLIP shapes each pair is only ~2 µs of math, so one-pair programs
    # are grid-overhead bound; batching pairs amortizes dispatch + DMA.
    for ib in range(block_b):
        # keep q/k/v in their storage dtype (bf16): the MXU takes bf16
        # inputs with fp32 accumulation at full rate — upcasting first
        # would halve matmul throughput and double VMEM traffic.  Scale
        # AFTER the dot, in fp32.
        q = q_ref[ib]  # [block_q, d]

        def body(kb, carry, ib=ib, q=q):
            acc, m_prev, l_prev = carry
            k = k_ref[ib, pl.ds(kb * block_k, block_k), :]
            v = v_ref[ib, pl.ds(kb * block_k, block_k), :]
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # [bq, bk] f32
            key_ids = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(key_ids < nk, s, _NEG_INF)
            if causal:
                s = s + _causal_mask_block(s, qb * block_q, kb * block_k)

            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
            return acc, m_new, l_new

        d = q.shape[-1]
        acc = jnp.zeros((q.shape[0], d), jnp.float32)
        m0 = jnp.full((q.shape[0], 1), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((q.shape[0], 1), jnp.float32)
        acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc, m0, l0))
        l_safe = jnp.maximum(l, 1e-30)
        o_ref[ib] = (acc / l_safe).astype(o_ref.dtype)
        # log-sum-exp per query row, lane-replicated to satisfy the tile
        lse = m + jnp.log(l_safe)  # [bq, 1]
        lse_ref[ib] = jnp.broadcast_to(lse, (q.shape[0], _LANES)).astype(jnp.float32)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *, block_k: int, scale: float, nk: int, causal: bool, block_q: int):
    qb = pl.program_id(1)
    q = q_ref[0]  # [bq, d] storage dtype — bf16 feeds the MXU at full rate
    do = do_ref[0]
    lse = lse_ref[0][:, 0:1]  # [bq, 1]
    delta = delta_ref[0][:, 0:1]
    num_kb = pl.cdiv(nk, block_k)

    def body(kb, dq):
        k = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        key_ids = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(key_ids < nk, s, _NEG_INF)
        if causal:
            s = s + _causal_mask_block(s, qb * block_q, kb * block_k)
        p = jnp.exp(s - lse)  # [bq, bk] f32
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = (p * (dp - delta)).astype(k.dtype)
        return dq + jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale

    dq = jax.lax.fori_loop(0, num_kb, body, jnp.zeros(q.shape, jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, *, block_q: int, scale: float, nq: int, causal: bool, block_k: int):
    kb = pl.program_id(1)
    k = k_ref[0]  # [bk, d] storage dtype — bf16 feeds the MXU at full rate
    v = v_ref[0]
    num_qb = pl.cdiv(nq, block_q)

    def body(qb, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qb * block_q, block_q), :]
        do = do_ref[0, pl.ds(qb * block_q, block_q), :]
        lse = lse_ref[0, pl.ds(qb * block_q, block_q), :][:, 0:1]
        delta = delta_ref[0, pl.ds(qb * block_q, block_q), :][:, 0:1]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # [bq, bk]
        q_ids = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        s = jnp.where(q_ids < nq, s, _NEG_INF)
        if causal:
            s = s + _causal_mask_block(s, qb * block_q, kb * block_k)
        p = jnp.exp(s - lse)  # rows of padded queries have lse=0 but do=0
        pt = p.astype(do.dtype).T
        dv = dv + jnp.dot(pt, do, preferred_element_type=jnp.float32)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = (p * (dp - delta)).astype(q.dtype)
        dk = dk + jnp.dot(ds.T, q, preferred_element_type=jnp.float32) * scale
        return dk, dv

    dk0 = jnp.zeros(k.shape, jnp.float32)
    dv0 = jnp.zeros(v.shape, jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_qb, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# padding / layout helpers
# ---------------------------------------------------------------------------


def _pad_to(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _prep(q, k, v, block_q, block_k):
    b, h, nq, d = q.shape
    nk = k.shape[2]
    qp = _pad_to(_pad_to(q, 3, _LANES), 2, block_q)
    kp = _pad_to(_pad_to(k, 3, _LANES), 2, block_k)
    vp = _pad_to(_pad_to(v, 3, _LANES), 2, block_k)
    d_p = qp.shape[-1]
    qp = qp.reshape(b * h, -1, d_p)
    kp = kp.reshape(b * h, -1, d_p)
    vp = vp.reshape(b * h, -1, d_p)
    return qp, kp, vp, (b, h, nq, nk, d, d_p)


def _pick_block_b(bh: int, cap: int = 8) -> int:
    """Largest power-of-two ≤ cap dividing bh ((b,h) pairs per program)."""
    bb = 1
    while bb * 2 <= cap and bh % (bb * 2) == 0:
        bb *= 2
    return bb


def _fwd_impl(q, k, v, causal: bool, block_q: int, block_k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    qp, kp, vp, (b, h, nq, nk, d, d_p) = _prep(q, k, v, block_q, block_k)
    bh, nq_p, nk_p = qp.shape[0], qp.shape[1], kp.shape[1]
    scale = d**-0.5
    block_b = _pick_block_b(bh)
    grid = (bh // block_b, nq_p // block_q)
    o, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, block_k=block_k, scale=scale, nk=nk, causal=causal, block_q=block_q, block_b=block_b
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, nq_p, d_p), q.dtype),
            jax.ShapeDtypeStruct((bh, nq_p, _LANES), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_b, block_q, d_p), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, nk_p, d_p), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, nk_p, d_p), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((block_b, block_q, d_p), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, block_q, _LANES), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            ),
        ),
    )(qp, kp, vp)
    out = o.reshape(b, h, nq_p, d_p)[:, :, :nq, :d]
    return out, lse


def _bwd_impl(q, k, v, o, lse, g, causal: bool, block_q: int, block_k: int):
    qp, kp, vp, (b, h, nq, nk, d, d_p) = _prep(q, k, v, block_q, block_k)
    gp = _pad_to(_pad_to(g, 3, _LANES), 2, block_q).reshape(qp.shape)
    bh, nq_p, nk_p = qp.shape[0], qp.shape[1], kp.shape[1]
    scale = d**-0.5

    # delta_i = sum_d dO_i * O_i (lane-replicated like lse)
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)  # [b, h, nq]
    delta = _pad_to(delta.reshape(bh, nq), 1, block_q)
    delta = jnp.broadcast_to(delta[..., None], (bh, nq_p, _LANES))

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_k=block_k, scale=scale, nk=nk, causal=causal, block_q=block_q),
        out_shape=jax.ShapeDtypeStruct((bh, nq_p, d_p), q.dtype),
        grid_spec=pl.GridSpec(
            grid=(bh, nq_p // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d_p), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nk_p, d_p), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nk_p, d_p), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, d_p), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, _LANES), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, _LANES), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, d_p), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
    )(qp, kp, vp, gp, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, block_q=block_q, scale=scale, nq=nq, causal=causal, block_k=block_k),
        out_shape=(
            jax.ShapeDtypeStruct((bh, nk_p, d_p), k.dtype),
            jax.ShapeDtypeStruct((bh, nk_p, d_p), v.dtype),
        ),
        grid_spec=pl.GridSpec(
            grid=(bh, nk_p // block_k),
            in_specs=[
                pl.BlockSpec((1, nq_p, d_p), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, d_p), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, d_p), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nq_p, d_p), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nq_p, _LANES), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nq_p, _LANES), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, block_k, d_p), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, d_p), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            ),
        ),
    )(qp, kp, vp, gp, lse, delta)

    b_, h_ = b, h
    dq = dq.reshape(b_, h_, nq_p, d_p)[:, :, :nq, :d]
    dk = dk.reshape(b_, h_, nk_p, d_p)[:, :, :nk, :d]
    dv = dv.reshape(b_, h_, nk_p, d_p)[:, :, :nk, :d]
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom-VJP op + public API
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash(q, k, v, causal: bool, block_q: int, block_k: int):
    return _fwd_impl(q, k, v, causal, block_q, block_k)[0]


def _flash_fwd(q, k, v, causal, block_q, block_k):
    out, lse = _fwd_impl(q, k, v, causal, block_q, block_k)
    return out, (q, k, v, out, lse)


def _flash_bwd(causal, block_q, block_k, residuals, g):
    q, k, v, out, lse = residuals
    return _bwd_impl(q, k, v, out, lse, g, causal, block_q, block_k)


_flash.defvjp(_flash_fwd, _flash_bwd)


def _auto_block(n: int) -> int:
    """One whole-sequence block when the (32-aligned) sequence fits a
    single ≤256 tile row — for CLIP's 197/50-token frames this cuts the
    q-axis padding from 30% (two 128 blocks → 256) to 12% (one 224 block)
    and removes the online-softmax loop; longer sequences stream
    128-blocks.  32 alignment keeps the block a whole number of (16, 128)
    bf16 tiles (and (8, 128) fp32 tiles) — 197 → 224, the exact block the
    PERFORMANCE.md numbers were measured with."""
    aligned = -(-n // 32) * 32
    return aligned if aligned <= 256 else 128


def flash_mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
) -> jnp.ndarray:
    """Drop-in for ops.attention.mha on head-split tensors; differentiable
    (custom VJP with Pallas backward kernels).  ``causal`` is handled
    in-kernel; other additive masks fall back to XLA."""
    if mask is not None:
        from clip_fsar_tpu.ops import attention as _attn

        return _attn.mha(q, k, v, mask=mask, backend="xla")
    block_q = block_q or _auto_block(q.shape[2])
    block_k = block_k or _auto_block(k.shape[2])
    return _flash(q, k, v, causal, block_q, block_k)
