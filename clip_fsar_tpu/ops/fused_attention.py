"""Whole-sequence multi-head attention kernel for CLIP-sized towers.

Why another kernel (vs ops/flash_attention.py): at CLIP shapes
(N=50..257, Dh=64, B*H thousands) the classic head-split FlashAttention
layout is DMA-bound, not MXU-bound — padding Dh 64->128 doubles q/k/v
traffic and the lane-replicated fp32 LSE buffer is twice the output size
(measured 23% of HBM bandwidth, PERFORMANCE.md).  This kernel instead:

  * takes q/k/v in the UNSPLIT [B, N, H*Dh] layout straight out of the
    QKV projection — no head transposes anywhere, and the 768-lane last
    dim is perfectly tile-aligned (6 x 128), so DMA moves only real data;
  * holds the WHOLE (padded) sequence of a clip in VMEM and statically
    unrolls the head loop: per head one [N,64]x[64,N] logits matmul, an
    in-VMEM fp32 softmax (the [N,N] probability matrix never touches
    HBM), and one [N,N]x[N,64] PV matmul writing its 64-lane slice of
    the unsplit output;
  * backward is ONE kernel per clip (recompute-from-LSE, FlashAttention-2
    math) producing dq/dk/dv together — no dq/dkv kernel split, no
    cross-block accumulation;
  * the LSE residual is stored per-head in the lane axis ([B, N, 128]
    with H live lanes, fp32) — 1/12th of the round-1 kernel's buffer.

Non-causal only (the ViT tower — CLIP's text tower is <1% of step time
and keeps the XLA path).  No host-side padding: blocks use the logical
sequence length (e.g. 197) and Mosaic masks the physical tile padding —
the jnp.pad/slice copies of the padded design cost ~60 ms/step in the
trace and are gone entirely.

Wired as ``jax.custom_vjp`` => trainable; selected with
``TPU.ATTENTION_LAYOUT: fused`` (MultiheadAttention backend "fused").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_LANES = 128
# VMEM budget for the double-buffered clip blocks.  v5e has 128 MB of
# VMEM; leave headroom for the kernel's unrolled per-head [N, N] fp32
# intermediates (~2.5 MB/clip on ViT-B/16), which live in the Mosaic
# scoped-vmem stack (raised via vmem_limit_bytes below).
_VMEM_BUDGET = 12 * 1024 * 1024  # 40 MB / block_b=8 measured slightly SLOWER


def _compiler_params():
    return pltpu.CompilerParams(
        dimension_semantics=("parallel",),  # grid steps are independent clips
        vmem_limit_bytes=100 * 1024 * 1024,
    )


def _pallas_call(*args, **kw):
    # interpret on CPU so tests / dryruns run the same kernel code without
    # a TPU (Mosaic lowering is TPU-only)
    if jax.default_backend() == "cpu":
        kw.setdefault("interpret", True)
    return pl.pallas_call(*args, **kw)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(qkv_ref, o_ref, lse_ref, *, heads: int, dh: int, scale: float, block_b: int):
    d = heads * dh
    for ib in range(block_b):
        qkv = qkv_ref[ib]  # [N, 3D] storage dtype (bf16 feeds MXU at full rate)
        for h in range(heads):
            sl = slice(h * dh, (h + 1) * dh)
            qh = qkv[:, h * dh : (h + 1) * dh]
            kh = qkv[:, d + h * dh : d + (h + 1) * dh]
            vh = qkv[:, 2 * d + h * dh : 2 * d + (h + 1) * dh]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale  # [N, N] fp32 (Mosaic masks physical tile padding)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o_ref[ib, :, sl] = (
                jnp.dot(p.astype(vh.dtype), vh, preferred_element_type=jnp.float32) / l
            ).astype(o_ref.dtype)
            lse_ref[ib, :, h : h + 1] = m + jnp.log(l)


# ---------------------------------------------------------------------------
# backward (one kernel: dq, dk, dv per clip)
# ---------------------------------------------------------------------------


def _bwd_kernel(qkv_ref, o_ref, do_ref, lse_ref, dqkv_ref, *, heads: int, dh: int, scale: float, block_b: int):
    d = heads * dh
    for ib in range(block_b):
        qkv = qkv_ref[ib]
        o = o_ref[ib]
        do = do_ref[ib]
        for h in range(heads):
            sl = slice(h * dh, (h + 1) * dh)
            qh = qkv[:, h * dh : (h + 1) * dh]
            kh = qkv[:, d + h * dh : d + (h + 1) * dh]
            vh = qkv[:, 2 * d + h * dh : 2 * d + (h + 1) * dh]
            oh, doh = o[:, sl], do[:, sl]
            lse = lse_ref[ib, :, h : h + 1]  # [N, 1] fp32
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            p = jnp.exp(s - lse)  # [N, N] fp32
            # delta_i = sum_d dO_i O_i  (fp32 row scalar per head)
            delta = jnp.sum(doh.astype(jnp.float32) * oh.astype(jnp.float32), axis=-1, keepdims=True)
            dp = jax.lax.dot_general(
                doh, vh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # [N_p, N_p]
            ds = (p * (dp - delta)).astype(qkv.dtype)
            dqkv_ref[ib, :, h * dh : (h + 1) * dh] = (
                jnp.dot(ds, kh, preferred_element_type=jnp.float32) * scale
            ).astype(dqkv_ref.dtype)
            # dk = ds^T q, dv = p^T do — contract over the query axis
            dqkv_ref[ib, :, d + h * dh : d + (h + 1) * dh] = (
                jax.lax.dot_general(ds, qh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32) * scale
            ).astype(dqkv_ref.dtype)
            dqkv_ref[ib, :, 2 * d + h * dh : 2 * d + (h + 1) * dh] = jax.lax.dot_general(
                p.astype(do.dtype), doh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ).astype(dqkv_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------


def _pick_block_b(b: int, clip_bytes: int) -> int:
    """Largest divisor of b (<=8) whose double-buffered blocks fit the budget."""
    bb = 1
    for cand in (8, 4, 2):
        if b % cand == 0 and cand * clip_bytes * 2 < _VMEM_BUDGET:
            bb = cand
            break
    return bb


def _fwd_impl(qkv, heads: int):
    b, n, d3 = qkv.shape
    d = d3 // 3
    dh = d // heads
    scale = dh**-0.5
    # qkv + o (bf16) + lse (fp32 lanes), double-buffered
    block_b = _pick_block_b(b, n * (d3 + d) * 2 + n * _LANES * 4)
    grid = (b // block_b,)
    o, lse = _pallas_call(
        functools.partial(_fwd_kernel, heads=heads, dh=dh, scale=scale, block_b=block_b),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, d), qkv.dtype),
            jax.ShapeDtypeStruct((b, n, _LANES), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[pl.BlockSpec((block_b, n, d3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec((block_b, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, n, _LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ),
        ),
        compiler_params=_compiler_params(),
    )(qkv)
    return o, lse


def _bwd_impl(qkv, o, lse, g, heads: int):
    b, n, d3 = qkv.shape
    d = d3 // 3
    dh = d // heads
    scale = dh**-0.5
    block_b = _pick_block_b(b, n * (2 * d3 + 2 * d) * 2 + n * _LANES * 4)
    grid = (b // block_b,)
    (dqkv,) = _pallas_call(
        functools.partial(_bwd_kernel, heads=heads, dh=dh, scale=scale, block_b=block_b),
        out_shape=(jax.ShapeDtypeStruct((b, n, d3), qkv.dtype),),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_b, n, d3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, n, _LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(pl.BlockSpec((block_b, n, d3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),),
        ),
        compiler_params=_compiler_params(),
    )(qkv, o, g, lse)
    return (dqkv,)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def clip_mha(qkv, heads: int):
    """Fused multi-head attention on the PACKED projection output.

    qkv: [B, N, 3*H*Dh] straight out of the fused QKV matmul (q | k | v
    along the last axis — self-attention, same N).  Returns [B, N, H*Dh].
    Taking the packed tensor (and returning a packed dqkv) removes the
    jnp.split / gradient-concatenate pairs around the kernel, which
    showed up as ~32 ms/step of dynamic-update-slice + pad fusions in the
    ViT-B/16 train profile.
    """
    return _fwd_impl(qkv, heads)[0]


def _clip_mha_fwd(qkv, heads):
    o, lse = _fwd_impl(qkv, heads)
    return o, (qkv, o, lse)


def _clip_mha_bwd(heads, res, g):
    qkv, o, lse = res
    return _bwd_impl(qkv, o, lse, g, heads)


clip_mha.defvjp(_clip_mha_fwd, _clip_mha_bwd)
