"""Trainable Pallas LayerNorm for the CLIP towers.

The XLA LayerNorm (models/clip/model.py LayerNorm: fp32 stats on a bf16
stream) is bandwidth-optimal forward, but its BACKWARD lowers to fusions
that run ~3x over the HBM floor (2.6 ms vs ~0.5 ms floor per call in the
round-2 ViT-B/16 trace, PERFORMANCE.md) and spill fp32 [rows] stat
planes.  This kernel:

  * forward: one row-block per grid step, fp32 mean/variance (fast-
    variance form E[x^2]-E[x]^2 clamped at 0, matching the XLA path and
    flax's use_fast_variance), normalize, scale+shift, write bf16 —
    nothing else touches HBM; no stats are stored at all;
  * backward: recomputes mu/rstd from the saved INPUT x (two cheap
    vector reductions beat storing + reloading fp32 stat planes), then
      dx = rstd * (g*dy - mean_r(g*dy) - xhat * mean_r(g*dy * xhat))
    and writes per-block dgamma/dbeta partials [grid, D] that a single
    XLA reduce collapses afterwards — no cross-program accumulation, so
    every grid step stays independent ("parallel" semantics).

Numerics match the XLA path to fp32 rounding; parity suites (CPU) keep
the XLA path, the kernel engages on TPU only (models/clip/model.py
LayerNorm gates on the default backend).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_ROWS = 512


def _pallas_call(*args, **kw):
    if jax.default_backend() == "cpu":
        kw.setdefault("interpret", True)
    return pl.pallas_call(*args, **kw)


def _fwd_kernel(x_ref, g_ref, b_ref, y_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)  # [R, D]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    y_ref[...] = ((x - mu) * inv * g_ref[0, :] + b_ref[0, :]).astype(y_ref.dtype)


def _bwd_kernel(x_ref, g_ref, dy_ref, dx_ref, dg_ref, db_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    g = g_ref[0, :]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (x - mu) * inv
    gdy = g * dy
    m1 = jnp.mean(gdy, axis=-1, keepdims=True)
    m2 = jnp.mean(gdy * xhat, axis=-1, keepdims=True)
    dx_ref[...] = (inv * (gdy - m1 - xhat * m2)).astype(dx_ref.dtype)
    # partial dgamma/dbeta per block, padded to 8 sublanes (Mosaic tile
    # minimum); rows 1..7 are zeros and vanish in the outer sum
    pad = jnp.zeros((7, dy.shape[-1]), jnp.float32)
    dg_ref[0] = jnp.concatenate([jnp.sum(dy * xhat, axis=0, keepdims=True), pad], axis=0)
    db_ref[0] = jnp.concatenate([jnp.sum(dy, axis=0, keepdims=True), pad], axis=0)


def _pad_rows(r: int) -> int:
    return -(-r // _BLOCK_ROWS) * _BLOCK_ROWS


def _fwd_impl(x2, g, b, eps: float):
    r, d = x2.shape
    grid = (r // _BLOCK_ROWS,)
    return _pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((r, d), x2.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((_BLOCK_ROWS, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_BLOCK_ROWS, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )(x2, g, b)


def _bwd_impl(x2, g, dy2, eps: float):
    r, d = x2.shape
    n_blocks = r // _BLOCK_ROWS
    dx, dg_parts, db_parts = _pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((r, d), x2.dtype),
            jax.ShapeDtypeStruct((n_blocks, 8, d), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, 8, d), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((_BLOCK_ROWS, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_BLOCK_ROWS, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((_BLOCK_ROWS, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ),
        ),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )(x2, g, dy2)
    return dx, dg_parts.sum(axis=(0, 1)), db_parts.sum(axis=(0, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm(x, g, b, eps: float = 1e-5):
    """y = (x - mean)/sqrt(var+eps) * g + b over the last axis.

    x: [..., D] (any leading shape; D must be lane-tileable, e.g. a
    multiple of 128 — true for every CLIP width).  g, b: [D] float32.
    Rows are padded to the block size with zeros; padded rows normalize
    to garbage that is sliced off before returning (they never read or
    write real data).
    """
    return _ln_fwd(x, g, b, eps)[0]


def _ln_fwd(x, g, b, eps):
    shape = x.shape
    d = shape[-1]
    x2 = x.reshape(-1, d)
    r = x2.shape[0]
    rp = _pad_rows(r)
    if rp != r:
        x2 = jnp.pad(x2, ((0, rp - r), (0, 0)))
    y = _fwd_impl(x2, g.astype(jnp.float32).reshape(1, -1), b.astype(jnp.float32).reshape(1, -1), eps)
    return y[:r].reshape(shape), (x, g)


def _ln_bwd(eps, res, dy):
    x, g = res
    shape = x.shape
    d = shape[-1]
    x2 = x.reshape(-1, d)
    dy2 = dy.reshape(-1, d).astype(x2.dtype)
    r = x2.shape[0]
    rp = _pad_rows(r)
    if rp != r:
        x2 = jnp.pad(x2, ((0, rp - r), (0, 0)))
        dy2 = jnp.pad(dy2, ((0, rp - r), (0, 0)))
    dx, dg, db = _bwd_impl(x2, g.astype(jnp.float32).reshape(1, -1), dy2, eps)
    return dx[:r].reshape(shape).astype(x.dtype), dg.astype(g.dtype), db.astype(g.dtype)


layer_norm.defvjp(_ln_fwd, _ln_bwd)
