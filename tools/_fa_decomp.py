"""Decompose the clip_mha forward kernel's time: which stage is the
2.8 ms at [240,197,2304] actually spent in?

  matmul-only : QK^T -> cast -> PV (no max/exp/sum; bogus numerics)
  exp-only    : QK^T -> exp (no max/sum) -> PV
  no-max      : QK^T -> exp -> sum -> PV/l (skip the row-max pass)
  full        : the shipped kernel

All share the same memory traffic and grid, so deltas isolate the VPU
softmax stages.  Timing via in-jit scan chain + host fetch.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import clip_fsar_tpu.ops.fused_attention as fa

STEPS = 30


def make_kernel(mode):
    def kern(qkv_ref, o_ref, lse_ref, *, heads, dh, scale, block_b):
        d = heads * dh
        for ib in range(block_b):
            qkv = qkv_ref[ib]
            for h in range(heads):
                sl = slice(h * dh, (h + 1) * dh)
                qh = qkv[:, h * dh : (h + 1) * dh]
                kh = qkv[:, d + h * dh : d + (h + 1) * dh]
                vh = qkv[:, 2 * d + h * dh : 2 * d + (h + 1) * dh]
                s = jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                ) * scale
                if mode == "matmul":
                    p, l = s, None
                elif mode == "exp":
                    p, l = jnp.exp(s), None
                elif mode == "nomax":
                    p = jnp.exp(s)
                    l = jnp.sum(p, axis=-1, keepdims=True)
                else:  # full
                    m = jnp.max(s, axis=-1, keepdims=True)
                    p = jnp.exp(s - m)
                    l = jnp.sum(p, axis=-1, keepdims=True)
                o = jnp.dot(p.astype(vh.dtype), vh, preferred_element_type=jnp.float32)
                if l is not None:
                    o = o / l
                o_ref[ib, :, sl] = o.astype(o_ref.dtype)
                lse_ref[ib, :, h : h + 1] = jnp.sum(s, axis=-1, keepdims=True) if l is None else l
    return kern


def impl(kernel, qkv, heads):
    b, n, d3 = qkv.shape
    d = d3 // 3
    dh = d // heads
    scale = dh**-0.5
    block_b = fa._pick_block_b(b, n * (d3 + d) * 2 + n * fa._LANES * 4)
    o, lse = pl.pallas_call(
        functools.partial(kernel, heads=heads, dh=dh, scale=scale, block_b=block_b),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, d), qkv.dtype),
            jax.ShapeDtypeStruct((b, n, fa._LANES), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(b // block_b,),
            in_specs=[pl.BlockSpec((block_b, n, d3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec((block_b, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, n, fa._LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ),
        ),
        compiler_params=fa._compiler_params(),
    )(qkv)
    return o


def chained(fn, x, steps=STEPS):
    def body(c, _):
        o = fn(c)
        return c + o[..., :1].astype(c.dtype) * 1e-6, None

    run = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=steps)[0][0, 0, 0].astype(jnp.float32))
    float(run(x))
    t0 = time.perf_counter()
    float(run(x))
    return (time.perf_counter() - t0) / steps * 1000


if __name__ == "__main__":
    B, N, H, DH = 240, 197, 12, 64
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(B, N, 3 * H * DH).astype(np.float32) * 0.02, dtype=jnp.bfloat16)
    for mode in ("matmul", "exp", "nomax", "full"):
        f = lambda x, m=mode: impl(make_kernel(m), x, H)
        print(f"{mode:7s}: {chained(f, qkv):6.2f} ms", flush=True)
