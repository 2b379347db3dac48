"""Clean attention micro-bench: chain STEPS kernel calls inside ONE jit
via lax.scan so eager-dispatch/tunnel overhead cannot pollute timings.
Compares the adopted clip_mha against an e-base variant at the flagship
ViT-B/16 shape and the ViT-L/14@336 shape.
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


def chained(fn, x, steps=STEPS):
    def body(c, _):
        o = fn(c)
        # feed a real (but tiny) function of the output back so calls
        # serialize AND the kernel is not dead-code-eliminated
        return c + o[..., :1].astype(c.dtype) * 1e-6, None

    # reduce to a scalar and HOST-FETCH it: through the axon tunnel,
    # block_until_ready on a device handle does not reliably fence —
    # only a device->host read does
    run = jax.jit(
        lambda x0: jax.lax.scan(body, x0, None, length=steps)[0][0, 0, 0].astype(jnp.float32)
    )
    float(run(x))  # compile + warm
    t0 = time.perf_counter()
    float(run(x))
    return (time.perf_counter() - t0) / steps * 1000


def bench_shape(B, N, H, DH, tag):
    D3 = 3 * H * DH
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(B, N, D3).astype(np.float32) * 0.02, dtype=jnp.bfloat16)

    f = lambda x: fa.clip_mha(x, H)
    g = jax.grad(lambda x: fa.clip_mha(x, H).astype(jnp.float32).sum())
    print(f"{tag}: fwd {chained(f, qkv):6.2f} ms   fwd+bwd {chained(g, qkv):6.2f} ms", flush=True)


if __name__ == "__main__":
    bench_shape(240, 197, 12, 64, "ViT-B/16  [240,197,2304]")
    bench_shape(80, 577, 16, 64, "ViT-L/336 [80,577,3072] ")
