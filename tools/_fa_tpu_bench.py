"""Flash-attention vs XLA attention micro-bench on the real chip.

Chains each iteration's input on the previous output — through the axon
tunnel, independent dispatches overlap and wall-clock lies without a data
dependency (same trick bench.py relies on via the train-state carry).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from clip_fsar_tpu.ops.attention import mha
from clip_fsar_tpu.ops.flash_attention import flash_mha

rng = np.random.RandomState(0)
STEPS = 20


def timed(fn, q):
    out = fn(q)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        q = q + 0 * out  # dependency chain
        out = fn(q)
    jax.block_until_ready(out)
    float(jax.device_get(out.astype(jnp.float32).sum()))
    return (time.perf_counter() - t0) / STEPS * 1000


for (B, H, N, D) in [(480, 12, 197, 64), (96, 16, 577, 64)]:
    q = jnp.asarray(rng.randn(B, H, N, D).astype(np.float32), dtype=jnp.bfloat16)

    def grad_of(attn):
        def loss(x):
            return attn(x).astype(jnp.float32).sum()

        return jax.jit(jax.grad(loss))

    variants = [("xla fwd", jax.jit(lambda x: mha(x, x, x, backend="xla")))]
    variants += [("xla:bf16 fwd", jax.jit(lambda x: mha(x, x, x, backend="xla:bf16")))]
    for bq in (128, 224, 256):
        bk = bq
        variants.append(
            (f"pallas bq={bq} fwd", jax.jit(lambda x, bq=bq, bk=bk: flash_mha(x, x, x, block_q=bq, block_k=bk)))
        )
    variants.append(("xla fwd+bwd", grad_of(lambda x: mha(x, x, x, backend="xla"))))
    variants.append(("xla:bf16 fwd+bwd", grad_of(lambda x: mha(x, x, x, backend="xla:bf16"))))
    for bq in (128, 224, 256):
        variants.append(
            (f"pallas bq={bq} fwd+bwd", grad_of(lambda x, bq=bq: flash_mha(x, x, x, block_q=bq, block_k=bq)))
        )

    ref = np.asarray(jax.jit(lambda x: mha(x, x, x, backend="xla"))(q), np.float32)
    fl = np.asarray(jax.jit(lambda x: flash_mha(x, x, x))(q), np.float32)
    print(f"== B{B} H{H} N{N} D{D}  maxerr(pallas)={np.abs(ref - fl).max():.4f}")
    for name, fn in variants:
        try:
            ms = timed(fn, q)
            print(f"  {name:22s} {ms:7.2f} ms")
        except Exception as e:
            print(f"  {name:22s} FAIL {str(e)[:80]}")
