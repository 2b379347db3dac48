"""Fused unsplit-layout CLIP attention kernel (ops/fused_attention.py):
forward and custom-VJP backward vs the XLA reference math, in Pallas
interpreter mode on CPU (the real-TPU path is exercised by bench.py)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _xla_ref(q, k, v, heads):
    b, n, d = q.shape
    dh = d // heads
    qh = q.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * (dh**-0.5)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
    return o.transpose(0, 2, 1, 3).reshape(b, n, d)


@pytest.mark.parametrize("n", [197, 50, 64])
def test_fused_mha_fwd_bwd_matches_xla(n):
    from clip_fsar_tpu.ops import fused_attention as fa

    # interpret mode on CPU: same kernel code, no TPU needed
    import functools
    orig = fa.pl.pallas_call
    fa.pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        rng = np.random.RandomState(0)
        b, d, heads = 4, 128, 2
        qkv = jnp.asarray(rng.randn(b, n, 3 * d).astype(np.float32))

        got = fa.clip_mha(qkv, heads)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        want = _xla_ref(q, k, v, heads)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

        def loss_fused(qkv):
            return (fa.clip_mha(qkv, heads) * jnp.arange(d)).sum()

        def loss_ref(qkv):
            q, k, v = jnp.split(qkv, 3, axis=-1)
            return (_xla_ref(q, k, v, heads) * jnp.arange(d)).sum()

        g = jax.grad(loss_fused)(qkv)
        w = jax.grad(loss_ref)(qkv)
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-4)
    finally:
        fa.pl.pallas_call = orig
