"""Pallas LayerNorm (ops/fused_layernorm.py): fwd/bwd parity vs the XLA
fp32-stat formulation, padding, and vmap (the episode axis)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clip_fsar_tpu.ops.fused_layernorm import layer_norm

EPS = 1e-5


def _ref(x, g, b):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu, 0.0)
    y = (x32 - mu) * jax.lax.rsqrt(var + EPS) * g + b
    return y.astype(x.dtype)


@pytest.mark.parametrize("rows", [512, 197, 1300])  # exact block / padded / multi-block padded
def test_forward_matches_xla(rows):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(rows, 256).astype(np.float32))
    g = jnp.asarray(rng.rand(256).astype(np.float32) + 0.5)
    b = jnp.asarray(rng.randn(256).astype(np.float32))
    np.testing.assert_allclose(np.asarray(layer_norm(x, g, b, EPS)), np.asarray(_ref(x, g, b)), rtol=1e-5, atol=1e-5)


def test_grads_match_xla():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(300, 128).astype(np.float32))
    g = jnp.asarray(rng.rand(128).astype(np.float32) + 0.5)
    b = jnp.asarray(rng.randn(128).astype(np.float32))
    w = jnp.asarray(rng.randn(300, 128).astype(np.float32))

    def loss_k(x, g, b):
        return jnp.sum(layer_norm(x, g, b, EPS) * w)

    def loss_r(x, g, b):
        return jnp.sum(_ref(x, g, b) * w)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, g, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, g, b)
    for a, r in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=2e-4, atol=2e-4)


def test_bf16_stream_fp32_stats():
    rng = np.random.RandomState(2)
    x = jnp.asarray((rng.randn(640, 128) * 3).astype(np.float32)).astype(jnp.bfloat16)
    g = jnp.asarray(rng.rand(128).astype(np.float32) + 0.5)
    b = jnp.asarray(rng.randn(128).astype(np.float32))
    y = layer_norm(x, g, b, EPS)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y, dtype=np.float32), np.asarray(_ref(x, g, b), dtype=np.float32), rtol=2e-2, atol=2e-2
    )


def test_vmap_over_episodes():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(3, 70, 128).astype(np.float32))
    g = jnp.asarray(rng.rand(128).astype(np.float32) + 0.5)
    b = jnp.asarray(rng.randn(128).astype(np.float32))
    y = jax.vmap(lambda xi: layer_norm(xi, g, b, EPS))(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_ref(x, g, b)), rtol=1e-5, atol=1e-5)
