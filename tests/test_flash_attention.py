"""Pallas flash attention vs XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clip_fsar_tpu.ops.attention import causal_mask, mha


@pytest.mark.parametrize("nq,nk,d", [(197, 197, 64), (128, 256, 128), (77, 77, 32)])
def test_flash_matches_xla(nq, nk, d, monkeypatch):
    # interpret mode: run the pallas kernel on CPU
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)
    import importlib

    import clip_fsar_tpu.ops.flash_attention as fa

    importlib.reload(fa)

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, 3, nq, d).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 3, nk, d).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 3, nk, d).astype(np.float32))
    ref = mha(q, k, v, backend="xla")
    got = fa.flash_mha(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)
    monkeypatch.undo()
    importlib.reload(fa)


def test_flash_mask_falls_back_to_xla():
    from clip_fsar_tpu.ops.flash_attention import flash_mha

    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 2, 16, 32).astype(np.float32))
    m = causal_mask(16)
    ref = mha(q, q, q, mask=m, backend="xla")
    got = flash_mha(q, q, q, mask=m)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)


@pytest.fixture()
def interp(monkeypatch):
    """Run pallas kernels in interpret mode on CPU."""
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def wrapper(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", wrapper)
    yield


def test_flash_causal_in_kernel(interp):
    """Causal masking computed from block indices inside the kernel must
    match the XLA additive-mask path (the CLIP text tower's pattern)."""
    from clip_fsar_tpu.ops.flash_attention import flash_mha

    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(2, 2, 77, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 2, 77, 64).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 2, 77, 64).astype(np.float32))
    ref = mha(q, k, v, mask=causal_mask(77), backend="xla")
    got = flash_mha(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_gradients_match_xla(interp, causal):
    """The custom-VJP backward kernels must match XLA autodiff gradients —
    this is what makes backend='pallas' usable in the train step."""
    from clip_fsar_tpu.ops.flash_attention import flash_mha

    rng = np.random.RandomState(3)
    shape = (1, 2, 150, 32)  # non-multiple of the 128 block: padding path
    q = jnp.asarray(rng.randn(*shape).astype(np.float32))
    k = jnp.asarray(rng.randn(*shape).astype(np.float32))
    v = jnp.asarray(rng.randn(*shape).astype(np.float32))
    w = jnp.asarray(rng.randn(*shape).astype(np.float32))  # cotangent seed

    def loss_flash(q, k, v):
        return jnp.sum(flash_mha(q, k, v, causal=causal) * w)

    def loss_xla(q, k, v):
        m = causal_mask(shape[2]) if causal else None
        return jnp.sum(mha(q, k, v, mask=m, backend="xla") * w)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx, name in zip(g_flash, g_xla, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), rtol=2e-3, atol=2e-4, err_msg=f"d{name}")
