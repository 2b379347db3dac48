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
