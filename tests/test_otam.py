"""OTAM recurrence vs an independent numpy oracle, plus shape/grad checks."""

import numpy as np
import jax
import jax.numpy as jnp

from clip_fsar_tpu.ops.otam import otam_cum_dist, otam_distance


def numpy_otam(dists: np.ndarray, lbda: float = 0.5) -> np.ndarray:
    """Direct-transcription oracle of the published OTAM recurrence
    (zero-padded support axis, asymmetric first/last-column soft-min)."""
    nq, ns, tq, ts = dists.shape
    d = np.pad(dists, ((0, 0), (0, 0), (0, 0), (1, 1)))
    w = ts + 2
    cum = np.zeros_like(d, dtype=np.float64)
    dd = d.astype(np.float64)
    for m in range(1, w):
        cum[:, :, 0, m] = dd[:, :, 0, m] + cum[:, :, 0, m - 1]
    for l in range(1, tq):
        cum[:, :, l, 1] = dd[:, :, l, 1] - lbda * np.log(
            np.exp(-cum[:, :, l - 1, 0] / lbda) + np.exp(-cum[:, :, l - 1, 1] / lbda) + np.exp(-cum[:, :, l, 0] / lbda)
        )
        for m in range(2, w - 1):
            cum[:, :, l, m] = dd[:, :, l, m] - lbda * np.log(
                np.exp(-cum[:, :, l - 1, m - 1] / lbda) + np.exp(-cum[:, :, l, m - 1] / lbda)
            )
        cum[:, :, l, w - 1] = dd[:, :, l, w - 1] - lbda * np.log(
            np.exp(-cum[:, :, l - 1, w - 2] / lbda)
            + np.exp(-cum[:, :, l - 1, w - 1] / lbda)
            + np.exp(-cum[:, :, l, w - 2] / lbda)
        )
    return cum[:, :, -1, -1]


def test_otam_matches_oracle():
    rng = np.random.RandomState(0)
    dists = rng.rand(5, 4, 8, 8).astype(np.float32) * 2.0  # cosine dists live in [0, 2]
    mine = np.asarray(otam_cum_dist(jnp.asarray(dists)))
    gold = numpy_otam(dists)
    np.testing.assert_allclose(mine, gold, rtol=1e-5, atol=1e-5)


def test_otam_lambda_and_rect_grids():
    rng = np.random.RandomState(1)
    dists = rng.rand(2, 3, 6, 9).astype(np.float32)
    for lbda in (0.1, 0.5):
        mine = np.asarray(otam_cum_dist(jnp.asarray(dists), lbda=lbda))
        np.testing.assert_allclose(mine, numpy_otam(dists, lbda=lbda), rtol=1e-5, atol=1e-5)


def test_otam_bidirectional_and_vmap():
    rng = np.random.RandomState(2)
    batch = rng.rand(3, 5, 4, 8, 8).astype(np.float32)
    single = np.stack([np.asarray(otam_distance(jnp.asarray(b))) for b in batch])
    vmapped = np.asarray(jax.vmap(otam_distance)(jnp.asarray(batch)))
    np.testing.assert_allclose(vmapped, single, rtol=1e-6)
    # bidirectional = fwd + transposed fwd
    d = jnp.asarray(batch[0])
    np.testing.assert_allclose(
        np.asarray(otam_distance(d)),
        np.asarray(otam_cum_dist(d) + otam_cum_dist(jnp.swapaxes(d, -1, -2))),
        rtol=1e-6,
    )


def test_otam_differentiable_and_jits():
    rng = np.random.RandomState(3)
    dists = jnp.asarray(rng.rand(2, 2, 8, 8).astype(np.float32))
    grad = jax.jit(jax.grad(lambda d: otam_distance(d).sum()))(dists)
    assert grad.shape == dists.shape
    assert bool(jnp.all(jnp.isfinite(grad)))
    # monotonicity sanity: alignment distance grows with uniform dist shift
    a = float(otam_cum_dist(dists).sum())
    b = float(otam_cum_dist(dists + 0.5).sum())
    assert b > a
