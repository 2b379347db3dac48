"""OTAM — Ordered Temporal Alignment Module distance, XLA-native.

Math-equivalent to the reference's sequential 2-D soft-min recurrence
(OTAM_cum_dist_v2, models/base/few_shot.py:2657-2687):

  * the support axis is zero-padded by one column on each side;
  * row 0 is a running sum;
  * interior cells soft-min over {up-left, left}; the first and last
    padded columns additionally admit the {up} transition;
  * result is the bottom-right cell.

TPU design: the grid is tiny (Tq x (Ts+2) = 8x10 for every published
config) but strictly sequential, so the recurrence is *unrolled at trace
time* into ~Tq*Ts cheap VPU ops, fully vectorized over the
[n_queries x n_support (x episode-batch via vmap)] leading axes.  The
soft-min uses logsumexp for stability (exact same function the reference
computes with raw exp/log).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from jax.scipy.special import logsumexp


def _softmin(values: Sequence[jnp.ndarray], lbda: float) -> jnp.ndarray:
    """-lbda * log(sum_i exp(-v_i / lbda)), computed stably."""
    stacked = jnp.stack(values, axis=0)
    return -lbda * logsumexp(-stacked / lbda, axis=0)


def otam_cum_dist(dists: jnp.ndarray, lbda: float = 0.5) -> jnp.ndarray:
    """One-directional OTAM cumulative distance.

    dists: [..., Tq, Ts] frame-to-frame distances (query rows, support
    columns).  Returns [...] cumulative alignment distance.
    """
    *batch, tq, ts = dists.shape
    d = jnp.pad(dists, [(0, 0)] * len(batch) + [(0, 0), (1, 1)])
    w = ts + 2
    zero = jnp.zeros(tuple(batch), dtype=dists.dtype)

    # row 0: running sum along the padded columns (cum[0,0] stays 0)
    prev = [zero]
    for m in range(1, w):
        prev.append(prev[-1] + d[..., 0, m])

    for l in range(1, tq):
        row = [zero]
        # first non-zero column admits {up-left(=0-col), up, left(=0-col)}
        row.append(d[..., l, 1] + _softmin([prev[0], prev[1], zero], lbda))
        # interior columns admit {up-left, left}
        for m in range(2, w - 1):
            row.append(d[..., l, m] + _softmin([prev[m - 1], row[-1]], lbda))
        # last (padded) column admits {up-left, up, left}
        row.append(d[..., l, w - 1] + _softmin([prev[w - 2], prev[w - 1], row[-1]], lbda))
        prev = row

    return prev[-1]


def otam_distance(dists: jnp.ndarray, lbda: float = 0.5, single_direction: bool = False) -> jnp.ndarray:
    """Bidirectional OTAM (reference few_shot.py:2823-2832): query->support
    plus support->query (transposed grid) unless single_direction."""
    fwd = otam_cum_dist(dists, lbda)
    if single_direction:
        return fwd
    return fwd + otam_cum_dist(jnp.swapaxes(dists, -1, -2), lbda)
