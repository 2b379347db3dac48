"""Accuracy metrics (capability of reference utils/metrics.py).

All functions are pure jnp and jit-safe; they also accept numpy arrays.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def topk_correct(preds: jnp.ndarray, labels: jnp.ndarray, ks: Sequence[int]) -> list:
    """Number of correct predictions in the top-k, for each k.

    preds: [N, C] scores; labels: [N] int.  (reference metrics.py:100-138)
    """
    max_k = max(ks)
    # top-max_k indices, descending score
    top_idx = jnp.argsort(-preds, axis=-1)[:, :max_k]  # [N, max_k]
    hits = top_idx == labels[:, None].astype(top_idx.dtype)  # [N, max_k]
    return [jnp.sum(hits[:, :k]).astype(jnp.float32) for k in ks]


def topk_accuracies(preds: jnp.ndarray, labels: jnp.ndarray, ks: Sequence[int]) -> list:
    n = preds.shape[0]
    return [c * 100.0 / n for c in topk_correct(preds, labels, ks)]


def topk_errors(preds: jnp.ndarray, labels: jnp.ndarray, ks: Sequence[int]) -> list:
    return [100.0 - a for a in topk_accuracies(preds, labels, ks)]


def joint_topk_correct(
    preds_a: jnp.ndarray, preds_b: jnp.ndarray, labels_a: jnp.ndarray, labels_b: jnp.ndarray, ks: Sequence[int]
) -> Tuple[list, list, list]:
    """Joint verb x noun top-k (EPIC protocol, reference metrics.py:12-96).

    The joint score is the top-k over the FLATTENED product distribution
    softmax(verb) ⊗ softmax(noun) against the pair index verb*Nb + noun —
    NOT 'verb in top-k AND noun in top-k' (equivalent only at k=1).
    Returns (joint_correct, a_correct, b_correct) lists aligned with ks.
    """
    import jax

    max_k = max(ks)
    top_a = jnp.argsort(-preds_a, axis=-1)[:, :max_k]
    top_b = jnp.argsort(-preds_b, axis=-1)[:, :max_k]
    hit_a = top_a == labels_a[:, None].astype(top_a.dtype)
    hit_b = top_b == labels_b[:, None].astype(top_b.dtype)

    pa = jax.nn.softmax(preds_a, axis=-1)
    pb = jax.nn.softmax(preds_b, axis=-1)
    nb = preds_b.shape[-1]
    joint = (pa[:, :, None] * pb[:, None, :]).reshape(preds_a.shape[0], -1)
    joint_label = labels_a.astype(jnp.int64) * nb + labels_b.astype(jnp.int64)
    top_j = jnp.argsort(-joint, axis=-1)[:, :max_k]
    hit_j = top_j == joint_label[:, None].astype(top_j.dtype)

    out_joint, out_a, out_b = [], [], []
    for k in ks:
        out_joint.append(jnp.sum(jnp.any(hit_j[:, :k], axis=1)).astype(jnp.float32))
        out_a.append(jnp.sum(jnp.any(hit_a[:, :k], axis=1)).astype(jnp.float32))
        out_b.append(jnp.sum(jnp.any(hit_b[:, :k], axis=1)).astype(jnp.float32))
    return out_joint, out_a, out_b
