"""Mixup / CutMix / label smoothing (capability of reference
datasets/utils/mixup.py — timm-style), as pure jax functions applied
inside the jitted train step (device-side, fused by XLA) rather than in
DataLoader workers.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def smooth_one_hot(labels: jnp.ndarray, num_classes: int, smoothing: float = 0.0) -> jnp.ndarray:
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def _rand_bbox(rng, h: int, w: int, lam: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (h * ratio).astype(jnp.int32)
    cut_w = (w * ratio).astype(jnp.int32)
    r1, r2 = jax.random.split(rng)
    cy = jax.random.randint(r1, (), 0, h)
    cx = jax.random.randint(r2, (), 0, w)
    y1 = jnp.clip(cy - cut_h // 2, 0, h)
    y2 = jnp.clip(cy + cut_h // 2, 0, h)
    x1 = jnp.clip(cx - cut_w // 2, 0, w)
    x2 = jnp.clip(cx + cut_w // 2, 0, w)
    return y1, y2, x1, x2


def mixup_batch(
    rng: jax.Array,
    videos: jnp.ndarray,  # [B, T, H, W, C] float
    labels: jnp.ndarray,  # [B] int
    num_classes: int,
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 0.0,
    prob: float = 1.0,
    switch_prob: float = 0.5,
    smoothing: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batch-mode mixup/cutmix: one lambda per batch, mixed with the
    flipped batch.  Returns (videos, soft_targets)."""
    r_apply, r_switch, r_lam, r_box = jax.random.split(rng, 4)
    use = jax.random.uniform(r_apply) < prob
    use_cutmix = (cutmix_alpha > 0.0) & (jax.random.uniform(r_switch) < switch_prob) if mixup_alpha > 0 else cutmix_alpha > 0

    alpha = jnp.where(use_cutmix, cutmix_alpha, mixup_alpha)
    # beta(0, 0) is NaN; with both alphas 0 there is nothing to mix
    # (the reference asserts on this config, mixup.py:152) — degrade to
    # lam=1 (no-op) instead of silently NaN-ing every step
    safe_alpha = jnp.maximum(alpha, 1e-8)
    lam = jnp.where(use & (alpha > 0), jax.random.beta(r_lam, safe_alpha, safe_alpha), 1.0)

    flipped = videos[::-1]
    b, t, h, w, c = videos.shape

    def apply_mixup(_):
        return lam.astype(videos.dtype) * videos + (1 - lam).astype(videos.dtype) * flipped, lam

    def apply_cutmix(_):
        y1, y2, x1, x2 = _rand_bbox(r_box, h, w, lam)
        yy = jnp.arange(h)[None, None, :, None, None]
        xx = jnp.arange(w)[None, None, None, :, None]
        inside = (yy >= y1) & (yy < y2) & (xx >= x1) & (xx < x2)
        mixed = jnp.where(inside, flipped, videos)
        lam_adj = 1.0 - ((y2 - y1) * (x2 - x1)) / (h * w)
        return mixed, lam_adj

    mixed, lam_eff = jax.lax.cond(use_cutmix, apply_cutmix, apply_mixup, None)
    t1 = smooth_one_hot(labels, num_classes, smoothing)
    t2 = smooth_one_hot(labels[::-1], num_classes, smoothing)
    targets = lam_eff * t1 + (1 - lam_eff) * t2
    return mixed, targets
