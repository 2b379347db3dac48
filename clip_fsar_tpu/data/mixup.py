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
    cy = jax.random.randint(r1, jnp.shape(lam), 0, h)
    cx = jax.random.randint(r2, jnp.shape(lam), 0, w)
    y1 = jnp.clip(cy - cut_h // 2, 0, h)
    y2 = jnp.clip(cy + cut_h // 2, 0, h)
    x1 = jnp.clip(cx - cut_w // 2, 0, w)
    x2 = jnp.clip(cx + cut_w // 2, 0, w)
    return y1, y2, x1, x2


def _rand_bbox_minmax(rng, h: int, w: int, minmax, shape=()) -> Tuple[jnp.ndarray, ...]:
    """timm cutmix_minmax boxes (reference mixup.py:64-87): cut size drawn
    uniformly from [min, max] image ratio per axis, position uniform among
    fully-inside placements.  Per-element upper bounds rule out
    jax.random.randint (scalar bounds only) — floor(uniform * range) draws
    the same discrete-uniform distribution."""
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    lo_h, hi_h = int(h * minmax[0]), int(h * minmax[1])
    lo_w, hi_w = int(w * minmax[0]), int(w * minmax[1])
    cut_h = jax.random.randint(r1, shape, lo_h, max(hi_h, lo_h + 1))
    cut_w = jax.random.randint(r2, shape, lo_w, max(hi_w, lo_w + 1))
    y1 = jnp.floor(jax.random.uniform(r3, shape) * (h - cut_h)).astype(jnp.int32)
    x1 = jnp.floor(jax.random.uniform(r4, shape) * (w - cut_w)).astype(jnp.int32)
    return y1, y1 + cut_h, x1, x1 + cut_w


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
    mode: str = "batch",
    cutmix_minmax=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """timm-style Mixup/CutMix (reference datasets/utils/mixup.py:103-318).

    mode 'batch': one lambda for the whole batch, mixed with the flipped
    batch.  mode 'elem': independent lambda/box per element.  mode 'pair':
    element i and B-1-i share one lambda/box and mix symmetrically.
    cutmix_minmax: draw cut sizes from this [min, max] image-ratio range
    instead of from lambda (forces cutmix_alpha=1.0 like the reference,
    mixup.py:125-128); the effective lambda is always corrected to the
    realized box area (correct_lam=True is the reference's hardcoded
    default).  Returns (videos, soft_targets).
    """
    if cutmix_minmax is not None:
        cutmix_alpha = 1.0
    if mode in ("elem", "pair"):
        return _mixup_per_element(
            rng, videos, labels, num_classes, mixup_alpha, cutmix_alpha,
            prob, switch_prob, smoothing, mode, cutmix_minmax,
        )
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
        if cutmix_minmax is not None:
            y1, y2, x1, x2 = _rand_bbox_minmax(r_box, h, w, cutmix_minmax)
        else:
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


def _mixup_per_element(
    rng, videos, labels, num_classes, mixup_alpha, cutmix_alpha,
    prob, switch_prob, smoothing, mode, cutmix_minmax,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """'elem'/'pair' modes (reference _mix_elem/_mix_pair + _params_per_elem,
    mixup.py:137-210), vectorized: per-element lambdas, cutmix switches and
    boxes as [B] arrays with jnp.where instead of the reference's python
    loop over the batch — one fused XLA kernel, no dynamic shapes.

    Element i always mixes with element B-1-i (the reference's j index);
    'pair' draws params for the first half and mirrors them so both
    partners see the same lambda and box."""
    b, t, h, w, c = videos.shape
    r_apply, r_switch, r_lam_m, r_lam_c, r_box = jax.random.split(rng, 5)
    n = b // 2 if mode == "pair" else b
    if mode == "pair" and b % 2:
        raise ValueError("pair-mode mixup needs an even batch (reference mirrors half-batch params)")

    def full(x):  # [n] draw -> [B] per-element params
        return jnp.concatenate([x, x[::-1]], axis=0) if mode == "pair" else x

    has_mix, has_cut = mixup_alpha > 0.0, cutmix_alpha > 0.0
    if has_mix and has_cut:
        use_cutmix = jax.random.uniform(r_switch, (n,)) < switch_prob
    else:
        use_cutmix = jnp.full((n,), has_cut)
    lam_mix = jnp.where(
        use_cutmix,
        jax.random.beta(r_lam_c, max(cutmix_alpha, 1e-8), max(cutmix_alpha, 1e-8), (n,)),
        jax.random.beta(r_lam_m, max(mixup_alpha, 1e-8), max(mixup_alpha, 1e-8), (n,)),
    )
    applied = (jax.random.uniform(r_apply, (n,)) < prob) & (has_mix | has_cut)
    lam = jnp.where(applied, lam_mix, 1.0)

    # cutmix boxes per element (only consulted where use_cutmix & applied)
    if cutmix_minmax is not None:
        y1, y2, x1, x2 = _rand_bbox_minmax(r_box, h, w, cutmix_minmax, (n,))
    else:
        y1, y2, x1, x2 = _rand_bbox(r_box, h, w, lam)
    lam_cut = 1.0 - ((y2 - y1) * (x2 - x1)) / float(h * w)  # correct_lam

    use_cutmix, applied = full(use_cutmix), full(applied)
    lam, lam_cut = full(lam), full(lam_cut)
    y1, y2, x1, x2 = full(y1), full(y2), full(x1), full(x2)

    flipped = videos[::-1]
    ex = lambda v: v[:, None, None, None, None].astype(videos.dtype)  # [B] -> broadcast
    mixed_mix = ex(lam) * videos + ex(1.0 - lam) * flipped
    yy = jnp.arange(h)[None, None, :, None, None]
    xx = jnp.arange(w)[None, None, None, :, None]
    inside = (
        (yy >= y1[:, None, None, None, None]) & (yy < y2[:, None, None, None, None])
        & (xx >= x1[:, None, None, None, None]) & (xx < x2[:, None, None, None, None])
    )
    mixed_cut = jnp.where(inside & (use_cutmix & applied)[:, None, None, None, None], flipped, videos)

    take_cut = use_cutmix & applied
    mixed = jnp.where(take_cut[:, None, None, None, None], mixed_cut, jnp.where(applied[:, None, None, None, None], mixed_mix, videos))
    lam_eff = jnp.where(take_cut, lam_cut, lam)

    t1 = smooth_one_hot(labels, num_classes, smoothing)
    t2 = smooth_one_hot(labels[::-1], num_classes, smoothing)
    targets = lam_eff[:, None] * t1 + (1.0 - lam_eff)[:, None] * t2
    return mixed, targets
