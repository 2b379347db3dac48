"""Augmentation suite — device-side jax color/erasing + host-side crops.

Capability parity with the reference augmentation stack:
  * ColorJitter (datasets/utils/transformations.py:14-243): brightness /
    contrast / saturation / hue with consistent-or-per-frame factors,
    random op order, probabilistic grayscale;
  * RandomErasing (datasets/utils/random_erasing.py:26-100): const / rand /
    pixel fill, count range, 10-attempt geometry sampling;
  * AutoResizedCropVideo (:301-394) and CustomResizedCropVideo (:479-…):
    scale-jittered positional crops + bilinear resize.

TPU design: the reference runs color jitter / erasing on GPU when
``AUGMENTATION.USE_GPU`` (finetune presets do); here they are pure jax
functions applied inside the jitted train step — fused by XLA, zero extra
host work, batched over the whole clip batch.  The crop family stays on
the host (geometry on uint8 before the H2D copy).

Convention: device images are float in [0, 1] BEFORE mean/std
normalization for color ops (the reference jitters post-ToTensor,
pre-Normalize); RandomErasing applies AFTER normalization (timm semantics
— fill values are N(0,1) in normalized space).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# device-side color ops (reference transformations.py:120-298)
# ---------------------------------------------------------------------------


def _blend(img1: jnp.ndarray, img2: jnp.ndarray, ratio: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(ratio * img1 + (1.0 - ratio) * img2, 0.0, 1.0)


def _grayscale(img: jnp.ndarray) -> jnp.ndarray:
    """ITU-R 601-2 luma; img [..., 3] -> [..., 3] (replicated)."""
    lum = img @ jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    return jnp.repeat(lum[..., None], 3, axis=-1)


def adjust_brightness(img, factor):
    return _blend(img, jnp.zeros_like(img), factor)


def adjust_contrast(img, factor):
    # torch adjust_contrast blends with the mean of the grayscale image
    mean = _grayscale(img).mean(axis=(-3, -2, -1), keepdims=True)
    return _blend(img, mean, factor)


def adjust_saturation(img, factor):
    return _blend(img, _grayscale(img), factor)


def _rgb_to_hsv(img: jnp.ndarray) -> jnp.ndarray:
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = img.max(axis=-1)
    minc = img.min(axis=-1)
    eqc = maxc == minc
    cr = maxc - minc
    ones = jnp.ones_like(maxc)
    s = cr / jnp.where(eqc, ones, maxc)
    div = jnp.where(eqc, ones, cr)
    rc, gc, bc = (maxc - r) / div, (maxc - g) / div, (maxc - b) / div
    h = (
        (maxc == r) * (bc - gc)
        + ((maxc == g) & (maxc != r)) * (2.0 + rc - bc)
        + ((maxc != g) & (maxc != r)) * (4.0 + gc - rc)
    )
    h = jnp.mod(h / 6.0 + 1.0, 1.0)
    return jnp.stack([h, s, maxc], axis=-1)


def _hsv_to_rgb(img: jnp.ndarray) -> jnp.ndarray:
    h, s, v = img[..., 0], img[..., 1], img[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    i = i.astype(jnp.int32) % 6
    p = jnp.clip(v * (1.0 - s), 0.0, 1.0)
    q = jnp.clip(v * (1.0 - s * f), 0.0, 1.0)
    t = jnp.clip(v * (1.0 - s * (1.0 - f)), 0.0, 1.0)
    idx = i[..., None]
    a1 = jnp.stack([v, q, p, p, t, v], axis=-1)
    a2 = jnp.stack([t, v, v, q, p, p], axis=-1)
    a3 = jnp.stack([p, p, t, v, v, q], axis=-1)
    r = jnp.take_along_axis(a1, idx, axis=-1)[..., 0]
    g = jnp.take_along_axis(a2, idx, axis=-1)[..., 0]
    b = jnp.take_along_axis(a3, idx, axis=-1)[..., 0]
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(img, factor):
    hsv = _rgb_to_hsv(img)
    h = jnp.mod(hsv[..., 0] + factor, 1.0)
    return _hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))


def color_jitter(
    rng: jax.Array,
    clip: jnp.ndarray,
    brightness: float = 0.0,
    contrast: float = 0.0,
    saturation: float = 0.0,
    hue: float = 0.0,
    grayscale: float = 0.0,
    consistent: bool = True,
    shuffle: bool = True,
    gray_first: bool = True,
) -> jnp.ndarray:
    """clip: float [T, H, W, 3] in [0, 1] (or any leading batch dims with T
    second-to-4th-last).  Factors sampled like the reference (:38-68):
    brightness/contrast/saturation uniform in [max(0,1-v), 1+v], hue in
    [-v, v]; ``consistent`` shares one factor across frames, otherwise
    per-frame.  ``shuffle`` randomizes the op order per call (in-graph
    lax.switch over op indices)."""
    t = clip.shape[-4]
    fac_shape = () if consistent else (t, 1, 1, 1)
    k = jax.random.split(rng, 7)

    def unif(key, lo, hi, shape):
        return jax.random.uniform(key, shape, jnp.float32, lo, hi)

    b_f = unif(k[0], max(0.0, 1.0 - brightness), 1.0 + brightness, fac_shape)
    c_f = unif(k[1], max(0.0, 1.0 - contrast), 1.0 + contrast, fac_shape)
    s_f = unif(k[2], max(0.0, 1.0 - saturation), 1.0 + saturation, fac_shape)
    h_f = unif(k[3], -hue, hue, fac_shape[:-1] if fac_shape else ())

    ops = [
        (brightness > 0, lambda x: adjust_brightness(x, b_f)),
        (contrast > 0, lambda x: adjust_contrast(x, c_f)),
        (saturation > 0, lambda x: adjust_saturation(x, s_f)),
        (hue > 0, lambda x: adjust_hue(x, h_f)),
    ]
    active = [fn for on, fn in ops if on]
    if active:
        if shuffle and len(active) > 1:
            order = jax.random.permutation(k[4], len(active))
            for step in range(len(active)):
                clip = jax.lax.switch(order[step], active, clip)
        else:
            for fn in active:
                clip = fn(clip)

    if grayscale > 0:
        do_gray = jax.random.uniform(k[5]) < grayscale
        gray = _grayscale(clip)
        clip = jnp.where(do_gray, gray, clip)
        # gray_first only changes op composition order when gray triggers;
        # applying gray last is equivalent for the default (gray replaces
        # hue/sat changes); kept for API parity
        _ = gray_first
    return clip


# ---------------------------------------------------------------------------
# device-side RandomErasing (reference random_erasing.py:26-100)
# ---------------------------------------------------------------------------


def random_erasing(
    rng: jax.Array,
    batch: jnp.ndarray,
    probability: float = 0.25,
    area_range: Tuple[float, float] = (0.02, 0.33),
    min_aspect: float = 0.3,
    mode: str = "const",
    count: Tuple[int, int] = (1, 1),
    num_splits: int = 0,
) -> jnp.ndarray:
    """batch: float [B, T, H, W, 3] in NORMALIZED space.  Per-sample: with
    ``probability``, erase 1..max_count rectangles; geometry via the
    timm 10-attempt loop (first valid candidate wins); fill is 0 (const),
    one N(0,1) color per block (rand), or N(0,1) per pixel (pixel)."""
    b, t, img_h, img_w, c = batch.shape
    log_lo, log_hi = math.log(min_aspect), math.log(1.0 / min_aspect)
    min_count, max_count = count
    area = float(img_h * img_w)
    attempts = 10

    def erase_one(key, img):
        k_on, k_cnt, k_geo, k_fill = jax.random.split(key, 4)
        on = jax.random.uniform(k_on) < probability
        n = (
            jnp.asarray(min_count)
            if min_count == max_count
            else jax.random.randint(k_cnt, (), min_count, max_count + 1)
        )
        mask_total = jnp.zeros((img_h, img_w, 1), jnp.bool_)
        fill = jnp.zeros_like(img)
        geo_keys = jax.random.split(k_geo, max_count)
        fill_keys = jax.random.split(k_fill, max_count)
        for blk in range(max_count):
            ka, kr, kt, kl = jax.random.split(geo_keys[blk], 4)
            tgt = jax.random.uniform(ka, (attempts,), jnp.float32, area_range[0], area_range[1]) * area / jnp.maximum(n, 1)
            ratio = jnp.exp(jax.random.uniform(kr, (attempts,), jnp.float32, log_lo, log_hi))
            hh = jnp.round(jnp.sqrt(tgt * ratio)).astype(jnp.int32)
            ww = jnp.round(jnp.sqrt(tgt / ratio)).astype(jnp.int32)
            valid = (ww < img_w) & (hh < img_h)
            pick = jnp.argmax(valid)  # first valid attempt (timm order)
            any_valid = valid.any()
            h_, w_ = hh[pick], ww[pick]
            top = jax.random.randint(kt, (), 0, jnp.maximum(img_h - h_, 1))
            left = jax.random.randint(kl, (), 0, jnp.maximum(img_w - w_, 1))
            rows = jnp.arange(img_h)[:, None, None]
            cols = jnp.arange(img_w)[None, :, None]
            m = (rows >= top) & (rows < top + h_) & (cols >= left) & (cols < left + w_)
            use = any_valid & (blk < n)
            mask_total = mask_total | (m & use)
            if mode == "rand":
                color = jax.random.normal(fill_keys[blk], (1, 1, 1, c), img.dtype)
                fill = jnp.where(m & use, color, fill)
            elif mode == "pixel":
                noise = jax.random.normal(fill_keys[blk], (t, img_h, img_w, c), img.dtype)
                fill = jnp.where(m & use, noise, fill)
        erased = jnp.where(mask_total, fill, img)
        return jnp.where(on, erased, img)

    keys = jax.random.split(rng, b)
    out = jax.vmap(erase_one)(keys, batch)
    if num_splits > 1:
        # keep the first 1/num_splits of the batch clean (timm split mode)
        clean = b // num_splits
        out = jnp.concatenate([batch[:clean], out[clean:]], axis=0)
    return out


def apply_train_augment(rng: jax.Array, batch: jnp.ndarray, cfg, mean, std) -> jnp.ndarray:
    """Device-side train-time augmentation + normalization for the
    classification step: uint8 [B, T, H, W, 3] -> normalized float32.
    Order follows the reference GPU path: ToFloat -> ColorJitter ->
    Normalize -> RandomErasing."""
    aug = cfg.AUGMENTATION
    x = batch.astype(jnp.float32) / 255.0
    k1, k2 = jax.random.split(rng)
    if bool(aug.get("COLOR_AUG", False)):
        x = color_jitter_batch(
            k1,
            x,
            brightness=float(aug.get("BRIGHTNESS", 0.0) or 0.0),
            contrast=float(aug.get("CONTRAST", 0.0) or 0.0),
            saturation=float(aug.get("SATURATION", 0.0) or 0.0),
            hue=float(aug.get("HUE", 0.0) or 0.0),
            grayscale=float(aug.get("GRAYSCALE", 0.0) or 0.0),
            consistent=bool(aug.get("CONSISTENT", True)),
            shuffle=bool(aug.get("SHUFFLE", True)),
            gray_first=bool(aug.get("GRAY_FIRST", True)),
        )
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    x = (x - mean) / std
    re = aug.get("RANDOM_ERASING", {})
    if hasattr(re, "get") and bool(re.get("ENABLE", False)):
        x = random_erasing(
            k2,
            x,
            probability=float(re.get("PROB", 0.25) or 0.25),
            area_range=tuple(re.get("AREA_RANGE", (0.02, 0.33))),
            min_aspect=float(re.get("MIN_ASPECT", 0.3) or 0.3),
            mode=str(re.get("MODE", "const") or "const"),
            count=tuple(int(v) for v in re.get("COUNT", (1, 1))),
            num_splits=int(re.get("NUM_SPLITS", 0) or 0),
        )
    return x


def _grayscale_cf(img: jnp.ndarray) -> jnp.ndarray:
    """ITU-R 601-2 luma, channel-FIRST [..., 3, H, W] -> same shape."""
    w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    lum = (img * w[:, None, None]).sum(axis=-3, keepdims=True)
    return jnp.broadcast_to(lum, img.shape)


def _adjust_hue_cf(img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    """Hue shift, channel-first; pure where-chains (no size-3/6 minor-dim
    stacks or gathers, which would be lane-padded on TPU)."""
    r, g, b = img[..., 0, :, :], img[..., 1, :, :], img[..., 2, :, :]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    eqc = maxc == minc
    cr = maxc - minc
    ones = jnp.ones_like(maxc)
    s = cr / jnp.where(eqc, ones, maxc)
    div = jnp.where(eqc, ones, cr)
    rc, gc, bc = (maxc - r) / div, (maxc - g) / div, (maxc - b) / div
    h = (
        (maxc == r) * (bc - gc)
        + ((maxc == g) & (maxc != r)) * (2.0 + rc - bc)
        + ((maxc != g) & (maxc != r)) * (4.0 + gc - rc)
    )
    h = jnp.mod(h / 6.0 + 1.0 + factor, 1.0)

    v = maxc
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    i = i.astype(jnp.int32) % 6
    p = jnp.clip(v * (1.0 - s), 0.0, 1.0)
    q = jnp.clip(v * (1.0 - s * f), 0.0, 1.0)
    t = jnp.clip(v * (1.0 - s * (1.0 - f)), 0.0, 1.0)

    def pick(c0, c1, c2, c3, c4, c5):
        return jnp.where(
            i == 0, c0, jnp.where(i == 1, c1, jnp.where(i == 2, c2, jnp.where(i == 3, c3, jnp.where(i == 4, c4, c5))))
        )

    r2 = pick(v, q, p, p, t, v)
    g2 = pick(t, v, v, q, p, p)
    b2 = pick(p, p, t, v, v, q)
    return jnp.stack([r2, g2, b2], axis=-3)


def color_jitter_batch(
    rng: jax.Array,
    clips: jnp.ndarray,
    brightness: float = 0.0,
    contrast: float = 0.0,
    saturation: float = 0.0,
    hue: float = 0.0,
    grayscale: float = 0.0,
    consistent: bool = True,
    shuffle: bool = True,
    gray_first: bool = True,
) -> jnp.ndarray:
    """Batched ColorJitter: clips [N, T, H, W, 3] float in [0, 1], one
    factor draw per clip (CONSISTENT=true) or per frame.

    Perf-critical design: vmapping ``color_jitter``'s per-clip
    ``lax.switch`` turns the switch into a select that executes EVERY
    branch for EVERY clip at EVERY step (16 full-tensor passes incl. two
    RGB<->HSV conversions — measured ~570 ms for 60 clips on v5e).  Here
    ONE op order is drawn per call and ``lax.switch`` over the 24
    precomposed orders runs exactly len(active) ops over the whole batch;
    factor draws stay per-clip.  Divergence from the reference: the
    shuffle order is shared across the batch per step instead of per clip
    (factor distributions are unchanged); documented in PARITY.md."""
    import itertools

    n, t = clips.shape[0], clips.shape[1]
    fshape = (n, 1, 1, 1, 1) if consistent else (n, t, 1, 1, 1)
    k = jax.random.split(rng, 6)

    def unif(key, lo, hi, shape):
        return jax.random.uniform(key, shape, jnp.float32, lo, hi)

    b_f = unif(k[0], max(0.0, 1.0 - brightness), 1.0 + brightness, fshape)
    c_f = unif(k[1], max(0.0, 1.0 - contrast), 1.0 + contrast, fshape)
    s_f = unif(k[2], max(0.0, 1.0 - saturation), 1.0 + saturation, fshape)
    h_f = unif(k[3], -hue, hue, fshape[:-1])

    # channel-FIRST internally: a [..., 3]-minor tensor is lane-padded
    # 3 -> 128 on TPU, so every channel-last pass costs ~42x its real
    # bytes (measured: 260 ms for ONE brightness blend over 60 clips).
    # [N, T, 3, H, W] keeps the big W in the lane dim; two transposes at
    # the boundary cost ~2 real passes total.
    x = jnp.moveaxis(clips, -1, 2)

    ops = [
        (brightness > 0, lambda v: _blend(v, jnp.zeros_like(v), b_f)),
        (contrast > 0, lambda v: _blend(v, _grayscale_cf(v).mean(axis=(-3, -2, -1), keepdims=True), c_f)),
        (saturation > 0, lambda v: _blend(v, _grayscale_cf(v), s_f)),
        (hue > 0, lambda v: _adjust_hue_cf(v, h_f)),
    ]
    active = [fn for on, fn in ops if on]
    if active:
        if shuffle and len(active) > 1:
            perms = list(itertools.permutations(range(len(active))))

            def compose(order):
                def run(v):
                    for i in order:
                        v = active[i](v)
                    return v

                return run

            idx = jax.random.randint(k[4], (), 0, len(perms))
            x = jax.lax.switch(idx, [compose(p) for p in perms], x)
        else:
            for fn in active:
                x = fn(x)

    if grayscale > 0:
        do_gray = jax.random.uniform(k[5], (n, 1, 1, 1, 1)) < grayscale
        x = jnp.where(do_gray, _grayscale_cf(x), x)
        _ = gray_first
    return jnp.moveaxis(x, 2, -1)


def fewshot_train_augment(rng: jax.Array, clips: jnp.ndarray, cfg, mean, std, is_query: bool) -> jnp.ndarray:
    """Device-side tail of the reference's EPISODIC train stacks
    (ssv2_few_shot.py:528-613): ColorJitter -> Normalize -> RandomErasing,
    with the stacks' different gates — QUERY clips are jittered
    UNCONDITIONALLY (transform_query appends ColorJitter outside any
    flag), support clips only under AUGMENTATION.COLOR_AUG; RandomErasing
    honors its own ENABLE in both stacks, and the support stack can be
    opted out via AUGMENTATION.NO_RANDOM_ERASE.

    clips: uint8 [N, T, H, W, 3] -> normalized float32 (one consistent
    jitter draw per clip, CONSISTENT=true semantics)."""
    aug = cfg.AUGMENTATION if "AUGMENTATION" in cfg else {}
    x = clips.astype(jnp.float32) / 255.0
    k1, k2 = jax.random.split(rng)
    if is_query or bool(aug.get("COLOR_AUG", False)):
        x = color_jitter_batch(
            k1,
            x,
            brightness=float(aug.get("BRIGHTNESS", 0.0) or 0.0),
            contrast=float(aug.get("CONTRAST", 0.0) or 0.0),
            saturation=float(aug.get("SATURATION", 0.0) or 0.0),
            hue=float(aug.get("HUE", 0.0) or 0.0),
            grayscale=float(aug.get("GRAYSCALE", 0.0) or 0.0),
            consistent=bool(aug.get("CONSISTENT", True)),
            shuffle=bool(aug.get("SHUFFLE", True)),
            gray_first=bool(aug.get("GRAY_FIRST", True)),
        )
    x = (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
    re = aug.get("RANDOM_ERASING", {})
    erase = hasattr(re, "get") and bool(re.get("ENABLE", False))
    if erase and not is_query and bool(aug.get("NO_RANDOM_ERASE", False)):
        erase = False
    if erase:
        x = random_erasing(
            k2,
            x,
            probability=float(re.get("PROB", 0.25) or 0.25),
            area_range=tuple(re.get("AREA_RANGE", (0.02, 0.33))),
            min_aspect=float(re.get("MIN_ASPECT", 0.3) or 0.3),
            mode=str(re.get("MODE", "const") or "const"),
            count=tuple(int(v) for v in re.get("COUNT", (1, 1))),
            num_splits=int(re.get("NUM_SPLITS", 0) or 0),
        )
    return x


# ---------------------------------------------------------------------------
# host-side positional crop family (reference transformations.py:301-478)
# ---------------------------------------------------------------------------

_CROP_MODES = ("cc", "ll", "rr", "tl", "tr", "bl", "br")


def _crop_box(mode: str, img_h: int, img_w: int, crop_size: int) -> Tuple[int, int]:
    """(y1, x1) for a named crop position (reference :338-384)."""
    cx, cy, half = img_w // 2, img_h // 2, crop_size // 2
    if mode == "cc":
        return cy - half, cx - half
    if mode == "ll":
        return cy - half, 0
    if mode == "rr":
        return cy - half, img_w - crop_size
    if mode == "tl":
        return 0, 0
    if mode == "tr":
        return 0, img_w - crop_size
    if mode == "bl":
        return img_h - crop_size, 0
    if mode == "br":
        return img_h - crop_size, img_w - crop_size
    raise ValueError(f"unknown crop mode {mode!r}")


def _resize_clip(frames: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    import cv2

    t = frames.shape[0]
    out = np.empty((t, size[0], size[1], frames.shape[3]), dtype=frames.dtype)
    for i in range(t):
        out[i] = cv2.resize(frames[i], (size[1], size[0]), interpolation=cv2.INTER_LINEAR)
    return out


def auto_resized_crop(
    frames: np.ndarray,
    size: int,
    rng: np.random.Generator,
    scale: Tuple[float, float] = (0.08, 1.0),
    mode: str = "cc",
    spatial_idx: int = 0,
) -> np.ndarray:
    """AutoResizedCropVideo (reference :301-394): a scale-jittered crop at
    the position named by mode[idx:idx+2], resized to ``size``.  frames:
    uint8 [T, H, W, 3]."""
    crop_mode = mode[spatial_idx : spatial_idx + 2]
    t, h, w, _ = frames.shape
    s = rng.uniform(scale[0], scale[1])
    crop_size = max(int(min(h, w) * s), 1)
    y1, x1 = _crop_box(crop_mode, h, w, crop_size)
    y1, x1 = max(y1, 0), max(x1, 0)
    crop = frames[:, y1 : y1 + crop_size, x1 : x1 + crop_size]
    return _resize_clip(crop, (size, size))


def custom_resized_crop(
    frames: np.ndarray,
    size: int,
    rng: np.random.Generator,
    scale: Tuple[float, float] = (0.08, 1.0),
    mode: int = 1,
) -> np.ndarray:
    """CustomResizedCropVideo (reference :479-…): mode 1 -> one center
    crop [1, T, size, size, 3]; mode 3 -> center/left/right crops stacked
    [3, T, size, size, 3], all at one shared random scale."""
    t, h, w, _ = frames.shape
    s = rng.uniform(scale[0], scale[1])
    crop_size = max(int(min(h, w) * s), 1)
    positions = ["cc"] if mode == 1 else ["cc", "ll", "rr"]
    crops = []
    for pos in positions:
        y1, x1 = _crop_box(pos, h, w, crop_size)
        y1, x1 = max(y1, 0), max(x1, 0)
        crop = frames[:, y1 : y1 + crop_size, x1 : x1 + crop_size]
        crops.append(_resize_clip(crop, (size, size)))
    return np.stack(crops, axis=0)
