"""Host-side spatial transforms (numpy/cv2) + device-side normalization.

Behavioral parity with the reference's few-shot pipeline
(datasets/utils/transformations.py:663-746 KineticsResizedCropFewshot and
the transform stacks in ssv2_few_shot.py:528-642): bilinear short-side
resize into [min,max] jitter range, random crop at train / indexed
controlled crop at test, optional horizontal flip, CLIP mean/std
normalization.

TPU split of responsibilities: decode/resize/crop stay on the host and
emit uint8 (4x less host->HBM traffic than float32); the mean/std
normalize runs on device inside the jitted step (see ``normalize_images``)
where XLA fuses it into the first conv.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def resize_short_side(frames: np.ndarray, short_side: int) -> np.ndarray:
    """Bilinear resize so the shorter side == short_side.  frames: uint8
    [T, H, W, 3]."""
    import cv2

    t, h, w, _ = frames.shape
    if h <= w:
        nh, nw = short_side, int(round(w * short_side / h))
    else:
        nh, nw = int(round(h * short_side / w)), short_side
    if (nh, nw) == (h, w):
        return frames
    out = np.empty((t, nh, nw, 3), dtype=frames.dtype)
    for i in range(t):
        out[i] = cv2.resize(frames[i], (nw, nh), interpolation=cv2.INTER_LINEAR)
    return out


def random_crop(frames: np.ndarray, size: int, rng: np.random.Generator) -> np.ndarray:
    _, h, w, _ = frames.shape
    y = int(rng.integers(0, h - size + 1))
    x = int(rng.integers(0, w - size + 1))
    return frames[:, y : y + size, x : x + size]


def controlled_crop(frames: np.ndarray, size: int, spatial_idx: int = 1, num_crops: int = 1) -> np.ndarray:
    """Test-time crop: center by default; for multi-crop testing the index
    walks along the longer side (reference transformations.py:676-716)."""
    _, h, w, _ = frames.shape
    if num_crops == 1 or spatial_idx == -1:
        y, x = (h - size) // 2, (w - size) // 2
    else:
        frac = spatial_idx / max(num_crops - 1, 1)
        if h >= w:
            y, x = int((h - size) * frac), (w - size) // 2
        else:
            y, x = (h - size) // 2, int((w - size) * frac)
    return frames[:, y : y + size, x : x + size]


def horizontal_flip(frames: np.ndarray, rng: np.random.Generator, p: float = 0.5) -> np.ndarray:
    if rng.random() < p:
        return frames[:, :, ::-1]
    return frames


def _short_side_dims(h: int, w: int, short: int):
    if h <= w:
        return short, int(round(w * short / h))
    return int(round(h * short / w)), short


def _fixed_point_taps(src: int, dst: int, begin: int, count: int):
    """Bilinear taps with 8-bit fixed-point weights — the exact math of
    the native kernel (clip_fsar_tpu/native/frameops.cpp)."""
    s = (np.arange(begin, begin + count, dtype=np.float64) + 0.5) * (src / dst) - 0.5
    s = np.maximum(s, 0.0)
    lo = np.minimum(s.astype(np.int64), src - 1)
    hi = np.minimum(lo + 1, src - 1)
    w = np.floor((s - lo) * 256.0 + 0.5).astype(np.int64)
    return lo, hi, w


def _np_resize_crop_flip(
    frames: np.ndarray, nh: int, nw: int, y: int, x: int, size: int, flip: bool, size_w: int = 0
) -> np.ndarray:
    """Pure-numpy replica of the native fixed-point kernel — pixel-
    identical output, used when the C++ toolchain is unavailable so data
    pipelines stay deterministic across environments."""
    t, h, w, _ = frames.shape
    ylo, yhi, wy = _fixed_point_taps(h, nh, y, size)
    xlo, xhi, wx = _fixed_point_taps(w, nw, x, size_w or size)
    f = frames.astype(np.int64)
    # horizontal pass (value * 256)
    row = f[:, :, xlo] * (256 - wx)[None, None, :, None] + f[:, :, xhi] * wx[None, None, :, None]
    # vertical blend (value * 256 * 256) with the kernel's rounding
    v = row[:, ylo] * (256 - wy)[None, :, None, None] + row[:, yhi] * wy[None, :, None, None]
    out = ((v + (1 << 15)) >> 16).astype(np.uint8)
    return np.ascontiguousarray(out[:, :, ::-1]) if flip else out


def _fused_resize_crop(frames: np.ndarray, nh: int, nw: int, y: int, x: int, size: int, flip: bool) -> np.ndarray:
    """Resize to (nh, nw), crop [size, size] at (y, x), flip the crop —
    one native C++ pass when available (only cropped pixels computed;
    within +/-1 LSB of cv2 INTER_LINEAR), numpy fixed-point replica
    otherwise (pixel-identical to the native kernel)."""
    from clip_fsar_tpu.native import frameops

    if frameops.available():
        return frameops.resize_crop_flip(frames, nh, nw, y, x, size, size, flip)
    return _np_resize_crop_flip(frames, nh, nw, y, x, size, flip)


def train_transform(frames: np.ndarray, cfg, rng: np.random.Generator) -> np.ndarray:
    """uint8 [T,H,W,3] -> uint8 [T,crop,crop,3] (train augmentation):
    short-side jitter resize + random crop + horizontal flip, fused."""
    lo, hi = int(cfg.DATA.TRAIN_JITTER_SCALES[0]), int(cfg.DATA.TRAIN_JITTER_SCALES[1])
    short = lo if lo == hi else int(rng.integers(lo, hi + 1))
    flip = bool(rng.random() < 0.5)
    size = int(cfg.DATA.TRAIN_CROP_SIZE)
    t, h, w, _ = frames.shape
    nh, nw = _short_side_dims(h, w, short)
    y = int(rng.integers(0, nh - size + 1))
    x = int(rng.integers(0, nw - size + 1))
    return _fused_resize_crop(frames, nh, nw, y, x, size, flip)


def test_transform(frames: np.ndarray, cfg, spatial_idx: int = -1) -> np.ndarray:
    scale = cfg.DATA.TEST_SCALE
    short = int(scale[0]) if isinstance(scale, (list, tuple)) else int(scale)
    size = int(cfg.DATA.TEST_CROP_SIZE)
    num_crops = int(cfg.TEST.get("NUM_SPATIAL_CROPS", 1))
    t, h, w, _ = frames.shape
    nh, nw = _short_side_dims(h, w, short)
    if num_crops == 1 or spatial_idx == -1:
        y, x = (nh - size) // 2, (nw - size) // 2
    else:
        frac = spatial_idx / max(num_crops - 1, 1)
        if nh >= nw:
            y, x = int((nh - size) * frac), (nw - size) // 2
        else:
            y, x = (nh - size) // 2, int((nw - size) * frac)
    return _fused_resize_crop(frames, nh, nw, y, x, size, flip=False)


def _stretch_dims(cfg_scale) -> Tuple[int, int]:
    """KineticsResizedCropFewshot sizing (reference transformations.py
    :676-731): the clip is stretched to the FIXED size (scale[0],
    scale[1]) — height = scale[0], width = scale[1] (aspect-destroying
    with the shipped [256, 256] configs) — NOT a short-side resize."""
    if isinstance(cfg_scale, (list, tuple)):
        h = int(cfg_scale[0])
        w = int(cfg_scale[1]) if len(cfg_scale) > 1 else h
    else:
        h = w = int(cfg_scale)
    return h, w


def fewshot_train_stretch(frames: np.ndarray, cfg) -> np.ndarray:
    """The fixed-size stretch of fewshot_train_transform WITHOUT the crop
    or flip: uint8 [T,H,W,3] -> uint8 [T,nh,nw,3] at TRAIN_JITTER_SCALES.

    Because the stretch target is FIXED (not sampled — reference
    transformations.py:676-731 stretches every train clip to the same
    (scale[0], scale[1])), the random part of the train augmentation is
    only the (y, x) crop offset and the flip, both of which commute with
    storage: cropping rows [y, y+size) of this full stretched frame is
    bit-identical to the host's fused resize+crop (the fixed-point taps
    of _fixed_point_taps are computed in destination coordinates, so
    begin=y of a full resize equals begin=y of a windowed one).  This is
    what lets the train frame bank pre-assemble pixels on device without
    changing the augmentation distribution (data/frame_bank.py).
    """
    nh, nw = _stretch_dims(cfg.DATA.TRAIN_JITTER_SCALES)
    from clip_fsar_tpu.native import frameops

    if frameops.available():
        return frameops.resize_crop_flip(frames, nh, nw, 0, 0, nh, nw, False)
    return _np_resize_crop_flip(frames, nh, nw, 0, 0, nh, False, size_w=nw)


def fewshot_train_transform(frames: np.ndarray, cfg, rng: np.random.Generator, is_query: bool) -> np.ndarray:
    """Episodic train transform (reference ssv2_few_shot.py:528-613):
    [flip — query clips always, support only when AUGMENTATION.RANDOM_FLIP]
    then fixed-size stretch + random crop.  ColorJitter / RandomErasing of
    the same stacks run device-side in the jitted step (augment.py)."""
    nh, nw = _stretch_dims(cfg.DATA.TRAIN_JITTER_SCALES)
    size = int(cfg.DATA.TRAIN_CROP_SIZE)
    if is_query:
        flip = bool(rng.random() < 0.5)
    else:
        aug = cfg.AUGMENTATION if "AUGMENTATION" in cfg else {}
        flip = bool(aug.get("RANDOM_FLIP", False)) and bool(rng.random() < 0.5)
    # int(random.uniform(0, max)) of the reference lands in [0, max-1]
    y = int(rng.integers(0, max(nh - size, 1)))
    x = int(rng.integers(0, max(nw - size, 1)))
    return _fused_resize_crop(frames, nh, nw, y, x, size, flip)


def fewshot_test_transform(frames: np.ndarray, cfg) -> np.ndarray:
    """Episodic eval transform: fixed-size stretch + controlled crop
    (TEST_CENTER_CROP present -> controlled/center; reference
    ssv2_few_shot.py:614-642 + transformations.py:676-716)."""
    nh, nw = _stretch_dims(cfg.DATA.TEST_SCALE)
    size = int(cfg.DATA.TEST_CROP_SIZE)
    y, x = (nh - size) // 2, (nw - size) // 2
    return _fused_resize_crop(frames, nh, nw, y, x, size, flip=False)


def normalize_images(images, mean: Sequence[float], std: Sequence[float]):
    """Device-side: uint8/float [... ,3] -> normalized float32.  Call
    inside jit; XLA fuses it into the consumer."""
    import jax.numpy as jnp

    x = images.astype(jnp.float32) / 255.0
    mean = jnp.asarray(mean, dtype=jnp.float32)
    std = jnp.asarray(std, dtype=jnp.float32)
    return (x - mean) / std
