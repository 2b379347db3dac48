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


def train_transform(frames: np.ndarray, cfg, rng: np.random.Generator) -> np.ndarray:
    """uint8 [T,H,W,3] -> uint8 [T,crop,crop,3] (train augmentation)."""
    lo, hi = int(cfg.DATA.TRAIN_JITTER_SCALES[0]), int(cfg.DATA.TRAIN_JITTER_SCALES[1])
    short = lo if lo == hi else int(rng.integers(lo, hi + 1))
    frames = horizontal_flip(frames, rng)
    frames = resize_short_side(frames, short)
    return random_crop(frames, int(cfg.DATA.TRAIN_CROP_SIZE), rng)


def test_transform(frames: np.ndarray, cfg, spatial_idx: int = -1) -> np.ndarray:
    scale = cfg.DATA.TEST_SCALE
    short = int(scale[0]) if isinstance(scale, (list, tuple)) else int(scale)
    frames = resize_short_side(frames, short)
    num_crops = int(cfg.TEST.get("NUM_SPATIAL_CROPS", 1))
    return controlled_crop(frames, int(cfg.DATA.TEST_CROP_SIZE), spatial_idx, num_crops)


def normalize_images(images, mean: Sequence[float], std: Sequence[float]):
    """Device-side: uint8/float [... ,3] -> normalized float32.  Call
    inside jit; XLA fuses it into the consumer."""
    import jax.numpy as jnp

    x = images.astype(jnp.float32) / 255.0
    mean = jnp.asarray(mean, dtype=jnp.float32)
    std = jnp.asarray(std, dtype=jnp.float32)
    return (x - mean) / std
