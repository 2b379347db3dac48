"""Host-side video decode backends.

The reference decodes with decord (C++/FFmpeg, datasets/base/base_dataset.py
:210-280).  decord/PyAV/ffmpeg are absent from this image; OpenCV (with its
bundled codecs) is present.  Decoders are registered so sites with other
stacks can plug in.

Contract: a decoder exposes ``length(path) -> int`` and
``read(path, indices) -> uint8 [len(indices), H, W, 3]`` (RGB).  Frame
selection stays on the host; resize/crop happen downstream.
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional, Sequence

import numpy as np

from clip_fsar_tpu.utils.registry import DECODER_REGISTRY


@DECODER_REGISTRY.register(name="synthetic")
class SyntheticDecoder:
    """Deterministic procedural video derived from the path hash.

    Each class of synthetic motion is keyed by the path, so golden tests
    and benchmarks get stable, non-trivial inputs with zero I/O.
    """

    def __init__(self, height: int = 128, width: int = 160, min_len: int = 40, max_len: int = 120):
        self.height, self.width = height, width
        self.min_len, self.max_len = min_len, max_len

    def _seed(self, path: str) -> int:
        return int.from_bytes(hashlib.md5(path.encode()).digest()[:4], "little")

    def length(self, path: str) -> int:
        return self.min_len + self._seed(path) % (self.max_len - self.min_len)

    def read(self, path: str, indices: Sequence[int]) -> np.ndarray:
        seed = self._seed(path)
        rng = np.random.RandomState(seed)
        base = rng.randint(0, 256, size=(self.height, self.width, 3)).astype(np.uint8)
        vx, vy = int(rng.randint(1, 6)), int(rng.randint(1, 6))
        out = np.empty((len(indices), self.height, self.width, 3), dtype=np.uint8)
        for i, t in enumerate(indices):
            frame = base.copy()
            # a moving bright square gives the frames temporal structure
            y = (vy * int(t) * 4) % (self.height - 24)
            x = (vx * int(t) * 4) % (self.width - 24)
            frame[y : y + 24, x : x + 24] = 255 - (seed % 128)
            out[i] = frame
        return out


@DECODER_REGISTRY.register(name="image_folder")
class ImageFolderDecoder:
    """Frames stored as ordered image files in a directory per video."""

    EXTS = (".jpg", ".jpeg", ".png")

    def _files(self, path: str):
        return sorted(f for f in os.listdir(path) if f.lower().endswith(self.EXTS))

    def length(self, path: str) -> int:
        return len(self._files(path))

    def read(self, path: str, indices: Sequence[int]) -> np.ndarray:
        from PIL import Image

        files = self._files(path)
        frames = []
        for t in indices:
            with Image.open(os.path.join(path, files[int(t)])) as im:
                frames.append(np.asarray(im.convert("RGB")))
        return np.stack(frames)


@DECODER_REGISTRY.register(name="opencv")
class OpenCVDecoder:
    """cv2.VideoCapture decode; reads sequentially and keeps wanted frames
    (sequential grab beats per-frame seeking for the near-uniform index
    patterns the samplers produce)."""

    def length(self, path: str) -> int:
        import cv2

        cap = cv2.VideoCapture(path)
        try:
            n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        finally:
            cap.release()
        if n <= 0:
            raise IOError(f"Cannot read frame count from {path}")
        return n

    def fps(self, path: str) -> float:
        import cv2

        cap = cv2.VideoCapture(path)
        try:
            return float(cap.get(cv2.CAP_PROP_FPS)) or 30.0
        finally:
            cap.release()

    def read(self, path: str, indices: Sequence[int]) -> np.ndarray:
        import cv2

        wanted = sorted(set(int(i) for i in indices))
        cap = cv2.VideoCapture(path)
        got = {}
        try:
            pos = 0
            for target in wanted:
                while pos < target:
                    if not cap.grab():
                        break
                    pos += 1
                ok, frame = cap.read()
                if not ok:
                    break
                pos += 1
                got[target] = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        finally:
            cap.release()
        if not got:
            raise IOError(f"Decoded zero frames from {path}")
        last = got[max(got)]
        return np.stack([got.get(int(i), last) for i in indices])


def build_decoder(name: str, data_root: Optional[str] = None):
    """'auto' picks opencv when the data root exists, synthetic otherwise."""
    if name == "auto":
        if data_root and os.path.isdir(data_root):
            name = "opencv"
        else:
            name = "synthetic"
    return DECODER_REGISTRY.get(name)()
