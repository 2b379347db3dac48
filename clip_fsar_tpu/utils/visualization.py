"""Feature-map visualization (reference models/base/base_blocks.py:23-63).

The reference registers a torch forward hook on every BaseModule when
``VISUALIZATION.ENABLE && VISUALIZATION.FEATURE_MAPS.ENABLE``, min-max
normalizes each block's [b,c,t,h,w] output over the channel axis and
tiles it as one grayscale image per sample ([c*h, t*w]) under
``BASE_OUTPUT_DIR/NAME/im_{id}/layer_{stage}_{block}_feature.jpg``.

The TPU-native equivalent has no mutable hooks: a single traced apply
with flax's ``capture_intermediates`` sows every residual-block output
into the ``intermediates`` collection (one extra pytree output of the
jitted eval step — no host sync per layer, no Python in the hot path),
and this module turns the captured tree into the reference's tiled
images on the host afterwards.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Tuple

import numpy as np

# module classes whose outputs the reference's BaseModule hook would have
# captured (branches / residual blocks of the conv backbones)
_CAPTURE_CLASSES = ("Base3DBlock",)


def feature_map_filter() -> Callable[[Any, str], bool]:
    """`capture_intermediates` predicate: residual-block outputs only
    (the reference hooks BaseModule subclasses, i.e. conv branches)."""

    def want(mdl, method_name: str) -> bool:
        return method_name == "__call__" and type(mdl).__name__ in _CAPTURE_CLASSES

    return want


def visualization_enabled(cfg) -> bool:
    viz = cfg.get("VISUALIZATION", None)
    if not viz or not viz.get("ENABLE", False):
        return False
    fm = viz.get("FEATURE_MAPS", None)
    return bool(fm and fm.get("ENABLE", False))


def _flatten(tree: Any, prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], np.ndarray]:
    out: Dict[Tuple[str, ...], np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (str(k),)))
    elif isinstance(tree, (tuple, list)):
        # flax sows __call__ outputs as a tuple (one entry per invocation)
        for i, v in enumerate(tree):
            key = prefix if len(tree) == 1 else prefix + (f"call{i}",)
            out.update(_flatten(v, key))
    else:
        out[prefix] = np.asarray(tree)
    return out


def tile_feature_map(feat: np.ndarray) -> np.ndarray:
    """One sample's [T, H, W, C] feature map -> the reference's
    channel-normalized [C*H, T*W] grayscale tile (base_blocks.py:41-48:
    min/max over the channel axis, rows = channels x height, cols =
    time x width)."""
    t, h, w, c = feat.shape
    feat = feat.astype(np.float32)
    xmin = feat.min(axis=-1, keepdims=True)
    xmax = feat.max(axis=-1, keepdims=True)
    x = (feat - xmin) / np.maximum(xmax - xmin, 1e-8)
    # [T,H,W,C] -> [C,H,T,W] -> [C*H, T*W]  (reference permute(0,1,3,2,4))
    return x.transpose(3, 1, 0, 2).reshape(c * h, t * w)


def save_feature_maps(intermediates: Any, cfg, start_id: int = 0, valid=None) -> int:
    """Write per-sample tiled feature images for every captured block.

    intermediates: the ``intermediates`` collection from
    ``model.apply(..., capture_intermediates=feature_map_filter(),
    mutable=["intermediates"])``; leaves are [B, T, H, W, C].
    valid: optional [B] bool mask — padded loader rows (clip_ids < 0) are
    skipped so image ids track REAL samples, like the reference's
    ``self.id`` counter (base_blocks.py:34,63) which only ever sees real
    batch rows.  Returns the number of samples written (caller advances
    start_id).
    """
    base = str(cfg.VISUALIZATION.FEATURE_MAPS.get("BASE_OUTPUT_DIR", "") or cfg.get("OUTPUT_DIR", "."))
    name = str(cfg.VISUALIZATION.get("NAME", "") or "default")
    written = 0
    for path, feat in _flatten(intermediates).items():
        if feat.ndim == 4:  # unbatched [T,H,W,C]
            feat = feat[None]
        if feat.ndim != 5:
            continue  # not a spatiotemporal feature map
        rows = range(feat.shape[0]) if valid is None else [i for i in range(feat.shape[0]) if i < len(valid) and valid[i]]
        written = len(rows)
        layer = "_".join(p for p in path if p != "__call__") or "layer"
        for out_i, i in enumerate(rows):
            sample_dir = os.path.join(base, name, f"im_{start_id + out_i}")
            os.makedirs(sample_dir, exist_ok=True)
            tile = (tile_feature_map(feat[i]) * 255.0).round().astype(np.uint8)
            _write_gray(os.path.join(sample_dir, f"{layer}_feature.jpg"), tile)
    return written


def _write_gray(path: str, img: np.ndarray) -> None:
    try:
        import cv2

        cv2.imwrite(path, img)
    except Exception:  # headless/no-jpeg builds: keep the artifact as .npy
        np.save(path + ".npy", img)
