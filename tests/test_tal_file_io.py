"""TAL feature dataset against REAL files on disk (.npy features +
<split>_annotations.json), not the synthetic fallback — the file-IO path
of the reference epickitchen100_feature.py equivalent.
"""

import json
import os

import numpy as np

from clip_fsar_tpu.config import Config
from clip_fsar_tpu.data.tal_features import TalFeatureDataset


def _cfg(tmp_path, tscale=16, feat_dim=8):
    return Config({
        "DATA": {
            "TEMPORAL_SCALE": tscale, "DURATION_SCALE": 0, "NUM_INPUT_CHANNELS": feat_dim,
            "DECODER": "auto", "ANNO_DIR": str(tmp_path), "DATA_ROOT_DIR": str(tmp_path),
        },
        "LOCALIZATION": {"ENABLE": True, "POS_REG_THRES": 0.7, "NEG_REG_THRES": 0.3, "POS_CLS_THRES": 0.9},
        "TEST": {"TEST_SET": "val"},
    })


def test_real_npy_features_and_annotations(tmp_path):
    feat_dim, tscale = 8, 16
    annos = {}
    for i, frames in enumerate((24, 16, 40)):
        name = f"vid{i}"
        feats = np.arange(frames * feat_dim, dtype=np.float32).reshape(frames, feat_dim)
        np.save(tmp_path / f"{name}.npy", feats)
        annos[name] = {
            "duration": float(frames),
            "annotations": [{"segment": [2.0, min(10.0, frames - 1.0)], "verb": 1, "noun": 2}],
        }
    (tmp_path / "val_annotations.json").write_text(json.dumps(annos))

    ds = TalFeatureDataset(_cfg(tmp_path, tscale, feat_dim), "val")
    assert not ds.synthetic
    # windows, stride tscale//2=8, stop once start+tscale >= frames:
    # vid0 (24f): 0,8; vid1 (16f): 0; vid2 (40f): 0,8,16,24
    videos = [v for v, _ in ds.windows]
    assert videos.count("vid0") == 2 and videos.count("vid1") == 1 and videos.count("vid2") == 4

    item = ds.get_item(0)
    window = item[0] if isinstance(item, tuple) else item["features"]
    assert window.shape == (tscale, feat_dim)
    # first window of vid0 must be the literal first tscale rows of the file
    np.testing.assert_array_equal(window, np.arange(tscale * feat_dim, dtype=np.float32).reshape(tscale, feat_dim))


def test_short_video_window_zero_padded(tmp_path):
    feat_dim, tscale = 8, 16
    np.save(tmp_path / "shorty.npy", np.ones((5, feat_dim), np.float32))
    annos = {"shorty": {"duration": 5.0, "annotations": [{"segment": [1.0, 3.0], "verb": 0, "noun": 0}]}}
    (tmp_path / "val_annotations.json").write_text(json.dumps(annos))
    ds = TalFeatureDataset(_cfg(tmp_path, tscale, feat_dim), "val")
    item = ds.get_item(0)
    window = item[0] if isinstance(item, tuple) else item["features"]
    assert window.shape == (tscale, feat_dim)
    assert (window[:5] == 1).all() and (window[5:] == 0).all()
