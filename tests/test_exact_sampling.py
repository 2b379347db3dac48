"""DATA.EXACT_SAMPLING: the protocol-exactness guard for accuracy runs.

A run whose accuracy will be compared against the reference protocol must
read the EXACT frame indices the sampler draws (reference
datasets/base/base_dataset.py:493-530 samples over the full-rate video).
Two shipped throughput features quantize indices to a fixed grid —
``DATA.DECODER cached_opencv`` (decode.py) and ``TPU.EVAL_FRAME_BANK``
(frame_bank.py) — so EXACT_SAMPLING=true must refuse both, and the exact
path (plain OpenCV decode) must deliver precisely the sampled indices.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from clip_fsar_tpu.config.config import load_config
from clip_fsar_tpu.data.decode import OpenCVDecoder, build_decoder
from clip_fsar_tpu.data.sampling import sample_indices_for_cfg


def _write_video(path, n_frames=80, fps=12.0, size=(64, 48)):
    """Frame index encoded as 8 binary bars (bit j of the index -> bar j
    full white/black) — 0/255 amplitude survives lossy codecs exactly,
    unlike graded channel values."""
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, size)
    assert w.isOpened()
    bar = size[0] // 8
    for i in range(n_frames):
        frame = np.zeros((size[1], size[0], 3), np.uint8)
        for j in range(8):
            if (i >> j) & 1:
                frame[:, j * bar : (j + 1) * bar, :] = 255
        w.write(frame)
    w.release()


def _decode_index(frame):
    bar = frame.shape[1] // 8
    return sum((int(frame[:, j * bar : (j + 1) * bar].mean()) > 127) << j for j in range(8))


def _protocol_cfg(**data_overrides):
    cfg = load_config("configs/projects/CLIPFSAR/hmdb51/CLIPFSAR_HMDB51_1shot_v1.yaml")
    for k, v in data_overrides.items():
        setattr(cfg.DATA, k, v)
    return cfg


def test_exact_sampling_refuses_cached_decoder():
    cfg = _protocol_cfg(EXACT_SAMPLING=True, DECODER="cached_opencv")
    with pytest.raises(ValueError, match="EXACT_SAMPLING"):
        build_decoder("cached_opencv", cfg_data=cfg.DATA)


def test_exact_sampling_refuses_frame_bank():
    from clip_fsar_tpu.data.frame_bank import build_eval_frame_bank

    cfg = _protocol_cfg(EXACT_SAMPLING=True)
    cfg.TPU.EVAL_FRAME_BANK = True
    with pytest.raises(ValueError, match="EXACT_SAMPLING"):
        build_eval_frame_bank(cfg, "test")


def test_exact_sampling_allows_plain_decoders():
    cfg = _protocol_cfg(EXACT_SAMPLING=True)
    assert isinstance(build_decoder("opencv", cfg_data=cfg.DATA), OpenCVDecoder)
    build_decoder("synthetic", cfg_data=cfg.DATA)  # must not raise


def test_exact_path_reads_the_sampled_indices(tmp_path):
    """End-to-end exactness: with the protocol config (SAMPLING_RATE 50 >
    40 -> uniform-segment sampler) the plain decode path returns frames at
    EXACTLY the sampled indices, while cached_opencv on a coarse grid
    demonstrably does not — the behavior EXACT_SAMPLING exists to refuse."""
    from clip_fsar_tpu.data.decode import CachedVideoDecoder

    p = tmp_path / "clip.mp4"
    n = 80
    _write_video(p, n_frames=n)
    cfg = _protocol_cfg(EXACT_SAMPLING=True)

    rng = np.random.default_rng(7)
    d = OpenCVDecoder()
    assert d.length(str(p)) == n
    for _ in range(4):
        idx = sample_indices_for_cfg(cfg, "test", n, 12.0, rng)
        assert len(idx) == int(cfg.DATA.NUM_INPUT_FRAMES)
        frames = d.read(str(p), idx)
        got = [_decode_index(f) for f in frames]
        assert got == [int(i) for i in idx], (got, idx)

    # contrast: an 8-frame cache grid snaps the same draws
    snap = CachedVideoDecoder(cache_dir=str(tmp_path / "cache"), max_frames=8)
    rng = np.random.default_rng(7)
    idx = sample_indices_for_cfg(cfg, "test", n, 12.0, rng)
    got = [_decode_index(f) for f in snap.read(str(p), idx)]
    grid = np.unique(np.linspace(0, n - 1, 8).round().astype(int))
    assert all(g in grid for g in got)
    assert got != [int(i) for i in idx]
