"""Real video-file decode path (OpenCVDecoder), exercised against actual
mp4 files written on the fly — the TPU-native replacement for the
reference's decord path (base_dataset.py:210-280) must read the frames
the samplers ask for, not just the synthetic/test decoders.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from clip_fsar_tpu.data.decode import OpenCVDecoder, build_decoder
from clip_fsar_tpu.data.sampling import uniform_segment_indices


def _write_video(path, n_frames=24, fps=12.0, size=(64, 48)):
    """Each frame's red channel encodes its index * 10 (lossy-codec safe)."""
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, size)
    assert w.isOpened()
    for i in range(n_frames):
        frame = np.zeros((size[1], size[0], 3), np.uint8)
        frame[..., 2] = i * 10  # BGR: red plane
        w.write(frame)
    w.release()


def test_length_fps_and_indexed_read(tmp_path):
    p = tmp_path / "clip.mp4"
    _write_video(p, n_frames=24, fps=12.0)
    d = OpenCVDecoder()
    assert d.length(str(p)) == 24
    assert d.fps(str(p)) == pytest.approx(12.0)

    idx = [0, 3, 3, 7, 23]
    frames = d.read(str(p), idx)
    assert frames.shape == (5, 48, 64, 3) and frames.dtype == np.uint8
    # RGB output: red channel is [..., 0]; mp4 is lossy, so compare coarsely
    for row, want in zip(frames, idx):
        assert abs(int(row[..., 0].mean()) - want * 10) <= 6, (row[..., 0].mean(), want)


def test_out_of_range_indices_clamp_to_last(tmp_path):
    p = tmp_path / "short.mp4"
    _write_video(p, n_frames=8)
    frames = OpenCVDecoder().read(str(p), [5, 200])
    assert abs(int(frames[0, ..., 0].mean()) - 50) <= 6
    # a past-the-end index repeats the last frame that was decoded for
    # this request (reference neighbor-fallback behavior,
    # base_dataset.py:352-367 substitutes a nearby decoded frame)
    assert abs(int(frames[1, ..., 0].mean()) - 50) <= 6


def test_auto_picks_opencv_for_existing_root(tmp_path):
    d = build_decoder("auto", data_root=str(tmp_path))
    assert isinstance(d, OpenCVDecoder)


def test_sampler_plus_decoder_end_to_end(tmp_path):
    """Uniform-segment sampling (the SAMPLING_RATE>40 CLIP-FSAR path)
    against a real file: decoded frame ids must be ordered and in range."""
    p = tmp_path / "seg.mp4"
    _write_video(p, n_frames=25)
    d = OpenCVDecoder()
    n = d.length(str(p))
    rng = np.random.default_rng(0)
    idx = uniform_segment_indices(n, num_frames=8, rng=rng)
    assert len(idx) == 8 and all(0 <= i < n for i in idx)
    frames = d.read(str(p), idx)
    ids = [int(round(f[..., 0].mean() / 10.0)) for f in frames]
    assert ids == sorted(ids)
    assert all(abs(a - b) <= 1 for a, b in zip(ids, idx))


def test_cached_decoder_matches_opencv(tmp_path):
    """CachedVideoDecoder: same frames as OpenCVDecoder when every frame is
    cached; nearest-frame snapping when subsampled; cache survives reuse."""
    from clip_fsar_tpu.data.decode import CachedVideoDecoder

    p = tmp_path / "clip.mp4"
    _write_video(p, n_frames=24, fps=12.0)

    full = CachedVideoDecoder(cache_dir=str(tmp_path / "cache_full"), max_frames=24)
    assert full.length(str(p)) == 24
    assert full.fps(str(p)) == pytest.approx(12.0)
    want = OpenCVDecoder().read(str(p), [0, 5, 11, 23])
    got = full.read(str(p), [0, 5, 11, 23])
    # JPEG quantization: red-plane step of 10 survives within a few counts
    assert got.shape == want.shape
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 6

    sub = CachedVideoDecoder(cache_dir=str(tmp_path / "cache_sub"), max_frames=8)
    frames = sub.read(str(p), [0, 23])
    assert frames.shape[0] == 2
    # first/last original frames are always in the uniform cache grid
    assert abs(int(frames[0][..., 0].mean()) - 0) <= 6
    assert abs(int(frames[1][..., 0].mean()) - 230) <= 8
    # second read hits the cache (no mp4 needed anymore)
    p.unlink()
    again = sub.read(str(p), [0, 23])
    np.testing.assert_array_equal(frames, again)


def test_cached_decoder_invalidation_on_params_and_content(tmp_path):
    """The disk cache must MISS when the cache parameters change or the
    source file is re-encoded — regression for the round-2 md5(path)-only
    key that silently served stale frame grids."""
    import time

    from clip_fsar_tpu.data.decode import CachedVideoDecoder

    p = tmp_path / "clip.mp4"
    _write_video(p, n_frames=24, fps=12.0)
    cache = tmp_path / "cache"

    d8 = CachedVideoDecoder(cache_dir=str(cache), max_frames=8)
    d8.read(str(p), [0, 23])
    assert len(list(cache.glob("*.npz"))) == 1

    # same path, coarser->finer grid: a second cache entry, and the finer
    # decoder really has 24 distinct frames (not 8 snapped ones)
    d24 = CachedVideoDecoder(cache_dir=str(cache), max_frames=24)
    frames = d24.read(str(p), list(range(24)))
    assert len(list(cache.glob("*.npz"))) == 2
    ids = [int(round(f[..., 0].mean() / 10.0)) for f in frames]
    assert len(set(ids)) == 24

    # re-encoded source at the same path: new entry again
    time.sleep(1.1)  # mtime granularity
    _write_video(p, n_frames=12, fps=12.0)
    fresh = CachedVideoDecoder(cache_dir=str(cache), max_frames=8)
    assert fresh.length(str(p)) == 12
    assert len(list(cache.glob("*.npz"))) == 3
