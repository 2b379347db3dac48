"""Native C++ frame-preprocessing library: build, exactness vs cv2,
fused-crop semantics, and fallback equivalence in the transform path."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from clip_fsar_tpu.native import frameops


def _clip(seed=0, t=4, h=48, w=64):
    return (np.random.RandomState(seed).rand(t, h, w, 3) * 255).astype(np.uint8)


@pytest.mark.skipif(not frameops.available(), reason="native toolchain unavailable")
def test_resize_matches_cv2_within_1lsb():
    """The 8-bit fixed-point bilinear tracks cv2 INTER_LINEAR (11-bit
    fixed point) to at most 1 LSB."""
    clip = _clip(0)
    for nh, nw in [(24, 32), (96, 128)]:
        out = frameops.resize(clip, nh, nw)
        ref = np.stack([cv2.resize(f, (nw, nh), interpolation=cv2.INTER_LINEAR) for f in clip])
        assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


@pytest.mark.skipif(not frameops.available(), reason="native toolchain unavailable")
def test_fused_crop_flip_matches_composition():
    clip = _clip(1)
    fused = frameops.resize_crop_flip(clip, 36, 48, 5, 7, 16, 16, flip=True)
    manual = frameops.resize(clip, 36, 48)[:, 5:21, 7:23][:, :, ::-1]
    np.testing.assert_array_equal(fused, manual)
    assert fused.shape == (4, 16, 16, 3)


@pytest.mark.skipif(not frameops.available(), reason="native toolchain unavailable")
def test_invalid_crop_rejected():
    clip = _clip(2)
    with pytest.raises(ValueError):
        frameops.resize_crop_flip(clip, 36, 48, 30, 0, 16, 16)


def test_transform_native_and_fallback_agree(monkeypatch):
    """train/test transforms must produce identical pixels through the
    native kernel and the cv2 fallback (the kernel is bit-exact with
    cv2's INTER_LINEAR)."""
    if not frameops.available():
        pytest.skip("native toolchain unavailable")
    from clip_fsar_tpu.config import Config
    from clip_fsar_tpu.data import transforms as tfm

    cfg = Config({
        "DATA": {"TRAIN_JITTER_SCALES": [36, 40], "TRAIN_CROP_SIZE": 24, "TEST_SCALE": 36, "TEST_CROP_SIZE": 24},
        "TEST": {"NUM_SPATIAL_CROPS": 3},
    })
    clip = _clip(3)

    native_train = tfm.train_transform(clip, cfg, np.random.default_rng(0))
    native_test = tfm.test_transform(clip, cfg, spatial_idx=2)

    monkeypatch.setattr(frameops, "available", lambda: False)
    fb_train = tfm.train_transform(clip, cfg, np.random.default_rng(0))
    fb_test = tfm.test_transform(clip, cfg, spatial_idx=2)
    np.testing.assert_array_equal(native_train, fb_train)
    np.testing.assert_array_equal(native_test, fb_test)
