"""Augmentation suite: color ops pinned against the reference torch
implementations (datasets/utils/transformations.py), RandomErasing
behavior, positional crop geometry."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from reference_oracle import import_reference_few_shot  # installs stubs

import_reference_few_shot()
import importlib.util

_spec = importlib.util.spec_from_file_location(
    "ref_transformations", "/root/reference/datasets/utils/transformations.py"
)
ref_tf = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ref_tf)

from clip_fsar_tpu.data import augment  # noqa: E402


def _clip(seed=0, t=3, h=8, w=8):
    rng = np.random.RandomState(seed)
    return rng.rand(t, h, w, 3).astype(np.float32)


def _to_ref(clip):
    # ours [T, H, W, C] -> reference [C, T, H, W]
    return torch.from_numpy(clip.transpose(3, 0, 1, 2).copy())


def _from_ref(tensor):
    return tensor.numpy().transpose(1, 2, 3, 0)


@pytest.mark.parametrize("factor", [0.3, 1.0, 1.6])
def test_adjust_brightness_matches_reference(factor):
    clip = _clip(0)
    ref = _from_ref(ref_tf.adjust_brightness(_to_ref(clip), factor))
    ours = np.asarray(augment.adjust_brightness(jnp.asarray(clip), factor))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("factor", [0.4, 1.5])
def test_adjust_contrast_matches_reference(factor):
    clip = _clip(1)
    ref = _from_ref(ref_tf.adjust_contrast(_to_ref(clip), factor))
    ours = np.asarray(augment.adjust_contrast(jnp.asarray(clip), factor))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("factor", [0.2, 1.8])
def test_adjust_saturation_matches_reference(factor):
    clip = _clip(2)
    ref = _from_ref(ref_tf.adjust_saturation(_to_ref(clip), factor))
    ours = np.asarray(augment.adjust_saturation(jnp.asarray(clip), factor))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("factor", [-0.3, 0.0, 0.25])
def test_adjust_hue_matches_reference(factor):
    clip = _clip(3)
    ref = _from_ref(ref_tf.adjust_hue(_to_ref(clip), float(factor)))
    ours = np.asarray(augment.adjust_hue(jnp.asarray(clip), factor))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_grayscale_matches_reference():
    clip = _clip(4)
    ref = _from_ref(ref_tf.rgb_to_grayscale(_to_ref(clip)))
    ours = np.asarray(augment._grayscale(jnp.asarray(clip)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_color_jitter_changes_pixels_and_respects_zero():
    clip = jnp.asarray(_clip(5))
    out = augment.color_jitter(jax.random.PRNGKey(0), clip, brightness=0.5, contrast=0.5, saturation=0.5, hue=0.25)
    assert out.shape == clip.shape
    assert not np.allclose(np.asarray(out), np.asarray(clip))
    # all-zero strengths are the identity
    out0 = augment.color_jitter(jax.random.PRNGKey(0), clip)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(clip))


def test_color_jitter_per_frame_vs_consistent():
    clip = jnp.ones((4, 6, 6, 3), jnp.float32) * 0.5
    out = augment.color_jitter(jax.random.PRNGKey(1), clip, brightness=0.8, consistent=False, shuffle=False)
    frame_means = np.asarray(out).mean(axis=(1, 2, 3))
    assert len(np.unique(np.round(frame_means, 6))) > 1  # per-frame factors differ
    out_c = augment.color_jitter(jax.random.PRNGKey(1), clip, brightness=0.8, consistent=True, shuffle=False)
    frame_means_c = np.asarray(out_c).mean(axis=(1, 2, 3))
    assert len(np.unique(np.round(frame_means_c, 6))) == 1


def test_random_erasing_const_mode():
    batch = jnp.ones((2, 3, 16, 16, 3), jnp.float32)
    out = np.asarray(augment.random_erasing(jax.random.PRNGKey(0), batch, probability=1.0, mode="const"))
    assert (out == 0).any()  # some region erased to 0
    assert (out == 1).any()  # not everything erased
    # erasure is constant across frames of a clip (timm semantics)
    erased_mask = out[0, 0] == 0
    for f in range(1, 3):
        np.testing.assert_array_equal(out[0, f] == 0, erased_mask)

    # probability 0 -> identity
    out0 = np.asarray(augment.random_erasing(jax.random.PRNGKey(0), batch, probability=0.0))
    np.testing.assert_array_equal(out0, np.asarray(batch))


def test_random_erasing_num_splits_keeps_clean_head():
    batch = jnp.ones((4, 2, 12, 12, 3), jnp.float32)
    out = np.asarray(
        augment.random_erasing(jax.random.PRNGKey(2), batch, probability=1.0, num_splits=2, area_range=(0.2, 0.33))
    )
    np.testing.assert_array_equal(out[:2], np.asarray(batch)[:2])  # clean split
    assert (out[2:] == 0).any()


def test_auto_resized_crop_positions():
    frames = np.zeros((2, 20, 40, 3), np.uint8)
    frames[:, :, :20] = 255  # left half white
    rng = np.random.default_rng(0)
    left = augment.auto_resized_crop(frames, 8, rng, scale=(0.5, 0.5), mode="ll")
    right = augment.auto_resized_crop(frames, 8, rng, scale=(0.5, 0.5), mode="rr")
    assert left.mean() > 200 and right.mean() < 50
    assert left.shape == (2, 8, 8, 3)


def test_custom_resized_crop_modes():
    frames = (np.random.RandomState(0).rand(2, 24, 32, 3) * 255).astype(np.uint8)
    rng = np.random.default_rng(1)
    one = augment.custom_resized_crop(frames, 8, rng, scale=(0.6, 0.6), mode=1)
    assert one.shape == (1, 2, 8, 8, 3)
    three = augment.custom_resized_crop(frames, 8, rng, scale=(0.6, 0.6), mode=3)
    assert three.shape == (3, 2, 8, 8, 3)
    assert not np.array_equal(three[1], three[2])  # left vs right crops differ


def test_apply_train_augment_pipeline():
    from clip_fsar_tpu.config import Config

    cfg = Config({
        "AUGMENTATION": {
            "COLOR_AUG": True, "BRIGHTNESS": 0.5, "CONTRAST": 0.5, "SATURATION": 0.5, "HUE": 0.25,
            "GRAYSCALE": 0.3, "CONSISTENT": True, "SHUFFLE": True, "GRAY_FIRST": True,
            "RANDOM_ERASING": {"ENABLE": True, "PROB": 1.0, "MODE": "const", "COUNT": [1, 1],
                               "NUM_SPLITS": 0, "AREA_RANGE": [0.1, 0.33], "MIN_ASPECT": 0.3},
        }
    })
    batch = jnp.asarray((np.random.RandomState(0).rand(2, 3, 16, 16, 3) * 255).astype(np.uint8))
    mean = std = (0.5, 0.5, 0.5)
    out = augment.apply_train_augment(jax.random.PRNGKey(0), batch, cfg, mean, std)
    assert out.shape == batch.shape and out.dtype == jnp.float32
    plain = (batch.astype(jnp.float32) / 255.0 - jnp.asarray(mean)) / jnp.asarray(std)
    assert not np.allclose(np.asarray(out), np.asarray(plain))  # pixels actually changed
    # jit-compatible (device-side path)
    jout = jax.jit(lambda r, b: augment.apply_train_augment(r, b, cfg, mean, std))(jax.random.PRNGKey(0), batch)
    # jit fusion may reassociate the blend arithmetic — allow float slack
    np.testing.assert_allclose(np.asarray(jout), np.asarray(out), rtol=1e-4, atol=1e-5)
