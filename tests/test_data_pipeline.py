"""Split parsing, frame sampling, transforms, episode assembly, loader."""

import os

import numpy as np
import pytest

from clip_fsar_tpu.config import load_config
from clip_fsar_tpu.data.decode import SyntheticDecoder, build_decoder
from clip_fsar_tpu.data.loader import build_few_shot_loader
from clip_fsar_tpu.data.sampling import interval_indices, uniform_segment_indices
from clip_fsar_tpu.data.splits import FewShotSplit
from clip_fsar_tpu.data.transforms import controlled_crop, resize_short_side

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HMDB1 = os.path.join(REPO, "configs/projects/CLIPFSAR/hmdb51/CLIPFSAR_HMDB51_1shot_v1.yaml")


def small_cfg(**overrides):
    opts = [
        "DATA.DECODER", "synthetic",
        "DATA.NUM_INPUT_FRAMES", "4",
        "DATA.TRAIN_CROP_SIZE", "64",
        "DATA.TEST_CROP_SIZE", "64",
        "DATA.TRAIN_JITTER_SCALES", "[72, 72]",
        "DATA.TEST_SCALE", "72",
        "DATA_LOADER.NUM_WORKERS", "2",
    ]
    for k, v in overrides.items():
        opts += [k, str(v)]
    return load_config(HMDB1, opts)


def test_split_parsing_folder_style():
    lines = ["train0//videos/brush_hair/x.avi", "train0//videos/brush_hair/y.avi", "train3//videos/clap/z.avi"]
    s = FewShotSplit(lines, split="train", ssv2_style=False)
    assert s.unique_classes() == [0, 3]
    assert s.num_videos_for_class(0) == 2
    assert s.get(3, 0) == ("videos/clap/z.avi", 2)


def test_split_parsing_ssv2_style():
    lines = ["train8/78687", "train50/42326", "train8/11111"]
    s = FewShotSplit(lines, split="train", ssv2_style=True)
    assert s.unique_classes() == [8, 50]
    assert s.get(8, 1) == ("11111", 2)


def test_real_split_files_parse():
    s = FewShotSplit(open(os.path.join(REPO, "configs/projects/CLIPFSAR/hmdb51/train_few_shot.txt")).readlines(), "train", False)
    assert len(s) == 4280
    assert len(s.unique_classes()) == 31
    s2 = FewShotSplit(open(os.path.join(REPO, "configs/projects/CLIPFSAR/ssv2_full/train_few_shot.txt")).readlines(), "train", True)
    assert len(s2) == 67013


def test_uniform_segment_sampling_bounds():
    rng = np.random.default_rng(0)
    for _ in range(20):
        idx = uniform_segment_indices(100, 8, rng)
        assert idx.shape == (8,)
        assert (np.diff(idx) > 0).all()
        seg = 100 // 8
        for i, v in enumerate(idx):
            assert seg * i <= v < seg * (i + 1)
    # shorter than num_frames: clamped, monotone non-decreasing
    idx = uniform_segment_indices(3, 8, rng)
    assert idx.max() == 2 and (np.diff(idx) >= 0).all()


def test_interval_sampling_center_and_windows():
    idx = interval_indices(300, 30, clip_idx=0, num_clips=1, num_frames=8, interval=4)
    assert idx.shape == (8,) and idx.min() >= 0 and idx.max() < 300
    i0 = interval_indices(300, 30, 0, 3, 8, 4)
    i2 = interval_indices(300, 30, 2, 3, 8, 4)
    assert i2[0] > i0[0]


def test_synthetic_decoder_deterministic():
    d = SyntheticDecoder()
    a = d.read("videos/brush_hair/x.avi", [0, 5, 9])
    b = d.read("videos/brush_hair/x.avi", [0, 5, 9])
    np.testing.assert_array_equal(a, b)
    c = d.read("videos/clap/z.avi", [0, 5, 9])
    assert not np.array_equal(a, c)
    assert a.dtype == np.uint8 and a.shape == (3, 128, 160, 3)
    # temporal structure: frames differ
    assert not np.array_equal(a[0], a[1])


def test_transforms_shapes():
    frames = (np.random.RandomState(0).rand(4, 100, 150, 3) * 255).astype(np.uint8)
    r = resize_short_side(frames, 72)
    assert r.shape[1] == 72 and r.shape[2] == 108
    c = controlled_crop(r, 64)
    assert c.shape == (4, 64, 64, 3)


def test_episode_sampler_protocol():
    cfg = small_cfg()
    from clip_fsar_tpu.utils.registry import DATASET_REGISTRY
    import clip_fsar_tpu.data.datasets  # noqa: F401

    ds = DATASET_REGISTRY.get("Ssv2_few_shot")(cfg, "train")
    sampler = ds.make_sampler(0)
    ep = sampler.sample_episode()
    way, shot, qpc, t = 5, 1, 5, 4
    assert ep.support_images.shape == (way * shot, t, 64, 64, 3)
    assert ep.target_images.shape == (way * qpc, t, 64, 64, 3)
    assert ep.support_images.dtype == np.uint8
    # labels are a permutation with exactly SHOT/QPC per class
    assert sorted(ep.support_labels.tolist()) == sorted(list(range(way)) * shot)
    assert sorted(ep.target_labels.tolist()) == sorted(list(range(way)) * qpc)
    # real labels consistent with the episode class list
    for lab, real in zip(ep.support_labels, ep.real_support_labels):
        assert ep.batch_class_list[lab] == real
    # real labels are valid global train-class ids (31 HMDB train classes)
    assert set(ep.batch_class_list.tolist()) <= set(range(31))


def test_episode_sampler_test_mode_5shot():
    cfg = small_cfg()
    cfg.TRAIN.SHOT_TEST = 5  # hasattr-gated key: absent from the 1-shot yaml
    from clip_fsar_tpu.utils.registry import DATASET_REGISTRY

    ds = DATASET_REGISTRY.get("Ssv2_few_shot")(cfg, "test")
    ep = ds.make_sampler(0).sample_episode()
    assert ep.support_images.shape[0] == 25  # 5-way x 5-shot
    assert ep.target_images.shape[0] == 5  # QUERY_PER_CLASS_TEST=1
    assert set(ep.batch_class_list.tolist()) <= set(range(10))  # 10 test classes


def test_loader_batches_and_prefetch():
    cfg = small_cfg()
    with build_few_shot_loader(cfg, "train", num_steps=3, episodes_per_step=2) as loader:
        batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b.support_images.shape == (2, 5, 4, 64, 64, 3)
    assert b.target_labels.shape == (2, 25)
    # different episodes in the batch
    assert not np.array_equal(b.support_images[0], b.support_images[1])


def test_decoder_auto_fallback(tmp_path):
    d = build_decoder("auto", data_root=None)
    assert type(d).__name__ == "SyntheticDecoder"
    d2 = build_decoder("auto", data_root=str(tmp_path))
    assert type(d2).__name__ == "OpenCVDecoder"


def test_image_folder_decoder(tmp_path):
    from PIL import Image

    vid = tmp_path / "vid1"
    vid.mkdir()
    for i in range(6):
        Image.fromarray((np.ones((32, 40, 3)) * i * 40).astype(np.uint8)).save(vid / f"{i:05d}.jpg")
    d = build_decoder("image_folder")
    assert d.length(str(vid)) == 6
    frames = d.read(str(vid), [0, 3, 5])
    assert frames.shape == (3, 32, 40, 3)
    assert frames[1].mean() > frames[0].mean()


def test_episode_loader_is_seed_deterministic():
    """Same seed -> identical first-3 batches, regardless of worker count
    (per-step seeded RNG + reorder buffer)."""
    import numpy as np
    from clip_fsar_tpu.data.loader import build_few_shot_loader

    def checksums(num_workers):
        cfg = small_cfg()
        cfg.DATA_LOADER.NUM_WORKERS = num_workers
        sums = []
        with build_few_shot_loader(cfg, "train", num_steps=3, episodes_per_step=2) as loader:
            for batch in loader:
                sums.append(
                    (
                        float(np.asarray(batch.support_images, np.float64).sum()),
                        np.asarray(batch.support_labels).tolist(),
                        np.asarray(batch.real_target_labels).tolist(),
                    )
                )
        return sums

    a = checksums(1)
    b = checksums(4)
    c = checksums(4)
    assert a == b == c
