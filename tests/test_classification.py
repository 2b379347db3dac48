"""Classification task end-to-end: loader, train epoch, multi-view test."""

import os

import numpy as np
import pytest

from clip_fsar_tpu.config import Config, load_config
from clip_fsar_tpu.config.config import merge_into

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HMDB1 = os.path.join(REPO, "configs/projects/CLIPFSAR/hmdb51/CLIPFSAR_HMDB51_1shot_v1.yaml")


@pytest.fixture()
def cls_cfg(tmp_path):
    import yaml

    with open(os.path.join(REPO, "configs/pool/backbone/r2d3ds.yaml")) as f:
        preset = yaml.safe_load(f)
    base = load_config(HMDB1).to_dict()
    merge_into(base, preset)
    cfg = Config(base)
    cfg.TASK_TYPE = "classification"
    cfg.TRAIN.DATASET = "HMDB51"
    cfg.TEST.DATASET = "HMDB51"
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TEST.BATCH_SIZE = 8
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 2
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    cfg.DATA.NUM_INPUT_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.TRAIN_JITTER_SCALES = [36, 36]
    cfg.DATA.TEST_SCALE = 36
    cfg.DATA.SAMPLING_RATE = 50  # uniform segment path
    cfg.DATA.DECODER = "synthetic"
    cfg.DATA.ANNO_DIR = str(tmp_path)
    cfg.VIDEO.HEAD.NUM_CLASSES = 3
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.SOLVER.WARMUP_EPOCHS = 0
    cfg.TRAIN.EVAL_PERIOD = 1
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.DATA_LOADER.NUM_WORKERS = 2
    # synthetic annotation lists
    rng = np.random.RandomState(0)
    for split, n in (("train", 24), ("test", 8)):
        with open(tmp_path / f"hmdb51_{split}_list.txt", "w") as f:
            for i in range(n):
                f.write(f"videos/class{i % 3}/{split}_{i:03d}.avi {i % 3}\n")
    return cfg


def test_loader_multiview(cls_cfg):
    from clip_fsar_tpu.data.classification import build_classification_loader

    loader = build_classification_loader(cls_cfg, "test")
    assert loader.ds._num_clips == 2
    assert len(loader.ds) == 16  # 8 videos x 2 views
    batches = list(loader)
    ids = np.concatenate([c for _, _, c in batches])
    valid = ids[ids >= 0]
    assert sorted(valid.tolist()) == list(range(16))
    v, l, c = batches[0]
    assert v.shape == (8, 4, 32, 32, 3) and v.dtype == np.uint8


def test_train_and_multiview_test(cls_cfg):
    from clip_fsar_tpu.train.classification import test as cls_test
    from clip_fsar_tpu.train.classification import train as cls_train

    stats = cls_train(cls_cfg)
    assert "best_top1" in stats
    result = cls_test(cls_cfg)
    assert 0.0 <= result["top1_acc"] <= 100.0


def test_mixup_batch():
    import jax
    import jax.numpy as jnp

    from clip_fsar_tpu.data.mixup import mixup_batch, smooth_one_hot

    videos = jnp.stack([jnp.zeros((2, 8, 8, 3)), jnp.ones((2, 8, 8, 3))])
    labels = jnp.asarray([0, 1])
    mixed, targets = mixup_batch(jax.random.PRNGKey(0), videos, labels, 3, mixup_alpha=0.8, smoothing=0.0)
    assert mixed.shape == videos.shape
    np.testing.assert_allclose(np.asarray(targets).sum(-1), 1.0, rtol=1e-5)
    # soft targets mix the two labels
    assert (np.asarray(targets)[:, :2] > 0).all()
    sm = smooth_one_hot(labels, 3, smoothing=0.1)
    np.testing.assert_allclose(np.asarray(sm).sum(-1), 1.0, rtol=1e-5)
    assert float(sm[0, 0]) > float(sm[0, 1]) > 0


@pytest.fixture()
def epic_cfg(cls_cfg, tmp_path):
    """EPIC verb+noun config over synthetic videos (dual-label lists)."""
    cfg = cls_cfg
    cfg.TRAIN.DATASET = "Epickitchen100"
    cfg.TEST.DATASET = "Epickitchen100"
    cfg.VIDEO.HEAD.NAME = "BaseHeadx2"
    cfg.VIDEO.HEAD.NUM_CLASSES = [4, 5]
    rng = np.random.RandomState(1)
    for split, n in (("train", 16), ("test", 6)):
        with open(os.path.join(str(tmp_path), f"epickitchen100_{split}_list.txt"), "w") as f:
            for i in range(n):
                f.write(f"videos/P{i % 2}/{split}_{i:03d}.mp4 {i % 4} {i % 5}\n")
    return cfg


def test_epic_meter_joint_topk():
    """EpicKitchenMeter joint top-k semantics (reference meters.py:178-468):
    a joint hit needs verb AND noun in their own top-k."""
    from clip_fsar_tpu.utils.meters import EpicKitchenMeter

    m = EpicKitchenMeter(num_videos=2, num_clips=2, num_cls=(3, 4))
    # video 0: verb 1, noun 2 — both views predict correctly
    pv = np.eye(3)[[1, 1]]
    pn = np.eye(4)[[2, 2]]
    m.update_stats(pv, pn, [1, 1], [2, 2], [0, 1])
    # video 1: verb right, noun wrong
    pv = np.eye(3)[[0, 0]]
    pn = np.eye(4)[[3, 3]]
    m.update_stats(pv, pn, [0, 0], [1, 1], [2, 3])
    stats = m.finalize_metrics(ks=(1,))
    assert stats["top_1_acc_verb"] == 100.0
    assert stats["top_1_acc_noun"] == 50.0
    assert stats["top_1_acc_joint"] == 50.0
    assert stats["top_1_acc_action"] == 50.0
    preds = m.get_video_preds()
    assert preds["verb_class"].shape == (2, 3)
    assert preds["action_class_ind_pred"].shape == (2, 12)


def test_epic_train_and_test(epic_cfg):
    """Dual-head EPIC classification: train an epoch, multi-view test with
    joint verb x noun metrics, submission JSON."""
    from clip_fsar_tpu.train.classification import submission_test, test as cls_test, train as cls_train

    cls_train(epic_cfg)
    stats = cls_test(epic_cfg)
    for key in ("top_1_acc_verb", "top_1_acc_noun", "top_1_acc_joint", "top_1_acc_action"):
        assert key in stats
    sub_stats = submission_test(epic_cfg)
    assert os.path.exists(os.path.join(epic_cfg.OUTPUT_DIR, "submission.json"))
    import json

    with open(os.path.join(epic_cfg.OUTPUT_DIR, "submission.json")) as f:
        blob = json.load(f)
    assert blob["challenge"] == "action_recognition" and len(blob["results"]) == 6


def test_multi_scale_auto_queue(cls_cfg):
    """AUTOMATIC_MULTI_SCALE_TEST queues a second multi-view test run with
    dataset-dependent views (reference run.py:50-72)."""
    from clip_fsar_tpu.runs.run import _run_list

    cls_cfg.TEST.AUTOMATIC_MULTI_SCALE_TEST = True
    cls_cfg.TEST.ENABLE = True
    cls_cfg.TRAIN.ENABLE = False
    runs = _run_list(cls_cfg)
    names = [n for _, n in runs]
    assert names == ["test", "test"]
    ms = runs[1][0]
    assert ms.TEST.NUM_ENSEMBLE_VIEWS == 10 and ms.TEST.NUM_SPATIAL_CROPS == 1
    # original cfg untouched (deep copies)
    assert cls_cfg.TEST.NUM_ENSEMBLE_VIEWS == 2

    cls_cfg.TEST.DATASET = "Epickitchen100"
    ms2 = _run_list(cls_cfg)[1][0]
    assert ms2.TEST.NUM_SPATIAL_CROPS == 3


def test_multifold_loader(cls_cfg):
    """MultiFold sampler semantics (reference utils/sampler.py:12-94): one
    loader epoch covers the dataset NUM_FOLDS times with independent
    shuffles."""
    from clip_fsar_tpu.data.classification import build_classification_loader

    cls_cfg.TRAIN.NUM_FOLDS = 3
    cls_cfg.TRAIN.BATCH_SIZE = 4
    loader = build_classification_loader(cls_cfg, "train")
    assert len(loader) == 24 * 3 // 4
    seen = []
    for _, labels, clip_ids in loader:
        seen.extend(clip_ids.tolist())
    # every video appears exactly NUM_FOLDS times
    counts = np.bincount(np.asarray(seen), minlength=24)
    assert (counts == 3).all()


def test_multiseg_val_contiguity(cls_cfg):
    """All sliding-window views of one video arrive contiguously at test
    (the property reference MultiSegValDistributedSampler guarantees
    per-rank, utils/val_dist_sampler.py:15-103)."""
    from clip_fsar_tpu.data.classification import build_classification_loader

    loader = build_classification_loader(cls_cfg, "test")
    ids = []
    for _, _, clip_ids in loader:
        ids.extend(int(c) for c in clip_ids if c >= 0)
    vids = [i // loader.ds._num_clips for i in ids]
    # video ids are non-decreasing -> views grouped per video
    assert vids == sorted(vids)


def test_mixup_elem_and_pair_modes():
    """'elem': independent lambda per element; 'pair': element i and B-1-i
    share one lambda (reference _mix_elem/_mix_pair, mixup.py:175-210).
    Lambdas are recovered from the soft targets (smoothing=0)."""
    import jax
    import jax.numpy as jnp

    from clip_fsar_tpu.data.mixup import mixup_batch

    b = 6
    videos = jnp.asarray(np.arange(b, dtype=np.float32)[:, None, None, None, None] * np.ones((b, 1, 4, 4, 1), np.float32))
    labels = jnp.arange(b)

    mixed, targets = mixup_batch(
        jax.random.PRNGKey(3), videos, labels, b, mixup_alpha=0.8, cutmix_alpha=0.0,
        prob=1.0, smoothing=0.0, mode="elem",
    )
    t = np.asarray(targets)
    lam = t[np.arange(b), np.arange(b)]  # own-label weight
    # mixed pixels must equal lam*x_i + (1-lam)*x_{B-1-i}
    want = lam[:, None, None, None, None] * np.asarray(videos) + (1 - lam)[:, None, None, None, None] * np.asarray(videos)[::-1]
    np.testing.assert_allclose(np.asarray(mixed), want, atol=1e-5)
    assert len(np.unique(np.round(lam, 6))) >= 3  # per-element lambdas differ

    _, tp = mixup_batch(
        jax.random.PRNGKey(3), videos, labels, b, mixup_alpha=0.8, cutmix_alpha=0.0,
        prob=1.0, smoothing=0.0, mode="pair",
    )
    tp = np.asarray(tp)
    lam_p = tp[np.arange(b), np.arange(b)]
    np.testing.assert_allclose(lam_p, lam_p[::-1], atol=1e-6)  # partners share lambda


def test_cutmix_minmax_distribution_matches_reference():
    """cutmix_minmax: realized box-area ratios must follow the reference's
    rand_bbox_minmax distribution (mixup.py:64-100) — independent uniform
    cut sizes in [min, max] per axis — checked on summary statistics."""
    import jax
    import jax.numpy as jnp

    from clip_fsar_tpu.data.mixup import mixup_batch

    b, h = 512, 32
    minmax = (0.2, 0.8)
    videos = jnp.zeros((b, 1, h, h, 1))
    labels = jnp.arange(b) % 7
    _, targets = mixup_batch(
        jax.random.PRNGKey(5), videos, labels, 7, mixup_alpha=0.0, cutmix_alpha=1.0,
        prob=1.0, smoothing=0.0, mode="elem", cutmix_minmax=minmax,
    )
    t = np.asarray(targets)
    lam = t[np.arange(b), np.asarray(labels)]
    # label collisions (i and B-1-i same class) make own-weight 1.0; drop them
    keep = np.asarray(labels) != np.asarray(labels)[::-1]
    area = 1.0 - lam[keep]

    # the reference's rand_bbox_minmax distribution (mixup.py:80-87):
    # cut_h, cut_w ~ independent randint(h*min, h*max)
    np.random.seed(11)
    ref_cut = np.random.randint(int(h * minmax[0]), int(h * minmax[1]), size=(4096, 2))
    ref_area = ref_cut[:, 0] * ref_cut[:, 1] / float(h * h)

    lo = (int(h * minmax[0]) ** 2) / (h * h)
    hi = ((int(h * minmax[1])) ** 2) / (h * h)
    assert area.min() >= lo - 1e-6 and area.max() <= hi + 1e-6
    assert abs(area.mean() - ref_area.mean()) < 0.03
    assert abs(area.std() - ref_area.std()) < 0.03


def test_feature_map_visualization(cls_cfg, tmp_path):
    """VISUALIZATION.FEATURE_MAPS dumps per-sample tiled block features
    during multi-view test (reference base_blocks.py:23-63 hook)."""
    from clip_fsar_tpu.train.classification import test as cls_test
    from clip_fsar_tpu.train.classification import train as cls_train
    from clip_fsar_tpu.utils.visualization import tile_feature_map

    viz_dir = tmp_path / "viz"
    cls_cfg.VISUALIZATION.ENABLE = True
    cls_cfg.VISUALIZATION.NAME = "r2d3ds_test"
    cls_cfg.VISUALIZATION.FEATURE_MAPS.ENABLE = True
    cls_cfg.VISUALIZATION.FEATURE_MAPS.BASE_OUTPUT_DIR = str(viz_dir)
    cls_train(cls_cfg)
    result = cls_test(cls_cfg)
    assert 0.0 <= result["top1_acc"] <= 100.0

    sample_dirs = sorted((viz_dir / "r2d3ds_test").glob("im_*"))
    # 8 test videos x 2 ensemble views
    assert len(sample_dirs) == 16
    files = list(sample_dirs[0].iterdir())
    assert files, "no feature images written for sample 0"
    # every captured residual block of every stage produced one tile
    names = {f.name for f in files}
    assert any("res" in n for n in names), names

    # tile math matches the reference layout: [T,H,W,C] -> [C*H, T*W]
    import numpy as np

    feat = np.random.RandomState(0).rand(2, 3, 4, 5).astype(np.float32)
    tile = tile_feature_map(feat)
    assert tile.shape == (5 * 3, 2 * 4)
    assert tile.min() >= 0.0 and tile.max() <= 1.0
    # channel-axis normalization: per (t,h,w) site the max over channels is 1
    np.testing.assert_allclose(
        ((feat - feat.min(-1, keepdims=True)) / (feat.max(-1, keepdims=True) - feat.min(-1, keepdims=True)))
        .transpose(3, 1, 0, 2)
        .reshape(15, 8),
        tile,
        rtol=1e-6,
    )
