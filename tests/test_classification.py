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
