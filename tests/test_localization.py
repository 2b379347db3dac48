"""TAL subsystem: BMN head, losses, proposal parsing, soft-NMS, mAP,
end-to-end train + eval on synthetic features."""

import numpy as np
import pytest

from clip_fsar_tpu.config import Config


@pytest.fixture()
def tal_cfg(tmp_path):
    return Config({
        "TASK_TYPE": "localization",
        "PRETRAIN": {"ENABLE": False},
        "LOCALIZATION": {
            "ENABLE": True, "LOSS": "Tem+PemReg+PemCls", "LOSS_WEIGHTS": [1, 10, 1],
            "POS_REG_THRES": 0.7, "NEG_REG_THRES": 0.3, "POS_CLS_THRES": 0.9,
            "SOFT_NMS_ALPHA": 0.4, "SOFT_NMS_LOW_THRES": 0.5, "SOFT_NMS_HIGH_THRES": 0.9, "PROP_NUM": 50,
        },
        "TRAIN": {"BATCH_SIZE": 4, "BATCH_SIZE_PER_TASK": 1, "AUTO_RESUME": False},
        "TEST": {"BATCH_SIZE": 4, "TEST_SET": "val"},
        "DATA": {"TEMPORAL_SCALE": 32, "DURATION_SCALE": 0, "NUM_INPUT_CHANNELS": 16, "DECODER": "synthetic"},
        "VIDEO": {
            "DIM1D": 32, "DIM2D": 16, "DIM3D": 16, "BACKBONE_LAYER": 2, "BACKBONE_GROUPS_NUM": 4,
            "HEAD": {"NAME": "BaseBMN", "NUM_SAMPLE": 8, "NUM_SAMPLE_PERBIN": 3, "BOUNDARY_RATIO": 0.5,
                     "USE_BMN_REGRESSION": False, "NUM_CLASSES": [3, 4]},
        },
        "SOLVER": {"BASE_LR": 1e-3, "LR_POLICY": "cosine", "MAX_EPOCH": 2, "WARMUP_EPOCHS": 0,
                   "WARMUP_START_LR": 1e-6, "OPTIM_METHOD": "adam", "WEIGHT_DECAY": 0.0, "MOMENTUM": 0.9, "NESTEROV": False},
        "BN": {"WEIGHT_DECAY": 0.0},
        "AUGMENTATION": {"LABEL_SMOOTHING": 0.0},
        "RANDOM_SEED": 0,
        "OUTPUT_DIR": str(tmp_path),
        "LOG_PERIOD": 1,
        "SUBMISSION": {"SAVE_RESULTS_PATH": "sub.json"},
    })


def test_bmn_head_shapes(tal_cfg):
    import jax
    import jax.numpy as jnp

    from clip_fsar_tpu.models.heads.bmn import BaseBMN

    head = BaseBMN(cfg=tal_cfg)
    x = jnp.zeros((2, 32, 32))  # [B, T, DIM1D]
    vs = head.init(jax.random.PRNGKey(0), x, train=False)
    out, _ = head.apply(vs, x, train=False)
    assert out["confidence_map"].shape == (2, 2, 32, 32)
    assert out["start"].shape == (2, 32) and out["end"].shape == (2, 32)
    assert out["verb_map"].shape == (2, 3, 32, 32)
    assert out["noun_map"].shape == (2, 4, 32, 32)
    conf = np.asarray(out["confidence_map"])
    assert (conf >= 0).all() and (conf <= 1).all()


def test_boundary_matching_mask_rows_sum():
    from clip_fsar_tpu.models.heads.bmn import boundary_matching_mask

    m = boundary_matching_mask(16, 16, 4, 2, 0.5)
    assert m.shape == (16, 4, 16, 16)
    # valid cells: interpolation weights per sample sum to ~1
    col = m[:, :, 3, 2]  # duration 3, start 2
    np.testing.assert_allclose(col.sum(0), np.ones(4), atol=1e-6)


def test_tal_losses(tal_cfg):
    import jax
    import jax.numpy as jnp

    from clip_fsar_tpu.train.losses import calculate_loss

    rng = np.random.RandomState(0)
    t, d = 32, 32
    preds = {
        "start": jnp.asarray(rng.rand(2, t).astype(np.float32)),
        "end": jnp.asarray(rng.rand(2, t).astype(np.float32)),
        "confidence_map": jnp.asarray(rng.rand(2, 2, d, t).astype(np.float32)),
    }
    labels = {"supervised": {
        "start_map": jnp.asarray((rng.rand(2, t) > 0.8).astype(np.float32)),
        "end_map": jnp.asarray((rng.rand(2, t) > 0.8).astype(np.float32)),
        "iou_map": jnp.asarray(rng.rand(2, d, t).astype(np.float32)),
        "mask": jnp.ones((2, d, t), jnp.float32),
    }}
    loss, parts = calculate_loss(tal_cfg, preds, None, labels, rng=jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert set(parts) == {"tem", "pem_reg", "pem_cls"}


def test_soft_nms_and_map():
    from clip_fsar_tpu.utils.tal import detection_map, soft_nms

    props = [
        {"xmin": 0.0, "xmax": 10.0, "score": 0.9},
        {"xmin": 0.5, "xmax": 10.5, "score": 0.8},  # near-duplicate, decayed
        {"xmin": 20.0, "xmax": 30.0, "score": 0.7},
        {"xmin": 50.0, "xmax": 60.0, "score": 0.1},
    ]
    kept = soft_nms(props, alpha=0.4, t1=0.0, t2=0.0, prop_num=3)
    assert kept[0]["score"] == 0.9
    dup = [k for k in kept if k["xmin"] == 0.5]
    assert not dup or dup[0]["score"] < 0.8  # decayed

    gt = {"v1": [(0, 10, 0), (20, 30, 0)]}
    perfect = {"v1": [(0, 10, 0.9, 0), (20, 30, 0.8, 0)]}
    stats = detection_map(gt, perfect, tiou_thresholds=(0.5,))
    assert stats["mAP@0.5"] == pytest.approx(1.0)
    miss = {"v1": [(50, 60, 0.9, 0)]}
    assert detection_map(gt, miss, tiou_thresholds=(0.5,))["mAP@0.5"] == 0.0


def test_tal_train_and_eval_e2e(tal_cfg):
    from clip_fsar_tpu.train.localization import test_epic_localization, train_localization

    stats = train_localization(tal_cfg)
    assert np.isfinite(stats["final_loss"])
    result = test_epic_localization(tal_cfg)
    # three evaluation streams (reference eval_epic_detection.py:231-242)
    for stream in ("action", "verb", "noun"):
        key = f"{stream}/mAP_avg"
        assert key in result and 0.0 <= result[key] <= 1.0


def test_submission(tal_cfg):
    import json
    import os

    from clip_fsar_tpu.train.localization import submission_test

    path = submission_test(tal_cfg)
    assert os.path.exists(path)
    with open(path) as f:
        sub = json.load(f)
    assert "results" in sub and len(sub["results"]) > 0
