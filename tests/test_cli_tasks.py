"""CLI-level drives of the non-few-shot TASK_TYPEs through runs/run.py.

The few-shot CLI path is driven by tests/test_e2e_real_videos.py; this
covers the reference's other top-level entries (run.py:23-85 dispatch):
classification train -> test -> automatic multi-scale second test, and
MoSI pretrain.  Tiny backbones + synthetic decoder keep it fast while
still crossing config -> loader -> model -> loop -> checkpoint -> meters.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HMDB1 = "configs/projects/CLIPFSAR/hmdb51/CLIPFSAR_HMDB51_1shot_v1.yaml"


def _run_cli(tmp_path, cfg_text, extra=()):
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(cfg_text)
    env = dict(os.environ, JAX_PLATFORMS="cpu", XLA_FLAGS="--xla_force_host_platform_device_count=2")
    cmd = [sys.executable, "runs/run.py", "--cfg", str(cfg_path), *extra]
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    sys.stderr.write(proc.stdout[-1500:] + proc.stderr[-1500:])
    return proc


def _write_space_list(tmp_path, name, n=12, classes=3):
    lines = [f"videos/clip_{i}.mp4 {i % classes}" for i in range(n)]
    (tmp_path / name).write_text("\n".join(lines) + "\n")


@pytest.mark.slow
def test_cli_classification_train_test_multiscale(tmp_path):
    _write_space_list(tmp_path, "hmdb51_train_list.txt")
    _write_space_list(tmp_path, "hmdb51_test_list.txt")
    cfg = f"""
_BASE_MODEL: {os.path.join(REPO, 'configs/pool/backbone/r2d3ds.yaml')}
TASK_TYPE: classification
OUTPUT_DIR: {tmp_path / 'out'}
TRAIN:
  ENABLE: true
  DATASET: HMDB51
  BATCH_SIZE: 4
TEST:
  ENABLE: true
  DATASET: HMDB51
  BATCH_SIZE: 4
  NUM_ENSEMBLE_VIEWS: 2
  NUM_SPATIAL_CROPS: 1
  AUTOMATIC_MULTI_SCALE_TEST: true
DATA:
  DECODER: synthetic
  ANNO_DIR: {tmp_path}
  DATA_ROOT_DIR: {tmp_path}
  NUM_INPUT_FRAMES: 4
  TRAIN_CROP_SIZE: 32
  TEST_CROP_SIZE: 32
  TEST_SCALE: 36
  TRAIN_JITTER_SCALES: [36, 36]
VIDEO:
  HEAD:
    NUM_CLASSES: 3
SOLVER:
  MAX_EPOCH: 1
"""
    proc = _run_cli(tmp_path, cfg)
    assert proc.returncode == 0
    # train ran, the standard test ran, and the auto-queued multi-scale
    # second test ran with 3 spatial crops (reference run.py:42-85)
    blob = proc.stdout + proc.stderr
    assert "=== run: train ===" in blob
    assert blob.count("=== run: test ===") == 2
    assert os.path.isdir(tmp_path / "out")


@pytest.mark.slow
def test_cli_localization_train_and_tal_eval(tmp_path):
    """TASK_TYPE=localization through runs/run.py: BMN training then the
    sliding-window TAL evaluation (reference runs/test_epic_localization.py),
    on the synthetic feature dataset."""
    cfg = f"""
TASK_TYPE: localization
OUTPUT_DIR: {tmp_path / 'out'}
PRETRAIN:
  ENABLE: false
LOCALIZATION:
  ENABLE: true
  LOSS: Tem+PemReg+PemCls
  LOSS_WEIGHTS: [1, 10, 1]
  POS_REG_THRES: 0.7
  NEG_REG_THRES: 0.3
  POS_CLS_THRES: 0.9
  SOFT_NMS_ALPHA: 0.4
  SOFT_NMS_LOW_THRES: 0.5
  SOFT_NMS_HIGH_THRES: 0.9
  PROP_NUM: 50
TRAIN:
  ENABLE: true
  BATCH_SIZE: 4
  BATCH_SIZE_PER_TASK: 1
  AUTO_RESUME: false
TEST:
  BATCH_SIZE: 4
  TEST_SET: val
DATA:
  TEMPORAL_SCALE: 32
  DURATION_SCALE: 0
  NUM_INPUT_CHANNELS: 16
  DECODER: synthetic
VIDEO:
  DIM1D: 32
  DIM2D: 16
  DIM3D: 16
  BACKBONE_LAYER: 2
  BACKBONE_GROUPS_NUM: 4
  HEAD:
    NAME: BaseBMN
    NUM_SAMPLE: 8
    NUM_SAMPLE_PERBIN: 3
    BOUNDARY_RATIO: 0.5
    USE_BMN_REGRESSION: false
    NUM_CLASSES: [3, 4]
SOLVER:
  BASE_LR: 1e-3
  LR_POLICY: cosine
  MAX_EPOCH: 1
  WARMUP_EPOCHS: 0
  WARMUP_START_LR: 1e-6
  OPTIM_METHOD: adam
  WEIGHT_DECAY: 0.0
  MOMENTUM: 0.9
  NESTEROV: false
BN:
  WEIGHT_DECAY: 0.0
AUGMENTATION:
  LABEL_SMOOTHING: 0.0
LOG_PERIOD: 1
SUBMISSION:
  SAVE_RESULTS_PATH: sub.json
"""
    proc = _run_cli(tmp_path, cfg)
    blob = proc.stdout + proc.stderr
    assert proc.returncode == 0, blob[-800:]
    assert "=== run: train_localization ===" in blob
    assert "=== run: test_epic_localization ===" in blob


@pytest.mark.slow
def test_cli_mosi_pretrain(tmp_path):
    _write_space_list(tmp_path, "hmdb51_train_list.txt")
    _write_space_list(tmp_path, "hmdb51_test_list.txt")
    cfg = f"""
_BASE_MODEL: {os.path.join(REPO, 'configs/pool/backbone/r2d3ds.yaml')}
TASK_TYPE: pretrain
OUTPUT_DIR: {tmp_path / 'out'}
MODEL:
  NAME: MoSINet
PRETRAIN:
  ENABLE: true
  GENERATOR: MoSIGenerator
  LABEL_MODE: joint
  DATA_MODE: xy
  NUM_FRAMES: 4
  DISTANCE_JITTER: [1.0, 1.0]
  DECOUPLE: true
  ZERO_OUT: false
  STATIC_MASK: false
  LOSS: MoSIJoint
  LOSS_WEIGHTS: [1.0]
TRAIN:
  ENABLE: true
  DATASET: HMDB51
  BATCH_SIZE: 2
  EVAL_PERIOD: 1
TEST:
  ENABLE: false
  DATASET: HMDB51
  BATCH_SIZE: 2
DATA:
  DECODER: synthetic
  ANNO_DIR: {tmp_path}
  DATA_ROOT_DIR: {tmp_path}
  NUM_INPUT_FRAMES: 4
  TRAIN_CROP_SIZE: 32
  TEST_CROP_SIZE: 32
  TEST_SCALE: 36
  TRAIN_JITTER_SCALES: [36, 36]
VIDEO:
  HEAD:
    NAME: MoSIHeadJoint
    NUM_CLASSES: 3
SOLVER:
  MAX_EPOCH: 1
"""
    proc = _run_cli(tmp_path, cfg)
    blob = proc.stdout + proc.stderr
    assert proc.returncode == 0, blob[-800:]
    assert "=== run: train ===" in blob
    # SSL validation ran (reference train.py eval_epoch with SSL losses)
    assert "val_epoch_ssl" in blob
