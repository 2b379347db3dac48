import os

import pytest

from clip_fsar_tpu.config import Config, load_config
from clip_fsar_tpu.config.config import apply_overrides, merge_into

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HMDB1 = os.path.join(REPO, "configs/projects/CLIPFSAR/hmdb51/CLIPFSAR_HMDB51_1shot_v1.yaml")


def test_attribute_access_and_hasattr():
    cfg = Config({"TRAIN": {"WAY": 5, "NESTED": {"X": 1}}})
    assert cfg.TRAIN.WAY == 5
    assert cfg.TRAIN.NESTED.X == 1
    assert hasattr(cfg.TRAIN, "WAY")
    # absence-of-key is meaningful (reference hasattr gating)
    assert not hasattr(cfg.TRAIN, "MERGE_BEFORE")
    with pytest.raises(AttributeError):
        _ = cfg.TRAIN.MERGE_BEFORE
    assert cfg.TRAIN.get("MERGE_BEFORE", False) is False


def test_scientific_notation_coercion():
    cfg = Config({"SOLVER": {"WEIGHT_DECAY": "5e-5"}})
    assert isinstance(cfg.SOLVER.WEIGHT_DECAY, float)
    assert cfg.SOLVER.WEIGHT_DECAY == 5e-5


def test_merge_child_wins_recursively():
    base = {"A": {"X": 1, "Y": 2}, "B": 3}
    new = {"A": {"Y": 20, "Z": 30}, "C": 4}
    merged = merge_into(base, new)
    assert merged["A"] == {"X": 1, "Y": 20, "Z": 30}
    assert merged["B"] == 3 and merged["C"] == 4


def test_overrides_parse_types_and_require_existing_keys():
    cfg = {"TRAIN": {"WAY": 5, "LR": 0.1}, "FLAG": True}
    apply_overrides(cfg, ["TRAIN.WAY", "10", "FLAG", "false", "TRAIN.LR", "5e-5"])
    assert cfg["TRAIN"]["WAY"] == 10
    assert cfg["FLAG"] is False
    assert cfg["TRAIN"]["LR"] == 5e-5
    with pytest.raises(KeyError):
        apply_overrides(cfg, ["TRAIN.NOPE", "1"])


def test_load_project_config():
    cfg = load_config(HMDB1)
    # project values
    assert cfg.TASK_TYPE == "few_shot_action"
    assert cfg.TRAIN.WAY == 5 and cfg.TRAIN.SHOT == 1
    assert cfg.TRAIN.QUERY_PER_CLASS == 5
    assert cfg.VIDEO.HEAD.NAME == "CNN_OTAM_CLIPFSAR"
    assert cfg.VIDEO.HEAD.BACKBONE_NAME == "RN50"
    assert cfg.DATA.NUM_INPUT_FRAMES == 8
    assert len(cfg.TRAIN.CLASS_NAME) == 31
    assert len(cfg.TEST.CLASS_NAME) == 10
    # pool defaults survive
    assert cfg.TRAIN.AUTO_RESUME is True
    assert cfg.TPU.COMPUTE_DTYPE == "bfloat16"
    # steps_with_relative_lrs hyperparams
    assert cfg.SOLVER.LR_POLICY == "steps_with_relative_lrs"
    assert cfg.SOLVER.STEPS == [0, 4, 6]
    assert cfg.SOLVER.LRS == [1, 0.1, 0.01]


def test_load_with_overrides():
    cfg = load_config(HMDB1, ["TRAIN.WAY", "3", "DATA.NUM_INPUT_FRAMES", "4"])
    assert cfg.TRAIN.WAY == 3
    assert cfg.DATA.NUM_INPUT_FRAMES == 4


def test_deep_copy_and_dump_roundtrip(tmp_path):
    cfg = load_config(HMDB1)
    cp = cfg.deep_copy()
    cp.TRAIN.WAY = 99
    assert cfg.TRAIN.WAY == 5
    path = str(tmp_path / "dump.yaml")
    cfg.dump(path)
    import yaml

    with open(path) as f:
        loaded = yaml.safe_load(f)
    assert loaded["TRAIN"]["WAY"] == 5
