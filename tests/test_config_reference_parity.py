"""Config-system parity: loading the REFERENCE's own project YAMLs (its
base.yaml, its inheritance chains) through our loader must produce the
same config tree the reference loader produces.

This pins the public API surface — `runs/run.py --cfg <yaml>` semantics —
on real data, not synthetic fixtures.
"""

import glob
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_oracle import import_reference_few_shot

import_reference_few_shot()  # installs stubs + puts /root/reference on sys.path

from clip_fsar_tpu.config import load_config

REF = "/root/reference"

PROJECT_YAMLS = sorted(
    glob.glob(os.path.join(REF, "configs/projects/*/*/*.yaml"))
    + glob.glob(os.path.join(REF, "configs/projects/*/*.yaml"))
)
PROJECT_YAMLS = [p for p in PROJECT_YAMLS if "base" not in os.path.basename(p).lower() or True]


def _ref_load(monkeypatch, cfg_path):
    import utils.checkpoint as ref_ckp
    import utils.config as ref_config

    monkeypatch.chdir(REF)  # _initialize_cfg reads ./configs/pool/base.yaml
    monkeypatch.setattr(ref_ckp, "make_checkpoint_dir", lambda *_: None)
    monkeypatch.setattr("sys.argv", ["prog", "--cfg", cfg_path])
    cfg = ref_config.Config(load=True)
    return cfg


def _norm(v):
    """Normalize scalar spellings the two YAML passes may differ on."""
    if isinstance(v, str):
        try:
            f = float(v)
            return f
        except ValueError:
            return v
    if isinstance(v, tuple):
        return list(v)
    return v


def _flatten(d, prefix=""):
    out = {}
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "."))
        else:
            out[key] = _norm(v)
    return out


@pytest.mark.parametrize(
    "rel",
    [
        "configs/projects/CLIPFSAR/hmdb51/CLIPFSAR_HMDB51_1shot_v1.yaml",
        "configs/projects/CLIPFSAR/hmdb51/CLIPFSAR_HMDB51_5shot_v1.yaml",
        "configs/projects/CLIPFSAR/ssv2_full/CLIPFSAR_SSv2_Full_1shot_v1.yaml",
        "configs/projects/CLIPFSAR/kinetics100/CLIPFSAR_K100_1shot_v1.yaml",
        "configs/projects/CLIPFSAR/ucf101/CLIPFSAR_UCF101_1shot_v1.yaml",
    ],
)
def test_project_yaml_tree_matches_reference(monkeypatch, rel):
    path = os.path.join(REF, rel)
    if not os.path.exists(path):
        pytest.skip(f"{rel} not in the reference snapshot")
    ref_cfg = _ref_load(monkeypatch, path)
    ref_flat = _flatten(ref_cfg.cfg_dict)

    ours = load_config(path).to_dict()
    our_flat = _flatten(ours)

    # the reference merges the argparse Namespace into cfg_dict ('args',
    # 'cfg_file', 'init_method', 'opts'); ours records none of that
    skip_prefixes = ("args", "cfg_file", "init_method", "opts")
    ref_keys = {k for k in ref_flat if not k.startswith(skip_prefixes)}
    our_keys = {k for k in our_flat if not k.startswith(("TPU",))}  # TPU.* is our native extension

    missing = ref_keys - set(our_flat)
    assert not missing, f"keys the reference resolves but we drop: {sorted(missing)[:10]}"

    diffs = {
        k: (our_flat[k], ref_flat[k])
        for k in ref_keys
        if not _values_equal(our_flat[k], ref_flat[k])
    }
    assert not diffs, f"value mismatches vs reference loader: {dict(list(diffs.items())[:10])}"


def _values_equal(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return abs(a - b) < 1e-12 or (np.isnan(a) and np.isnan(b))
    return a == b


def test_every_reference_project_yaml_loads(monkeypatch):
    """Exhaustive smoke: every project YAML in the reference tree loads
    through our loader without error and resolves its inheritance."""
    assert PROJECT_YAMLS, "no reference project yamls found"
    for path in PROJECT_YAMLS:
        cfg = load_config(path)
        assert cfg.get("TASK_TYPE", None) or cfg.get("TRAIN", None) is not None, path
