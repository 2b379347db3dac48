"""Every shipped project YAML must load, resolve its head from the
registry, and (one representative per unique (head, backbone, eval
variant) signature) build the full model and run an episode forward.

Same rationale as tests/test_backbone_presets.py: config-level sweeps
catch the integration bugs that component-level parity tests cannot
(e.g. the SlowFast per-pathway preset bug).
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_fsar_tpu.config import load_config
from clip_fsar_tpu.models.builder import build_few_shot_model
from clip_fsar_tpu.utils.registry import HEAD_REGISTRY

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
YAMLS = sorted(glob.glob(os.path.join(REPO, "configs/projects/**/*.yaml", ), recursive=True))


def _signature(cfg):
    h = cfg.VIDEO.HEAD
    return (
        str(h.NAME),
        str(h.get("BACKBONE_NAME", cfg.VIDEO.BACKBONE.get("META_ARCH", ""))),
        bool(cfg.TRAIN.get("MERGE_BEFORE", False)),
        "SHOT_TEST" in cfg.TRAIN,
    )


def test_all_project_yamls_load_and_resolve():
    assert len(YAMLS) >= 45
    for path in YAMLS:
        cfg = load_config(path)
        assert cfg.TASK_TYPE == "few_shot_action", path
        HEAD_REGISTRY.get(cfg.VIDEO.HEAD.NAME)  # raises on unknown
        assert cfg.TRAIN.WAY >= 2 and cfg.TRAIN.SHOT >= 1, path


def _representatives():
    reps = {}
    for path in YAMLS:
        sig = _signature(load_config(path))
        reps.setdefault(sig, path)
    return sorted(reps.values())


@pytest.mark.slow
@pytest.mark.parametrize("path", _representatives(), ids=lambda p: os.path.basename(p))
def test_representative_builds_and_forwards(path):
    import __graft_entry__ as g

    cfg = load_config(path)
    # shrink the episode/frames (config surface under test, not capacity)
    cfg.TRAIN.WAY = 2
    cfg.TRAIN.SHOT = 1
    cfg.TRAIN.QUERY_PER_CLASS = 1
    cfg.TRAIN.QUERY_PER_CLASS_TEST = 1
    cfg.DATA.NUM_INPUT_FRAMES = 4
    res = int(cfg.DATA.TRAIN_CROP_SIZE)
    model = build_few_shot_model(cfg, jax.random.PRNGKey(0))

    ep = g._dummy_episode(np.random.RandomState(0), 2, 1, 1, 4, res)
    out = model.head.apply(model.variables, ep, model.text_train, model.text_test, train=False)
    logits = out["logits"] if isinstance(out, dict) else out
    assert logits.shape == (2, 2), (path, logits.shape)
    assert bool(jnp.isfinite(logits).all()), path
