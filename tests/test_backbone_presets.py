"""Every shipped backbone preset must build and run through the
classification model end-to-end (init + one fwd).  Branch-level parity
tests alone let a per-pathway config bug hide in the full SlowFast
meta-arch (KERNEL_SIZE[pathway][stage] indexing, reference
slowfast.py:37-50) — this closes that class of gap for the whole pool.
"""

import os

import jax
import jax.numpy as jnp
import pytest
import yaml

from clip_fsar_tpu.config import Config, load_config
from clip_fsar_tpu.config.config import merge_into
from clip_fsar_tpu.models.video.model import build_video_model

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HMDB1 = os.path.join(REPO, "configs/projects/CLIPFSAR/hmdb51/CLIPFSAR_HMDB51_1shot_v1.yaml")

PRESETS = ["tada2d", "timesformer", "slowfast_8x8", "slowfast_4x16", "r2p1d", "s3dg", "csn", "r2d3ds", "vivit", "vivit_fac_enc"]


def _cfg(preset: str):
    base = load_config(HMDB1).to_dict()
    with open(os.path.join(REPO, f"configs/pool/backbone/{preset}.yaml")) as f:
        merge_into(base, yaml.safe_load(f))
    cfg = Config(base)
    cfg.TASK_TYPE = "classification"
    cfg.DATA.NUM_INPUT_FRAMES = 8
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.VIDEO.HEAD.NUM_CLASSES = 5
    return cfg


@pytest.mark.parametrize("preset", PRESETS)
def test_preset_builds_and_runs(preset):
    cfg = _cfg(preset)
    model = build_video_model(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 8, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits, _ = model.apply(variables, x, train=False)
    assert logits.shape == (1, 5)
    assert bool(jnp.isfinite(logits).all())


def test_slowfast_single_tensor_input_subsamples_slow():
    """A single input tensor is split into [x[:, ::alpha], x] in-graph
    (reference builds the pair in the dataset, base_dataset.py:413-417)."""
    cfg = _cfg("slowfast_8x8")
    alpha = int(cfg.VIDEO.BACKBONE.SLOWFAST.ALPHA)
    from clip_fsar_tpu.models.video.meta import Slowfast

    bb = Slowfast(cfg=cfg)
    x = jnp.zeros((1, 8, 32, 32, 3), jnp.float32)
    variables = bb.init(jax.random.PRNGKey(0), x)
    s, f = bb.apply(variables, x)
    # slow temporal length = T/alpha, fast keeps T (then stem strides apply
    # equally); channel widths differ by beta
    assert s.shape[1] * alpha == f.shape[1] * 1 or s.shape[1] == max(8 // alpha, 1)
    assert s.shape[-1] > f.shape[-1]
