"""Video classification model zoo: every backbone preset builds and runs
a tiny forward pass (NDHWC, jit)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clip_fsar_tpu.config import load_config
from clip_fsar_tpu.models.video.model import BaseVideoModel

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HMDB1 = os.path.join(REPO, "configs/projects/CLIPFSAR/hmdb51/CLIPFSAR_HMDB51_1shot_v1.yaml")


def make_cfg(preset: str, **extra):
    """Pool defaults + a backbone preset + tiny data dims."""
    import yaml

    cfg = load_config(HMDB1)  # gives full pool defaults
    with open(os.path.join(REPO, f"configs/pool/backbone/{preset}.yaml")) as f:
        preset_cfg = yaml.safe_load(f)
    from clip_fsar_tpu.config.config import merge_into

    merged = cfg.to_dict()
    merge_into(merged, preset_cfg)
    from clip_fsar_tpu.config import Config

    cfg = Config(merged)
    cfg.TASK_TYPE = "classification"
    cfg.DATA.NUM_INPUT_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.VIDEO.HEAD.NUM_CLASSES = 7
    for k, v in extra.items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = getattr(node, p)
        setattr(node, parts[-1], v)
    return cfg


def run_model(cfg, x_shape=(2, 4, 32, 32, 3)):
    model = BaseVideoModel(cfg=cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(*x_shape).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits, feats = model.apply(variables, x, train=False)
    return logits, feats


@pytest.mark.parametrize("preset", ["r2d3ds", "r2p1d", "tada2d", "csn"])
def test_resnet3d_presets(preset):
    cfg = make_cfg(preset)
    logits, _ = run_model(cfg)
    assert logits.shape == (2, 7)
    np.testing.assert_allclose(np.asarray(logits).sum(-1), 1.0, rtol=1e-4)  # softmax at eval


def test_s3dg_backbone():
    cfg = make_cfg("s3dg")
    # inception needs >= 64px for the five downsamples; use 64 with 4 frames
    logits, _ = run_model(cfg, x_shape=(1, 4, 64, 64, 3))
    assert logits.shape == (1, 7)


def test_timesformer_backbone():
    cfg = make_cfg("timesformer")
    cfg.VIDEO.BACKBONE.NUM_FEATURES = 32
    cfg.VIDEO.BACKBONE.NUM_HEADS = 2
    cfg.VIDEO.BACKBONE.DEPTH = 2
    cfg.VIDEO.BACKBONE.PATCH_SIZE = 8
    logits, _ = run_model(cfg)
    assert logits.shape == (2, 7)


def test_vivit_fac_enc_backbone():
    cfg = make_cfg("vivit_fac_enc")
    cfg.VIDEO.BACKBONE.NUM_FEATURES = 32
    cfg.VIDEO.BACKBONE.NUM_HEADS = 2
    cfg.VIDEO.BACKBONE.DEPTH = 2
    cfg.VIDEO.BACKBONE.DEPTH_TEMP = 1
    cfg.VIDEO.BACKBONE.PATCH_SIZE = 8
    cfg.VIDEO.BACKBONE.TUBELET_SIZE = 2
    logits, _ = run_model(cfg)
    assert logits.shape == (2, 7)


def test_nonlocal_stage():
    cfg = make_cfg("r2d3ds")
    cfg.VIDEO.BACKBONE.NONLOCAL.ENABLE = True
    cfg.VIDEO.BACKBONE.NONLOCAL.STAGES = [5]
    logits, _ = run_model(cfg)
    assert logits.shape == (2, 7)


def test_train_mode_logits_are_raw():
    cfg = make_cfg("r2d3ds")
    model = BaseVideoModel(cfg=cfg)
    x = jnp.ones((1, 4, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits, _ = model.apply(variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    s = float(np.asarray(logits).sum())
    assert abs(s - 1.0) > 1e-3 or logits.shape[-1] == 1  # not softmaxed at train


def test_init_parity_msra_and_fc():
    """conv3d kernels follow c2_msra_fill (std = sqrt(2/fan_out),
    reference init_helper.py:112-122); classifier FCs use normal(0.01)."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from clip_fsar_tpu.models.video.blocks import conv3d

    conv = conv3d(64, (3, 3, 3), name="c")
    params = conv.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 8, 8, 16)))["params"]
    k = np.asarray(params["kernel"])
    fan_out = 64 * 3 * 3 * 3
    expected = np.sqrt(2.0 / fan_out)
    assert abs(k.std() - expected) / expected < 0.1

    from clip_fsar_tpu.models.init import fc_init

    w = np.asarray(fc_init()(jax.random.PRNGKey(0), (256, 100), jnp.float32))
    assert abs(w.std() - 0.01) / 0.01 < 0.1
