"""MoSI SSL: speed sets, pseudo-motion clips, heads, losses."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clip_fsar_tpu.config import Config
from clip_fsar_tpu.data.mosi import MoSIGenerator, build_speed_set


def mosi_cfg(**pretrain):
    p = dict(ENABLE=True, NUM_FRAMES=4, DECOUPLE=True, DATA_MODE="xy", ZERO_OUT=False,
             LABEL_MODE="joint", DISTANCE_JITTER=[1.0, 1.0], STATIC_MASK=True,
             ASPECT_RATIO=[1, 1], MASK_SIZE_RATIO=[0.3, 0.5], LOSS="MoSIJoint", LOSS_WEIGHTS=[1])
    p.update(pretrain)
    return Config({
        "PRETRAIN": p,
        "LOCALIZATION": {"ENABLE": False},
        "DATA": {"TRAIN_CROP_SIZE": 32, "NUM_INPUT_FRAMES": 4},
        "VIDEO": {"HEAD": {"NAME": "MoSIHeadJoint", "NUM_CLASSES": 3, "DROPOUT_RATE": 0.0, "ACTIVATION": "softmax"},
                  "BACKBONE": {"META_ARCH": "Identity"}},
        "AUGMENTATION": {"LABEL_SMOOTHING": 0.0},
    })


def test_speed_set_decoupled():
    # 3 classes -> speeds [-1, 0, 1]; decoupled xy, zero kept
    s = build_speed_set(3, True, "xy", False)
    assert (0, 0) in s
    assert ((-1, 0) in s) and ((1, 0) in s) and ((0, -1) in s) and ((0, 1) in s)
    assert len(s) == 5
    s2 = build_speed_set(3, True, "x", True)
    assert s2 == [(-1, 0), (1, 0)]


def test_generator_output():
    cfg = mosi_cfg()
    gen = MoSIGenerator(cfg, "train")
    frames = (np.random.RandomState(0).rand(6, 64, 80, 3) * 255).astype(np.uint8)
    clips, labels = gen(frames, np.random.default_rng(0))
    assert clips.shape == (5, 4, 32, 32, 3)
    assert labels["move_joint"].tolist() == [0, 1, 2, 3, 4]
    # moving clips change over time; the static (0,0) clip does not
    zero_idx = gen.speed_set.index((0, 0))
    moving_idx = gen.speed_set.index((1, 0))
    assert np.array_equal(clips[zero_idx][0], clips[zero_idx][-1])
    assert not np.array_equal(clips[moving_idx][0], clips[moving_idx][-1])


def test_mosi_loss_composition():
    from clip_fsar_tpu.train.losses import calculate_loss

    cfg = mosi_cfg()
    preds = {"move_joint": jnp.asarray(np.random.RandomState(0).randn(10, 5).astype(np.float32))}
    labels = {"self-supervised": {"move_joint": jnp.asarray(np.tile(np.arange(5), 2))}}
    loss, parts = calculate_loss(cfg, preds, None, labels)
    assert np.isfinite(float(loss)) and "loss_joint" in parts


def test_mosinet_forward():
    from clip_fsar_tpu.models.video.model import MoSINet

    cfg = mosi_cfg()
    cfg.VIDEO.BACKBONE = Config({
        "META_ARCH": "ResNet3D", "DEPTH": 10, "NUM_FILTERS": [8, 8, 16, 16, 32],
        "KERNEL_SIZE": [[1, 3, 3]] * 5, "DOWNSAMPLING": [True, False, True, True, True],
        "DOWNSAMPLING_TEMPORAL": [False] * 5, "EXPANSION_RATIO": 2,
        "STEM": {"NAME": "Base2DStem"}, "BRANCH": {"NAME": "R2D3DBranch"},
        "NONLOCAL": {"ENABLE": False, "STAGES": []},
    })
    cfg.BN = Config({"EPS": 1e-5, "MOMENTUM": 0.1})
    model = MoSINet(cfg=cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 5, 4, 32, 32, 3).astype(np.float32))
    vs = model.init(jax.random.PRNGKey(0), x, train=False)
    preds, logits = model.apply(vs, x, train=False)
    assert preds["move_joint"].shape == (10, 5)  # B*S clips x |speed_set|
