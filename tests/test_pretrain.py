"""Checkpoint surgery (2D->3D inflation, pos-embed repeat/super-resolution,
tubelet init) + config-pointed checkpoint search order.

Reference oracle: utils/checkpoint.py:146-274 (inflate_weight,
checkpoint_preprocess) and :452-576 (test/train search orders).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from clip_fsar_tpu.config import Config
from clip_fsar_tpu.train.pretrain import (
    flatten_tree,
    inflate_2d_to_3d,
    load_checkpoint_file,
    load_test_variables,
    load_train_checkpoint_file,
    merge_non_strict,
    preprocess_checkpoint,
    save_weights_npz,
    unflatten_tree,
)


def _cfg(**train):
    base = {
        "TRAIN": {
            "FINE_TUNE": True,
            "CHECKPOINT_PRE_PROCESS": {"ENABLE": True, "POP_HEAD": False, "POS_EMBED": None, "PATCH_EMBD": None},
            **train,
        },
        "TEST": {},
        "DATA": {"NUM_INPUT_FRAMES": 8, "TRAIN_CROP_SIZE": 224},
        "VIDEO": {"BACKBONE": {"PATCH_SIZE": 16, "TUBELET_SIZE": 2}},
    }
    return Config(base)


def test_flatten_unflatten_roundtrip():
    tree = {"a": {"b": np.ones(2), "c": {"d": np.zeros(3)}}, "e": np.arange(4)}
    flat = flatten_tree(tree)
    assert set(flat) == {"a/b", "a/c/d", "e"}
    back = unflatten_tree(flat)
    np.testing.assert_array_equal(back["a"]["c"]["d"], np.zeros(3))


def test_inflate_2d_to_3d_repeats_and_scales():
    """I3D inflation (reference inflate_weight:146-182): repeat over the
    new depth axis and divide by depth so activations are preserved."""
    src = {"stem": {"conv1": {"kernel": np.random.RandomState(0).randn(7, 7, 3, 8).astype(np.float32)}}}
    tmpl = {"stem": {"conv1": {"kernel": np.zeros((5, 7, 7, 3, 8), np.float32)}}}
    out = inflate_2d_to_3d(src, tmpl)
    k = out["stem"]["conv1"]["kernel"]
    assert k.shape == (5, 7, 7, 3, 8)
    np.testing.assert_allclose(k[0], src["stem"]["conv1"]["kernel"] / 5.0)
    np.testing.assert_allclose(k.sum(0), src["stem"]["conv1"]["kernel"], rtol=1e-6)


def test_pos_embed_repeat():
    """POS_EMBED=repeat (reference :205-216): spatial table repeated once
    per tubelet frame, cls token kept."""
    cfg = _cfg()
    cfg.TRAIN.CHECKPOINT_PRE_PROCESS.POS_EMBED = "repeat"
    n, c = 5, 6  # cls + 4 patches
    pe = np.arange(n * c, dtype=np.float32).reshape(1, n, c)
    params = {"backbone": {"pos_embd": pe}}
    out = preprocess_checkpoint(cfg, params)
    new = out["backbone"]["pos_embd"]
    f = 8 // 2  # NUM_INPUT_FRAMES // TUBELET_SIZE
    assert new.shape == (1, 1 + f * (n - 1), c)
    np.testing.assert_array_equal(new[0, 0], pe[0, 0])
    # each frame block is a copy of the original spatial table
    for i in range(f):
        np.testing.assert_array_equal(new[0, 1 + i * (n - 1) : 1 + (i + 1) * (n - 1)], pe[0, 1:])


def test_pos_embed_super_resolution():
    """POS_EMBED=super-resolution: bilinear resize of the spatial grid to
    the target patch grid (reference :222-243)."""
    cfg = _cfg()
    cfg.TRAIN.CHECKPOINT_PRE_PROCESS.POS_EMBED = "super-resolution"
    cfg.DATA.TRAIN_CROP_SIZE = 64
    cfg.VIDEO.BACKBONE.PATCH_SIZE = 16  # -> 4x4 target grid
    side_ckp, c = 2, 3
    pe = np.random.RandomState(0).randn(1, 1 + side_ckp**2, c).astype(np.float32)
    te = np.random.RandomState(1).randn(1, 1 + 8, c).astype(np.float32)  # 8 ckpt frames
    params = {"backbone": {"pos_embd": pe, "temp_embd": te}}
    out = preprocess_checkpoint(cfg, params)
    assert out["backbone"]["pos_embd"].shape == (1, 1 + 16, c)
    np.testing.assert_array_equal(out["backbone"]["pos_embd"][0, 0], pe[0, 0])
    # temporal table resized to NUM_INPUT_FRAMES // TUBELET_SIZE = 4
    assert out["backbone"]["temp_embd"].shape == (1, 1 + 4, c)


def test_tubelet_central_frame_and_average():
    cfg = _cfg()
    w2d = np.random.RandomState(0).randn(1, 4, 4, 3, 8).astype(np.float32)
    cfg.TRAIN.CHECKPOINT_PRE_PROCESS.PATCH_EMBD = "central_frame"
    out = preprocess_checkpoint(cfg, {"backbone": {"stem": {"conv1": {"kernel": w2d}}}})
    k = out["backbone"]["stem"]["conv1"]["kernel"]
    assert k.shape == (2, 4, 4, 3, 8)
    np.testing.assert_array_equal(k[1], w2d[0])  # ts//2 == 1
    np.testing.assert_array_equal(k[0], 0)

    cfg.TRAIN.CHECKPOINT_PRE_PROCESS.PATCH_EMBD = "average"
    out = preprocess_checkpoint(cfg, {"backbone": {"stem": {"conv1": {"kernel": w2d}}}})
    k = out["backbone"]["stem"]["conv1"]["kernel"]
    np.testing.assert_allclose(k.sum(0), w2d[0], rtol=1e-6)


def test_pop_head_on_finetune():
    cfg = _cfg()
    cfg.TRAIN.CHECKPOINT_PRE_PROCESS.POP_HEAD = True
    params = {"backbone": {"w": np.ones(2)}, "head": {"out": {"kernel": np.ones((2, 2))}}}
    out = preprocess_checkpoint(cfg, params)
    assert "head" not in out
    assert "backbone" in out


def test_merge_non_strict_skips_mismatches():
    template = {"a": np.zeros(3), "b": np.zeros((2, 2)), "c": np.zeros(1)}
    loaded = {"a": np.ones(3), "b": np.ones(5), "x": np.ones(1)}  # b mismatched, x unknown
    merged, used = merge_non_strict(template, loaded)
    assert used == 1
    np.testing.assert_array_equal(merged["a"], 1)
    np.testing.assert_array_equal(merged["b"], 0)


def test_npz_checkpoint_roundtrip_and_search_order(tmp_path):
    """TEST.CHECKPOINT_FILE_PATH wins over OUTPUT_DIR and TRAIN path
    (reference checkpoint.py:452-529)."""
    variables = {"params": {"w": np.full(3, 7.0, np.float32)}, "batch_stats": {"bn": {"mean": np.ones(2, np.float32)}}}
    p = os.path.join(tmp_path, "weights.npz")
    save_weights_npz(p, variables)

    template = {"params": {"w": np.zeros(3, np.float32)}, "batch_stats": {"bn": {"mean": np.zeros(2, np.float32)}}}
    cfg = _cfg()
    out, ok = load_checkpoint_file(cfg, p, template)
    assert ok
    np.testing.assert_array_equal(out["params"]["w"], 7.0)
    np.testing.assert_array_equal(out["batch_stats"]["bn"]["mean"], 1.0)

    # search order: TEST path beats everything
    cfg.TEST.CHECKPOINT_FILE_PATH = p
    got = load_test_variables(cfg, None, None, template)
    np.testing.assert_array_equal(got["params"]["w"], 7.0)

    # TRAIN path is the last fallback
    cfg2 = _cfg(CHECKPOINT_FILE_PATH=p)
    got2 = load_test_variables(cfg2, None, None, template)
    np.testing.assert_array_equal(got2["params"]["w"], 7.0)

    # nothing set -> fresh weights
    got3 = load_test_variables(_cfg(), None, None, template)
    np.testing.assert_array_equal(got3["params"]["w"], 0.0)


def test_train_checkpoint_file_with_preprocess(tmp_path):
    """A TimeSformer-style config can start from a 2D checkpoint: pos-embed
    repeated, tubelet central-frame, non-strict merge into the template."""
    c = 6
    src = {
        "params": {
            "backbone": {
                "pos_embd": np.random.RandomState(0).randn(1, 5, c).astype(np.float32),
                "stem": {"conv1": {"kernel": np.random.RandomState(1).randn(1, 4, 4, 3, c).astype(np.float32)}},
            }
        }
    }
    p = os.path.join(tmp_path, "vit2d.npz")
    save_weights_npz(p, src)

    f = 4  # 8 frames / tubelet 2
    template = {
        "params": {
            "backbone": {
                "pos_embd": np.zeros((1, 1 + f * 4, c), np.float32),
                "stem": {"conv1": {"kernel": np.zeros((2, 4, 4, 3, c), np.float32)}},
            },
            "head": {"out": {"kernel": np.ones((c, 10), np.float32)}},
        }
    }
    cfg = _cfg(CHECKPOINT_FILE_PATH=p)
    cfg.TRAIN.CHECKPOINT_PRE_PROCESS.POS_EMBED = "repeat"
    cfg.TRAIN.CHECKPOINT_PRE_PROCESS.PATCH_EMBD = "central_frame"
    out, ok = load_train_checkpoint_file(cfg, template)
    assert ok
    assert out["params"]["backbone"]["pos_embd"].shape == (1, 1 + f * 4, c)
    assert np.abs(out["params"]["backbone"]["pos_embd"]).sum() > 0
    k = out["params"]["backbone"]["stem"]["conv1"]["kernel"]
    np.testing.assert_array_equal(k[0], 0)
    assert np.abs(k[1]).sum() > 0
    np.testing.assert_array_equal(out["params"]["head"]["out"]["kernel"], 1.0)  # untouched


def test_orbax_dir_checkpoint_loads_via_config_path(tmp_path):
    """TEST/TRAIN.CHECKPOINT_FILE_PATH pointed at an orbax OUTPUT_DIR (or
    its checkpoints/<step> dir) must restore — the pytree lives under the
    step dir's 'default' item, which _load_raw must target (regression:
    restoring the step dir itself raises FileNotFoundError on _METADATA)."""
    import jax

    from clip_fsar_tpu.train.checkpoint import Checkpointer

    state = {"params": {"w": np.full(3, 5.0, np.float32)}, "step": np.int32(3)}
    ckpt = Checkpointer(str(tmp_path))
    ckpt.save(3, state)
    ckpt.close()

    template = {"params": {"w": np.zeros(3, np.float32)}}
    for path in (str(tmp_path), os.path.join(tmp_path, "checkpoints"), os.path.join(tmp_path, "checkpoints", "3")):
        out, ok = load_checkpoint_file(_cfg(), path, template)
        assert ok, path
        np.testing.assert_array_equal(out["params"]["w"], 5.0)
