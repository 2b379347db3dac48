"""Device-resident eval frame bank (data/frame_bank.py): bank-mode
evaluation must be BIT-IDENTICAL to the pixel path.

The bank replaces per-step pixel uploads with device-side gathers from
an HBM-pinned [V*F, crop, crop, 3] bank.  Because (a) the pixel path
with ``cached_opencv`` already snaps frame indices to the decoder's
uniform grid, (b) the test transform is deterministic, and (c) the index
sampler consumes the (seed, step, slot) RNG stream identically, the two
modes must produce the same episodes, the same logits, and therefore the
same metrics — not approximately, exactly.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax  # noqa: E402

from clip_fsar_tpu.config.config import load_config  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WAYS, PER_CLASS = 3, 4


def _write_video(path, seed, n_frames=20, size=(72, 56)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 255, (size[1], size[0], 3)).astype(np.uint8)
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 12.0, size)
    assert w.isOpened()
    for i in range(n_frames):
        w.write(np.roll(base, i * 3, axis=1))
    w.release()


def _make_cfg(tmp_path, **tpu_overrides):
    lines = []
    for c in range(WAYS):
        for v in range(PER_CLASS):
            rel = f"videos/test_c{c}_v{v}.mp4"
            _write_video(tmp_path / rel, seed=(c * 31 + v))
            lines.append(f"test{c}//{rel}")
    (tmp_path / "test_few_shot.txt").write_text("\n".join(lines) + "\n")

    opts = [
        "DATA.DECODER", "cached_opencv",
        "DATA.ANNO_DIR", str(tmp_path),
        "DATA.DATA_ROOT_DIR", str(tmp_path),
        "DATA.FRAME_CACHE_DIR", str(tmp_path / "cache"),
        "DATA.FRAME_CACHE_FRAMES", "8",
        "TRAIN.DATASET_FEW", "HMDB_few_shot",
        "TRAIN.WAY", str(WAYS),
        "TRAIN.SHOT", "1",
        "TRAIN.QUERY_PER_CLASS_TEST", "1",
        "DATA.NUM_INPUT_FRAMES", "4",
        "DATA.TRAIN_CROP_SIZE", "64",
        "DATA.TEST_CROP_SIZE", "64",
        "DATA.TEST_SCALE", "64",
        "VIDEO.HEAD.BACKBONE_NAME", "ViT-Tiny-Test",
        "TPU.MESH.DATA", "2",
        "OUTPUT_DIR", str(tmp_path / "out"),
    ]
    for k, v in tpu_overrides.items():
        opts += [k, str(v)]
    return load_config(
        os.path.join(REPO, "configs/projects/CLIPFSAR/hmdb51/CLIPFSAR_HMDB51_1shot_v1.yaml"), opts
    )


def _run_eval(cfg):
    from clip_fsar_tpu.models.builder import build_few_shot_model
    from clip_fsar_tpu.parallel.mesh import build_mesh
    from clip_fsar_tpu.train.loop import evaluate

    mesh = build_mesh(cfg)
    model = build_few_shot_model(cfg, jax.random.PRNGKey(0), flow="test")
    return evaluate(cfg, model, model.variables, mesh, num_tasks=6, episodes_per_step=2)


def test_bank_eval_bit_identical_to_pixel_path(tmp_path):
    pixel = _run_eval(_make_cfg(tmp_path))
    bank = _run_eval(_make_cfg(tmp_path, **{"TPU.EVAL_FRAME_BANK": "true"}))
    assert bank == pixel  # exact: same episodes, same pixels, same reduction order


def test_index_sampler_matches_pixel_sampler_draws(tmp_path):
    """(seed, step, slot) must select the SAME classes/videos/frames in
    both modes — the index sampler replays the pixel sampler's RNG
    consumption exactly."""
    from clip_fsar_tpu.data.frame_bank import IndexEpisodeSampler, build_eval_frame_bank
    from clip_fsar_tpu.data.loader import DATASET_REGISTRY

    cfg = _make_cfg(tmp_path)
    dataset = DATASET_REGISTRY.get("HMDB_few_shot")(cfg, "test")
    bank, table = build_eval_frame_bank(cfg, "test")

    pix = dataset.make_sampler(0)
    idx = IndexEpisodeSampler(dataset.make_sampler(0), table)
    for step in range(3):
        pix.reseed_for_slot(step, 0)
        idx.reseed_for_slot(step, 0)
        ep_p = pix.sample_episode()
        ep_i = idx.sample_episode()
        # same class/video draws
        np.testing.assert_array_equal(ep_i.batch_class_list, ep_p.batch_class_list)
        np.testing.assert_array_equal(ep_i.real_target_labels, ep_p.real_target_labels)
        # gathering the indexed rows from the bank reproduces the pixels
        np.testing.assert_array_equal(bank[ep_i.support_images], ep_p.support_images)
        np.testing.assert_array_equal(bank[ep_i.target_images], ep_p.target_images)
