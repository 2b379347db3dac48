"""End-to-end few-shot training on REAL mp4 files.

Generates a miniature HMDB-style benchmark on disk (mp4 videos + the
reference's folder-style split lists, ssv2_few_shot.py:42-55) and drives
the full CLI — config load, split parsing, threaded loader, OpenCV
decode, transforms, train step, checkpoint, restore, eval — the only
test that crosses every layer with actual video IO.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_video(path, seed, n_frames=12, size=(72, 56)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 255, (size[1], size[0], 3)).astype(np.uint8)
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 12.0, size)
    assert w.isOpened()
    for i in range(n_frames):
        w.write(np.roll(base, i * 3, axis=1))
    w.release()


@pytest.mark.slow
def test_cli_train_and_eval_on_real_mp4(tmp_path):
    ways, shot, qpc = 3, 1, 2
    per_class = shot + qpc + 1
    # val list too: interleaved VAL_FRE_ITER validation runs on the val
    # split (reference train_net_few_shot.py:78-82)
    for split in ("train", "val", "test"):
        lines = []
        for c in range(ways):
            for v in range(per_class):
                rel = f"videos/{split}_c{c}_v{v}.mp4"
                _write_video(tmp_path / rel, seed=hash((split, c, v)) % 2**31)
                lines.append(f"{split}{c}//{rel}")
        (tmp_path / f"{split}_few_shot.txt").write_text("\n".join(lines) + "\n")

    out_dir = tmp_path / "out"
    cmd = [
        sys.executable, "runs/run.py",
        "--cfg", "configs/projects/CLIPFSAR/hmdb51/CLIPFSAR_HMDB51_1shot_v1.yaml",
        "DATA.DECODER", "opencv",
        "DATA.ANNO_DIR", str(tmp_path),
        "DATA.DATA_ROOT_DIR", str(tmp_path),
        "TRAIN.DATASET_FEW", "HMDB_few_shot",
        "TRAIN.WAY", str(ways),
        "TRAIN.SHOT", str(shot),
        "TRAIN.QUERY_PER_CLASS", str(qpc),
        "TRAIN.QUERY_PER_CLASS_TEST", "1",
        "TRAIN.NUM_TRAIN_TASKS", "2",
        "TRAIN.NUM_TEST_TASKS", "2",
        "TRAIN.VAL_FRE_ITER", "2",
        "TRAIN.NUM_VAL_TASKS", "2",
        "TPU.EPISODES_PER_STEP", "1",
        "DATA.NUM_INPUT_FRAMES", "4",
        "DATA.TRAIN_CROP_SIZE", "64",
        "DATA.TEST_CROP_SIZE", "64",
        "DATA.TEST_SCALE", "64",
        "VIDEO.HEAD.BACKBONE_NAME", "ViT-Tiny-Test",
        "OUTPUT_DIR", str(out_dir),
    ]
    env = dict(os.environ, JAX_PLATFORMS="cpu", XLA_FLAGS="--xla_force_host_platform_device_count=2")
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
    assert proc.returncode == 0
    # the run must have decoded real files (not synthetic), trained,
    # checkpointed and evaluated 2 episodes
    assert "eval_test" in proc.stdout or "eval_test" in proc.stderr
    assert os.path.isdir(out_dir)
