"""Multi-host readiness (capability of reference utils/launcher.py:21-27
multi-node NUM_SHARDS runs, TPU-native):

* per-(step, slot) episode seeding makes the global batch SLICEABLE —
  each host decodes exactly its local_episode_range rows and
  shard_batch assembles the global array with
  jax.make_array_from_process_local_data;
* a real 2-process x 4-CPU-device jax.distributed run produces the SAME
  seeded loss trajectory as the single-process 8-device run.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def small_cfg():
    from clip_fsar_tpu.config import load_config

    return load_config(
        os.path.join(REPO, "configs/projects/CLIPFSAR/hmdb51/CLIPFSAR_HMDB51_1shot_v1.yaml"),
        [
            "DATA.DECODER", "synthetic",
            "DATA.NUM_INPUT_FRAMES", "2",
            "DATA.TRAIN_CROP_SIZE", "32",
            "DATA.TEST_CROP_SIZE", "32",
            "DATA.TRAIN_JITTER_SCALES", "[40, 40]",
            "DATA.TEST_SCALE", "40",
            "DATA_LOADER.NUM_WORKERS", "2",
            "TRAIN.WAY", "3",
            "TRAIN.QUERY_PER_CLASS", "2",
        ],
    )


def test_episode_range_slices_the_global_batch():
    """Loader with episode_range (lo, hi) must emit exactly rows lo:hi of
    the full batch — the property multi-host feeding relies on."""
    from clip_fsar_tpu.data.loader import build_few_shot_loader

    cfg = small_cfg()
    with build_few_shot_loader(cfg, "train", num_steps=2, episodes_per_step=4) as loader:
        full = list(loader)
    with build_few_shot_loader(cfg, "train", num_steps=2, episodes_per_step=4, episode_range=(1, 3)) as loader:
        part = list(loader)
    for fb, pb in zip(full, part):
        np.testing.assert_array_equal(np.asarray(pb.support_images), np.asarray(fb.support_images)[1:3])
        np.testing.assert_array_equal(np.asarray(pb.target_labels), np.asarray(fb.target_labels)[1:3])


def test_episode_range_empty_shard_yields_zero_row_batches():
    """A model-only host (local_episode_range (0, 0)) must produce
    structurally-correct [0, ...] batches, not crash the worker —
    regression for stack_episodes([])."""
    from clip_fsar_tpu.data.loader import build_few_shot_loader

    cfg = small_cfg()
    with build_few_shot_loader(cfg, "train", num_steps=2, episodes_per_step=4, episode_range=(0, 0)) as loader:
        batches = list(loader)
    assert len(batches) == 2
    for b in batches:
        assert b.support_images.shape[0] == 0
        assert b.support_images.ndim == 6  # [E, S, T, H, W, C] structure intact
        assert b.target_labels.shape[0] == 0


def test_local_episode_range_single_process():
    import jax

    from clip_fsar_tpu.parallel.mesh import build_mesh, local_episode_range

    mesh = build_mesh(None)
    assert local_episode_range(8, mesh) == (0, 8)


_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(rank: int, world: int, port: int, ndev: int):
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={ndev}",
        "MH_COORD": f"127.0.0.1:{port}",
        "MH_RANK": str(rank),
        "MH_WORLD": str(world),
    })
    return subprocess.Popen(
        [sys.executable, _WORKER], env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


@pytest.mark.slow
def test_two_process_distributed_matches_single_process():
    """2 processes x 4 CPU devices (jax.distributed) vs 1 process x 8
    devices: identical seeded loss trajectory over 3 steps."""
    # Gloo's cross-process rendezvous has a fixed ~30 s KV deadline; on a
    # 1-core CI host the peer can be starved past it by XLA compiles
    # (observed round 5: "Gloo context initialization failed:
    # DEADLINE_EXCEEDED").  That is an infra flake, not a numerics
    # failure — retry the whole 2-process launch once before failing.
    for attempt in range(2):
        port = _free_port()
        procs = [_launch(r, 2, port, 4) for r in range(2)]
        outs = [p.communicate(timeout=600)[0] for p in procs]
        if all(p.returncode == 0 for p in procs):
            break
        blob = "".join(outs)
        if attempt == 0 and ("DEADLINE_EXCEEDED" in blob or "Gloo context" in blob):
            continue
        for p, out in zip(procs, outs):
            assert p.returncode == 0, out[-2000:]
    single = _launch(0, 1, _free_port(), 8)
    out_single = single.communicate(timeout=600)[0]
    assert single.returncode == 0, out_single[-2000:]

    def losses(blob: str):
        rows = [l for l in blob.splitlines() if l.startswith("LOSSES ")]
        assert rows, blob[-2000:]
        return [float(x) for x in rows[-1].split()[1:]]

    l_multi = losses(outs[0])
    l_single = losses(out_single)
    assert len(l_multi) == 3
    np.testing.assert_allclose(l_multi, losses(outs[1]), rtol=0, atol=0)  # replicas agree exactly
    np.testing.assert_allclose(l_multi, l_single, rtol=2e-2)  # bf16 reduction-order tolerance
