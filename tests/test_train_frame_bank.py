"""Device-resident TRAIN frame bank (data/frame_bank.py): bank-mode
training must be BIT-IDENTICAL to the pixel path.

The episodic train transform is a FIXED-size stretch + random crop +
flip (reference transformations.py:676-731), so the bank stores frames
at the stretch size and the jitted step crops/flips on device from
host-drawn parameters.  Because (a) the pixel path with
``cached_opencv`` snaps frame indices to the decoder grid exactly as
the bank sampler does, (b) the stretch is deterministic and the crop
commutes with storage (fixed-point taps in destination coordinates),
and (c) the train index sampler consumes the (seed, step, slot) RNG
stream identically (including the support-flip short-circuit), the two
modes must produce the same pixels, the same losses, the same gradients
— not approximately, exactly.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

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


def _make_cfg(tmp_path, **overrides):
    lines = []
    for c in range(WAYS):
        for v in range(PER_CLASS):
            rel = f"videos/train_c{c}_v{v}.mp4"
            _write_video(tmp_path / rel, seed=(c * 31 + v))
            lines.append(f"train{c}//{rel}")
    (tmp_path / "train_few_shot.txt").write_text("\n".join(lines) + "\n")

    opts = [
        "DATA.DECODER", "cached_opencv",
        "DATA.ANNO_DIR", str(tmp_path),
        "DATA.DATA_ROOT_DIR", str(tmp_path),
        "DATA.FRAME_CACHE_DIR", str(tmp_path / "cache"),
        "DATA.FRAME_CACHE_FRAMES", "8",
        "TRAIN.DATASET_FEW", "HMDB_few_shot",
        "TRAIN.WAY", str(WAYS),
        "TRAIN.SHOT", "1",
        "TRAIN.QUERY_PER_CLASS", "1",
        "DATA.NUM_INPUT_FRAMES", "4",
        "DATA.TRAIN_CROP_SIZE", "64",
        # stretch 96x96 -> 32px of crop jitter in each axis
        "DATA.TRAIN_JITTER_SCALES", "[96, 96]",
        "DATA.TEST_CROP_SIZE", "64",
        "DATA.TEST_SCALE", "64",
        "VIDEO.HEAD.BACKBONE_NAME", "ViT-Tiny-Test",
        "TPU.MESH.DATA", "1",
        "OUTPUT_DIR", str(tmp_path / "out"),
    ]
    for k, v in overrides.items():
        opts += [k, str(v)]
    return load_config(
        os.path.join(REPO, "configs/projects/CLIPFSAR/hmdb51/CLIPFSAR_HMDB51_1shot_v1.yaml"), opts
    )


def _host_assemble(bank, clip_idx, num_frames, crop):
    """Numpy reference of make_bank_train_assemble for one clip."""
    rows, (y, x, flip) = clip_idx[:num_frames], clip_idx[num_frames:]
    frames = bank[rows]
    c = frames[:, y : y + crop, x : x + crop]
    return c[:, :, ::-1] if flip else c


def test_train_sampler_bit_identical_pixels(tmp_path):
    from clip_fsar_tpu.data.frame_bank import TrainIndexEpisodeSampler, build_train_frame_bank
    from clip_fsar_tpu.data.loader import DATASET_REGISTRY

    cfg = _make_cfg(tmp_path)
    dataset = DATASET_REGISTRY.get("HMDB_few_shot")(cfg, "train")
    bank, table = build_train_frame_bank(cfg)

    pix = dataset.make_sampler(0)
    idx = TrainIndexEpisodeSampler(dataset.make_sampler(0), table)
    t, crop = 4, 64
    saw_flip = False
    for step in range(4):
        pix.reseed_for_slot(step, 0)
        idx.reseed_for_slot(step, 0)
        ep_p = pix.sample_episode()
        ep_i = idx.sample_episode()
        np.testing.assert_array_equal(ep_i.batch_class_list, ep_p.batch_class_list)
        np.testing.assert_array_equal(ep_i.target_labels, ep_p.target_labels)
        np.testing.assert_array_equal(ep_i.real_support_labels, ep_p.real_support_labels)
        for k in range(ep_p.support_images.shape[0]):
            np.testing.assert_array_equal(
                _host_assemble(bank, ep_i.support_images[k], t, crop), ep_p.support_images[k]
            )
        for k in range(ep_p.target_images.shape[0]):
            saw_flip = saw_flip or bool(ep_i.target_images[k][-1])
            np.testing.assert_array_equal(
                _host_assemble(bank, ep_i.target_images[k], t, crop), ep_p.target_images[k]
            )
    assert saw_flip, "4 steps x 3 query clips should draw at least one flip"


def test_bank_train_step_matches_pixel_step_exactly(tmp_path):
    """Two train iterations, pixel vs bank mode, same seeds: identical
    loss/metrics trajectories (the device assemble feeds the SAME uint8
    clips into the SAME step)."""
    from clip_fsar_tpu.data.frame_bank import (
        TrainIndexEpisodeSampler,
        make_bank_train_context,
    )
    from clip_fsar_tpu.data.loader import build_few_shot_loader
    from clip_fsar_tpu.models.builder import build_few_shot_model
    from clip_fsar_tpu.parallel.mesh import build_mesh, shard_batch
    from clip_fsar_tpu.train.loop import build_state
    from clip_fsar_tpu.train.optimizer import build_optimizer
    from clip_fsar_tpu.train.step import make_train_step

    def run(bank_mode):
        cfg = _make_cfg(tmp_path)
        mesh = build_mesh(cfg)
        model = build_few_shot_model(cfg, jax.random.PRNGKey(0), flow="train")
        tx = build_optimizer(cfg, model.variables["params"], name_prefix="head")
        state = build_state(cfg, model, tx)
        if bank_mode:
            ctx = make_bank_train_context(cfg, model, mesh, tx)
            step_fn = lambda s, b, lr, r: ctx.train_step(s, b, lr, r, ctx.bank)  # noqa: E731
            wrap = lambda s: TrainIndexEpisodeSampler(s, ctx.table)  # noqa: E731
        else:
            step_fn = jax.jit(
                make_train_step(model.head, tx, cfg, model.text_train, model.text_test), donate_argnums=0
            )
            wrap = None
        losses = []
        rng = jax.random.PRNGKey(7)
        with build_few_shot_loader(
            cfg, "train", num_steps=2, episodes_per_step=1, sampler_wrap=wrap
        ) as loader:
            for batch in loader:
                rng, step_rng = jax.random.split(rng)
                state, metrics = step_fn(state, shard_batch(batch, mesh), jnp.float32(1e-3), step_rng)
                losses.append(float(metrics["loss"]))
        return losses

    pixel = run(False)
    bank = run(True)
    assert bank == pixel, f"bank {bank} != pixel {pixel}"


def test_exact_sampling_refuses_train_bank(tmp_path):
    from clip_fsar_tpu.data.frame_bank import build_train_frame_bank

    cfg = _make_cfg(tmp_path, **{"DATA.EXACT_SAMPLING": "true"})
    with pytest.raises(ValueError, match="TRAIN_FRAME_BANK.*EXACT_SAMPLING"):
        build_train_frame_bank(cfg)


def test_bank_train_step_dp_mesh_matches_single_device(tmp_path):
    """TRAIN_FRAME_BANK on a 2-device dp mesh: the bank is replicated,
    the int32 index batch shards over the data axis, and the loss
    trajectory matches the single-device run exactly (same (seed, step,
    slot) episode stream)."""
    from clip_fsar_tpu.data.frame_bank import (
        TrainIndexEpisodeSampler,
        make_bank_train_context,
    )
    from clip_fsar_tpu.data.loader import build_few_shot_loader
    from clip_fsar_tpu.models.builder import build_few_shot_model
    from clip_fsar_tpu.parallel.mesh import build_mesh, shard_batch
    from clip_fsar_tpu.train.loop import build_state
    from clip_fsar_tpu.train.optimizer import build_optimizer

    def run(mesh_data):
        cfg = _make_cfg(tmp_path, **{"TPU.MESH.DATA": mesh_data})
        mesh = build_mesh(cfg)
        model = build_few_shot_model(cfg, jax.random.PRNGKey(0), flow="train")
        tx = build_optimizer(cfg, model.variables["params"], name_prefix="head")
        state = build_state(cfg, model, tx)
        ctx = make_bank_train_context(cfg, model, mesh, tx)
        losses = []
        rng = jax.random.PRNGKey(7)
        with build_few_shot_loader(
            cfg, "train", num_steps=2, episodes_per_step=2,
            sampler_wrap=lambda s: TrainIndexEpisodeSampler(s, ctx.table),
        ) as loader:
            for batch in loader:
                rng, step_rng = jax.random.split(rng)
                state, metrics = ctx.train_step(
                    state, shard_batch(batch, mesh, global_e=2), jnp.float32(1e-3), step_rng, ctx.bank
                )
                losses.append(float(metrics["loss"]))
        return losses

    single = run(1)
    dp = run(2)
    # same tolerance as tests/test_multichip_fulldepth.py: the dp loss
    # mean reduces via an all-reduce whose summation order differs from
    # the single-device mean — fp32 trajectories match to ~1e-6 rtol
    np.testing.assert_allclose(dp, single, rtol=1e-5, atol=0)
