"""Device-resident eval frame bank: HBM-pinned episodic evaluation.

The 10k-episode protocol (reference runs/test_net_few_shot.py:57,
NUM_TEST_TASKS) redraws the SAME small test split (~1.3k videos) for
thousands of episodes.  The torch reference re-decodes and re-uploads
pixels every episode; on TPU the whole quantized test set fits in HBM
once: ``V videos x F grid frames x crop^2 x 3`` uint8 (HMDB test split at
F=64, 224px = ~12 GB; F=32 = ~6 GB).

Design: the host samples episodes exactly as the pixel path does (same
RNG stream, same class/video/frame draws), but ships int32 frame-row
indices instead of pixels; the jitted eval step gathers rows from the
bank on device.  Per-step host->device traffic drops from ~96 MB (E=8
uint8 pixels) to ~2.5 KB of indices — on the development tunnel that is
the difference between ~1.8 eps/s (transfer-bound) and the device rate.

Numerics: with ``DATA.DECODER cached_opencv`` the pixel path already
snaps sampled frame indices to the decoder's uniform cache grid
(decode.py::CachedVideoDecoder.read).  The bank stores the SAME grid
frames after the SAME deterministic test transform
(transforms.py::fewshot_test_transform — test-time stretch + center crop
takes no RNG), and the index sampler reproduces the same snap
arithmetic, so bank-mode metrics are bit-identical to the pixel path
(tests/test_frame_bank.py pins this).

Train mode (``TPU.TRAIN_FRAME_BANK``): the episodic train transform is a
FIXED-size stretch + random crop + flip (reference transformations.py
:676-731 stretches every clip to the same (scale[0], scale[1]); only the
crop offset and flip are random).  So the train bank stores frames at
the STRETCH size and the jitted train step performs the per-clip random
crop + flip on device from host-drawn (y, x, flip) values that consume
the SAME RNG stream positions as the pixel path — augmentation
distribution unchanged, and bit-identical pixels when the bank grid
equals the decoder cache grid (tests/test_train_frame_bank.py).  The
host ships ``[T] rows + (y, x, flip)`` int32 per clip instead of
~1.2 MB of pixels; per-step traffic drops ~4 orders of magnitude, which
converts the tunnel-transfer-bound ~1 eps/s train loop into the
device-bound rate (PERFORMANCE.md "Train-path attribution").
HBM cost: V x F x stretch^2 x 3 uint8 — HMDB51 train split (4,280
videos) at F=8, 256px = 6.7 GB; F set by TPU.TRAIN_FRAME_BANK_FRAMES.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np

from clip_fsar_tpu.data.episodes import EpisodeSampler
from clip_fsar_tpu.data.transforms import fewshot_test_transform
from clip_fsar_tpu.utils.logging import get_logger

logger = get_logger(__name__)


@dataclasses.dataclass
class FrameBankTable:
    """Host-side metadata mapping split videos to bank rows."""

    orig_idx: np.ndarray  # [V, F] int64 source frame index of each bank row (padded rows repeat the last valid value)
    nframes: np.ndarray  # [V] int32 valid rows per video
    length: np.ndarray  # [V] int64 original video length (frame sampling uses the TRUE length, as the pixel path does)
    fps: np.ndarray  # [V] float64
    row_of_path: Dict[str, int]
    frames_per_video: int


def build_eval_frame_bank(cfg, split: str) -> Tuple[np.ndarray, FrameBankTable]:
    """Decode + test-transform every video of ``split`` onto the bank grid.

    Returns (bank [V*F, crop, crop, 3] uint8, table).  Uses the dataset's
    configured decoder, so with ``cached_opencv`` the build runs at warm
    JPEG-decode speed and the bank pixels equal what the pixel path would
    feed.  TPU.EVAL_FRAME_BANK_FRAMES (default DATA.FRAME_CACHE_FRAMES)
    sets F — the HBM-vs-temporal-quantization lever.
    """
    crop = int(cfg.DATA.TEST_CROP_SIZE)
    bank_frames = int(cfg.TPU.get("EVAL_FRAME_BANK_FRAMES", 0) or cfg.DATA.get("FRAME_CACHE_FRAMES", 64))
    return _build_bank(
        cfg, split, bank_frames, (crop, crop),
        lambda frames: fewshot_test_transform(frames, cfg), "EVAL_FRAME_BANK",
    )


def build_train_frame_bank(cfg, split: str = "train") -> Tuple[np.ndarray, FrameBankTable]:
    """Decode + FULL-stretch every video of the train split onto the bank
    grid (no crop, no flip — those are random and run on device, see the
    module docstring).  Returns (bank [V*F, nh, nw, 3] uint8, table).
    TPU.TRAIN_FRAME_BANK_FRAMES (default DATA.FRAME_CACHE_FRAMES) sets F.
    """
    from clip_fsar_tpu.data.transforms import _stretch_dims, fewshot_train_stretch

    nh, nw = _stretch_dims(cfg.DATA.TRAIN_JITTER_SCALES)
    bank_frames = int(cfg.TPU.get("TRAIN_FRAME_BANK_FRAMES", 0) or cfg.DATA.get("FRAME_CACHE_FRAMES", 64))
    return _build_bank(
        cfg, split, bank_frames, (nh, nw),
        lambda frames: fewshot_train_stretch(frames, cfg), "TRAIN_FRAME_BANK",
    )


def _build_bank(cfg, split: str, bank_frames: int, out_hw, transform, label: str):
    from clip_fsar_tpu.data.loader import DATASET_REGISTRY

    if bool(cfg.DATA.get("EXACT_SAMPLING", False)):
        # same contract as decode.py::build_decoder: a protocol-exact
        # accuracy run must never feed grid-snapped frames
        raise ValueError(
            f"TPU.{label}=true with DATA.EXACT_SAMPLING=true: the bank "
            "snaps sampled frame indices to its uniform grid, which the "
            "reference protocol's decode path never does (reference datasets/"
            "base/base_dataset.py:493-530). Disable the bank for accuracy "
            "runs, or drop EXACT_SAMPLING for throughput runs."
        )

    name = cfg.TRAIN.DATASET if split == "train" else cfg.TEST.get("DATASET", cfg.TRAIN.DATASET)
    dataset = DATASET_REGISTRY.get(name)(cfg, split)
    fs_split, decoder, path_map = dataset.fs_split, dataset.decoder, dataset.path_map

    # Bit-identity with the pixel path holds ONLY when the pixel path
    # itself snaps to the same grid: DATA.DECODER=cached_opencv with the
    # bank grid equal to the decoder cache grid.  Any other combination
    # quantizes frame indices the pixel path would not — warn loudly so a
    # protocol/accuracy run can't drift silently (ADVICE r3, medium).
    from clip_fsar_tpu.data.decode import CachedVideoDecoder

    if not isinstance(decoder, CachedVideoDecoder):
        logger.warning(
            "%s with DATA.DECODER=%s: the bank snaps sampled frame "
            "indices to a %d-frame uniform grid that this decoder's pixel path "
            "does NOT use — metrics are not bit-identical to the pixel path. "
            "Use DATA.DECODER cached_opencv with FRAME_CACHE_FRAMES == bank "
            "frames for the guaranteed-identical configuration.",
            label, cfg.DATA.get("DECODER", "?"), bank_frames,
        )
    elif bank_frames != decoder.max_frames:
        logger.warning(
            "%s grid (%d frames) != decoder cache grid (%d frames): "
            "bank-mode results will differ from the pixel path's. Set the "
            "bank frames == DATA.FRAME_CACHE_FRAMES for bit-identity.",
            label, bank_frames, decoder.max_frames,
        )

    paths = []
    seen = set()
    for class_id in fs_split.unique_classes():
        for idx in range(fs_split.num_videos_for_class(int(class_id))):
            path = path_map(fs_split.get(int(class_id), idx)[0])
            if path not in seen:
                seen.add(path)
                paths.append(path)

    v = len(paths)
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    bank = np.empty((v * bank_frames, out_h, out_w, 3), np.uint8)
    orig_idx = np.zeros((v, bank_frames), np.int64)
    nframes = np.zeros(v, np.int32)
    length = np.zeros(v, np.int64)
    fps = np.zeros(v, np.float64)
    row_of_path: Dict[str, int] = {}

    for row, path in enumerate(paths):
        n = int(decoder.length(path))
        f = float(decoder.fps(path)) if hasattr(decoder, "fps") else float(cfg.DATA.get("FPS", 30))
        keep = np.unique(np.linspace(0, n - 1, min(bank_frames, max(n, 1))).round().astype(np.int64))
        frames = decoder.read(path, keep)
        frames = transform(frames)
        k = len(keep)
        base = row * bank_frames
        bank[base : base + k] = frames
        if k < bank_frames:  # short video: pad by repeating the last grid frame
            bank[base + k : base + bank_frames] = frames[-1]
        orig_idx[row, :k] = keep
        orig_idx[row, k:] = keep[-1]
        nframes[row] = k
        length[row] = n
        fps[row] = f
        row_of_path[path] = row
        if (row + 1) % 200 == 0:
            logger.info("frame bank: %d/%d videos", row + 1, v)

    logger.info(
        "frame bank built (%s): %d videos x %d grid frames x %dx%dpx = %.2f GB uint8",
        label, v, bank_frames, out_h, out_w, bank.nbytes / 1e9,
    )
    table = FrameBankTable(
        orig_idx=orig_idx, nframes=nframes, length=length, fps=fps,
        row_of_path=row_of_path, frames_per_video=bank_frames,
    )
    return bank, table


def _snap_rows(table: FrameBankTable, row: int, indices) -> np.ndarray:
    """Snap requested source-frame indices to the video's bank grid rows —
    the same nearest-grid arithmetic as decode.py::CachedVideoDecoder.read —
    returning GLOBAL int32 bank row ids."""
    orig = table.orig_idx[row, : table.nframes[row]]
    req = np.asarray(indices, np.int64)
    pos = np.clip(np.searchsorted(orig, req), 0, len(orig) - 1)
    left = np.clip(pos - 1, 0, len(orig) - 1)
    take = np.where(np.abs(orig[left] - req) <= np.abs(orig[pos] - req), left, pos)
    return (row * table.frames_per_video + take).astype(np.int32)


class IndexEpisodeSampler(EpisodeSampler):
    """EpisodeSampler that emits bank ROW indices instead of pixels.

    Consumes the RNG stream identically to the pixel sampler (one
    ``sample_indices_for_cfg`` draw per clip; the test transform draws
    nothing), so (seed, step, slot) selects the same classes, videos and
    frames — only the representation changes: uint8 [T,H,W,3] becomes
    int32 [T] global bank rows.
    """

    def __init__(self, base: EpisodeSampler, table: FrameBankTable):
        self.__dict__.update(base.__dict__)
        self._table = table

    def _load_clip(self, class_id: int, idx: int, is_query: bool = False) -> np.ndarray:
        from clip_fsar_tpu.data.sampling import sample_indices_for_cfg

        t = self._table
        path, _ = self.split.get(class_id, idx)
        path = self.path_map(path)
        row = t.row_of_path[path]
        indices = sample_indices_for_cfg(
            self.cfg, self.mode, int(t.length[row]), float(t.fps[row]), self.rng
        )
        return _snap_rows(t, row, indices)


class TrainIndexEpisodeSampler(EpisodeSampler):
    """Train-mode bank sampler: emits ``[T + 3]`` int32 per clip — T global
    bank rows followed by (crop_y, crop_x, flip).

    RNG-stream parity with the pixel sampler: per clip it draws, in the
    SAME order and with the SAME gating as the pixel path
    (``sample_indices_for_cfg``, then transforms.fewshot_train_transform's
    flip → y → x, including the support-flip short-circuit that skips the
    flip draw when AUGMENTATION.RANDOM_FLIP is off), so (seed, step, slot)
    selects identical classes, videos, frames AND augmentation parameters.
    The crop + flip themselves execute on device (make_bank_train_step).
    """

    def __init__(self, base: EpisodeSampler, table: FrameBankTable):
        self.__dict__.update(base.__dict__)
        self._table = table
        from clip_fsar_tpu.data.transforms import _stretch_dims

        self._nh, self._nw = _stretch_dims(self.cfg.DATA.TRAIN_JITTER_SCALES)
        self._size = int(self.cfg.DATA.TRAIN_CROP_SIZE)
        aug = self.cfg.AUGMENTATION if "AUGMENTATION" in self.cfg else {}
        self._support_flip = bool(aug.get("RANDOM_FLIP", False))

    def _load_clip(self, class_id: int, idx: int, is_query: bool = False) -> np.ndarray:
        from clip_fsar_tpu.data.sampling import sample_indices_for_cfg

        t = self._table
        path, _ = self.split.get(class_id, idx)
        path = self.path_map(path)
        row = t.row_of_path[path]
        indices = sample_indices_for_cfg(
            self.cfg, self.mode, int(t.length[row]), float(t.fps[row]), self.rng
        )
        rows = _snap_rows(t, row, indices)
        # same draw order/gating as transforms.fewshot_train_transform
        if is_query:
            flip = bool(self.rng.random() < 0.5)
        else:
            flip = self._support_flip and bool(self.rng.random() < 0.5)
        y = int(self.rng.integers(0, max(self._nh - self._size, 1)))
        x = int(self.rng.integers(0, max(self._nw - self._size, 1)))
        return np.concatenate([rows, np.asarray([y, x, int(flip)], np.int32)])


def make_bank_eval_step(head, cfg, text_train, text_test):
    """Wrap make_eval_step with a device-side bank gather: the batch's
    ``*_images`` fields are int32 row indices; ``bank`` is the HBM-resident
    [V*F, crop, crop, 3] uint8 array (passed as an argument so jit does
    not inline 6-12 GB of pixels as a constant)."""
    from clip_fsar_tpu.train.step import make_eval_step

    base = make_eval_step(head, cfg, text_train, text_test)

    def eval_step(variables, batch, bank):
        batch = batch.replace(
            support_images=bank[batch.support_images],
            target_images=bank[batch.target_images],
        )
        return base(variables, batch)

    return eval_step


@dataclasses.dataclass
class BankEvalContext:
    eval_step: object  # jitted (variables, batch, bank) -> metrics
    bank: object  # device-resident jax.Array
    table: FrameBankTable


def _upload_bank(bank_np: np.ndarray, mesh):
    """Pin a host bank in HBM, replicated over the mesh.  The upload is
    multi-GB and the dev tunnel can wedge a device RPC — log around it so
    a stall is attributable (the round-3 train5k run went dark exactly
    here)."""
    import time

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from clip_fsar_tpu.parallel.mesh import retry_transient

    # Fit check BEFORE the multi-minute upload: banks are replicated, so
    # each device pays the full bank plus the step's own working set.
    # Measured reference point (round 5): RN50 train + a 6.73 GB train
    # bank + 1.56 GB eval bank OOMed on a 15.75 GB v5e; the same step
    # with 3.37 + 1.56 GB fits.  Warn when the bank alone crosses half
    # of per-device HBM so the operator can shrink *_FRAME_BANK_FRAMES
    # before burning the upload time.
    try:
        stats = jax.devices()[0].memory_stats() or {}
        hbm = float(stats.get("bytes_limit", 0))
    except Exception:
        hbm = 0.0
    if hbm and bank_np.nbytes > 0.5 * hbm:
        logger.warning(
            "frame bank is %.2f GB — more than half of per-device HBM "
            "(%.2f GB). Training/eval steps need several GB of working "
            "set on top; if the step compile OOMs, reduce "
            "TPU.TRAIN_FRAME_BANK_FRAMES / TPU.EVAL_FRAME_BANK_FRAMES.",
            bank_np.nbytes / 1e9, hbm / 1e9,
        )

    t0 = time.perf_counter()

    def _upload():
        b = jax.device_put(bank_np, NamedSharding(mesh, P()))
        b.block_until_ready()
        return b

    bank = retry_transient(_upload, "frame bank upload", base_delay=15.0)
    logger.info("frame bank on device: %.2f GB in %.1f s", bank_np.nbytes / 1e9, time.perf_counter() - t0)
    return bank


def make_bank_eval_context(cfg, model, mesh, split: str) -> BankEvalContext:
    """Build the bank, pin it on device (replicated over the mesh), and
    jit the gathering eval step once.  NOT cached here — the build is
    multi-GB and the jit is slow, so callers that evaluate repeatedly
    (train/loop.py interleaved validation) build one context up front
    and pass it via ``bank_ctx=``."""
    import jax

    bank_np, table = build_eval_frame_bank(cfg, split)
    bank = _upload_bank(bank_np, mesh)
    from clip_fsar_tpu.parallel.mesh import replicated

    eval_step = jax.jit(
        make_bank_eval_step(model.head, cfg, model.text_train, model.text_test),
        out_shardings=replicated(mesh),
    )
    return BankEvalContext(eval_step=eval_step, bank=bank, table=table)


def make_bank_train_assemble(num_frames: int, crop: int):
    """Device-side pixel assembly for the train bank: gather stretched
    frames by row id, then per-clip random crop + flip from the
    host-drawn parameters.  Cropping the stored full-stretch frame is
    bit-identical to the host's fused resize+crop (fixed-point taps are
    computed in destination coordinates — transforms.fewshot_train_stretch),
    and the flip mirrors the crop exactly as the host kernel does."""
    import jax
    import jax.numpy as jnp

    def assemble(bank, idx):
        # idx: int32 [E, N, T+3] — rows | crop_y | crop_x | flip
        rows = idx[..., :num_frames]
        y, x, flip = idx[..., num_frames], idx[..., num_frames + 1], idx[..., num_frames + 2]
        frames = bank[rows]  # [E, N, T, nh, nw, 3] uint8
        e, n = frames.shape[:2]
        flat = frames.reshape((e * n,) + frames.shape[2:])

        def crop_one(fr, yy, xx, fl):
            c = jax.lax.dynamic_slice(fr, (0, yy, xx, 0), (num_frames, crop, crop, 3))
            return jnp.where(fl.astype(bool), c[:, :, ::-1, :], c)

        out = jax.vmap(crop_one)(flat, y.reshape(-1), x.reshape(-1), flip.reshape(-1))
        return out.reshape((e, n) + out.shape[1:])

    return assemble


def make_bank_train_step(head, tx, cfg, text_train, text_test):
    """Wrap make_train_step with the device-side bank assembly: the
    batch's ``*_images`` fields are int32 [.., T+3] row/crop descriptors;
    ``bank`` is the HBM-resident [V*F, nh, nw, 3] uint8 array (explicit
    argument so jit does not inline multi-GB pixels as a constant).  The
    assembled uint8 clips then flow through the unchanged train step —
    device-side ColorJitter/RandomErasing (augment.py), normalization,
    loss, optimizer."""
    from clip_fsar_tpu.train.step import make_train_step

    base = make_train_step(head, tx, cfg, text_train, text_test)
    assemble = make_bank_train_assemble(int(cfg.DATA.NUM_INPUT_FRAMES), int(cfg.DATA.TRAIN_CROP_SIZE))

    def train_step(state, batch, lr, rng, bank):
        batch = batch.replace(
            support_images=assemble(bank, batch.support_images),
            target_images=assemble(bank, batch.target_images),
        )
        return base(state, batch, lr, rng)

    return train_step


@dataclasses.dataclass
class BankTrainContext:
    train_step: object  # jitted (state, batch, lr, rng, bank) -> (state, metrics)
    bank: object  # device-resident jax.Array
    table: FrameBankTable


def make_bank_train_context(cfg, model, mesh, tx) -> BankTrainContext:
    """Build the train bank, pin it on device, and jit the bank train
    step once (state donated, bank not)."""
    import jax

    bank_np, table = build_train_frame_bank(cfg, "train")
    bank = _upload_bank(bank_np, mesh)
    train_step = jax.jit(
        make_bank_train_step(model.head, tx, cfg, model.text_train, model.text_test),
        donate_argnums=0,
    )
    return BankTrainContext(train_step=train_step, bank=bank, table=table)
