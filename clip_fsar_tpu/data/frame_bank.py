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

Train mode is out of scope: train transforms draw per-clip random crops
and flips from frames at the pre-crop stretch size, so pixels cannot be
pre-assembled without changing the augmentation distribution.
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
    from clip_fsar_tpu.data.loader import DATASET_REGISTRY

    if bool(cfg.DATA.get("EXACT_SAMPLING", False)):
        # same contract as decode.py::build_decoder: a protocol-exact
        # accuracy run must never feed grid-snapped frames
        raise ValueError(
            "TPU.EVAL_FRAME_BANK=true with DATA.EXACT_SAMPLING=true: the bank "
            "snaps sampled frame indices to its uniform grid, which the "
            "reference protocol's decode path never does (reference datasets/"
            "base/base_dataset.py:493-530). Disable the bank for accuracy "
            "runs, or drop EXACT_SAMPLING for throughput runs."
        )

    name = cfg.TRAIN.DATASET if split == "train" else cfg.TEST.get("DATASET", cfg.TRAIN.DATASET)
    dataset = DATASET_REGISTRY.get(name)(cfg, split)
    fs_split, decoder, path_map = dataset.fs_split, dataset.decoder, dataset.path_map

    bank_frames = int(cfg.TPU.get("EVAL_FRAME_BANK_FRAMES", 0) or cfg.DATA.get("FRAME_CACHE_FRAMES", 64))

    # Bit-identity with the pixel path holds ONLY when the pixel path
    # itself snaps to the same grid: DATA.DECODER=cached_opencv with the
    # bank grid equal to the decoder cache grid.  Any other combination
    # quantizes frame indices the pixel path would not — warn loudly so a
    # protocol/accuracy run can't drift silently (ADVICE r3, medium).
    from clip_fsar_tpu.data.decode import CachedVideoDecoder

    if not isinstance(decoder, CachedVideoDecoder):
        logger.warning(
            "EVAL_FRAME_BANK with DATA.DECODER=%s: the bank snaps sampled frame "
            "indices to a %d-frame uniform grid that this decoder's pixel path "
            "does NOT use — metrics are not bit-identical to the pixel path. "
            "Use DATA.DECODER cached_opencv with FRAME_CACHE_FRAMES == bank "
            "frames for the guaranteed-identical configuration.",
            cfg.DATA.get("DECODER", "?"), bank_frames,
        )
    elif bank_frames != decoder.max_frames:
        logger.warning(
            "EVAL_FRAME_BANK grid (%d frames) != decoder cache grid (%d frames): "
            "bank-mode metrics will differ from the pixel path's. Set "
            "TPU.EVAL_FRAME_BANK_FRAMES == DATA.FRAME_CACHE_FRAMES for bit-identity.",
            bank_frames, decoder.max_frames,
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
    crop = int(cfg.DATA.TEST_CROP_SIZE)
    bank = np.empty((v * bank_frames, crop, crop, 3), np.uint8)
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
        frames = fewshot_test_transform(frames, cfg)
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
        "frame bank built: %d videos x %d grid frames x %dpx = %.2f GB uint8",
        v, bank_frames, crop, bank.nbytes / 1e9,
    )
    table = FrameBankTable(
        orig_idx=orig_idx, nframes=nframes, length=length, fps=fps,
        row_of_path=row_of_path, frames_per_video=bank_frames,
    )
    return bank, table


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
        # same nearest-grid snap as decode.py::CachedVideoDecoder.read
        orig = t.orig_idx[row, : t.nframes[row]]
        req = np.asarray(indices, np.int64)
        pos = np.clip(np.searchsorted(orig, req), 0, len(orig) - 1)
        left = np.clip(pos - 1, 0, len(orig) - 1)
        take = np.where(np.abs(orig[left] - req) <= np.abs(orig[pos] - req), left, pos)
        return (row * t.frames_per_video + take).astype(np.int32)


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


def make_bank_eval_context(cfg, model, mesh, split: str) -> BankEvalContext:
    """Build the bank, pin it on device (replicated over the mesh), and
    jit the gathering eval step once.  NOT cached here — the build is
    multi-GB and the jit is slow, so callers that evaluate repeatedly
    (train/loop.py interleaved validation) build one context up front
    and pass it via ``bank_ctx=``."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    bank_np, table = build_eval_frame_bank(cfg, split)
    # the upload is multi-GB and the dev tunnel can wedge a device RPC —
    # log around it so a stall is attributable (the round-3 train5k run
    # went dark exactly here)
    import time

    t0 = time.perf_counter()
    from clip_fsar_tpu.parallel.mesh import retry_transient

    def _upload():
        b = jax.device_put(bank_np, NamedSharding(mesh, P()))
        b.block_until_ready()
        return b

    bank = retry_transient(_upload, "frame bank upload", base_delay=15.0)
    logger.info("frame bank on device: %.2f GB in %.1f s", bank_np.nbytes / 1e9, time.perf_counter() - t0)
    from clip_fsar_tpu.parallel.mesh import replicated

    eval_step = jax.jit(
        make_bank_eval_step(model.head, cfg, model.text_train, model.text_test),
        out_shardings=replicated(mesh),
    )
    return BankEvalContext(eval_step=eval_step, bank=bank, table=table)
