"""Episodic sampler + prefetching loader (host-side data service).

The reference assembles one episode per DataLoader worker __getitem__
(datasets/base/ssv2_few_shot.py:202-285): sample WAY classes, SHOT+QUERY
clips per class, decode, transform, shuffle support and query sets.  Here
the same protocol runs in a thread pool that keeps a queue of *batched*
episodes ([E, ...] numpy, uint8 frames) ready for jax.device_put — E
episodes per step is the MXU-utilization lever (SURVEY.md §7.3).

Error policy mirrors the reference: decode failures retry with a
re-sampled clip (ssv2_few_shot.py:222-265); after ``retries`` the episode
is rebuilt from scratch.
"""

from __future__ import annotations

import threading
from typing import Iterator, Optional

import numpy as np

from clip_fsar_tpu.data.splits import FewShotSplit
from clip_fsar_tpu.data.transforms import fewshot_test_transform, fewshot_train_transform
from clip_fsar_tpu.data.types import Episode
from clip_fsar_tpu.utils.logging import get_logger

logger = get_logger(__name__)


class EpisodeSampler:
    """Samples N-way K-shot episodes from a split."""

    def __init__(self, cfg, split: FewShotSplit, decoder, mode: str = "train", seed: int = 0, path_map=None):
        self.cfg = cfg
        self.split = split
        self.decoder = decoder
        self.mode = mode
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self.path_map = path_map or (lambda p: p)

        t = cfg.TRAIN
        self.way = int(t.WAY)
        if mode == "train":
            self.shot = int(t.SHOT)
            self.queries = int(t.QUERY_PER_CLASS)
        else:
            self.shot = int(t.get("SHOT_TEST", t.SHOT))
            self.queries = int(t.get("QUERY_PER_CLASS_TEST", 1))
            # NOTE: the reference always episodes TRAIN.WAY classes at test
            # too (ssv2_few_shot.py:207); a test-time way override would
            # also need the head's prototype layout to follow (heads are
            # built for TRAIN.WAY), so none is offered here.
        self.num_frames = int(cfg.DATA.NUM_INPUT_FRAMES)
        self.classes = np.asarray(split.unique_classes())

    # -- clip loading -------------------------------------------------------
    def _load_clip(self, class_id: int, idx: int, is_query: bool = False) -> np.ndarray:
        """Decode + frame-sample + spatial transform one clip -> uint8
        [T, crop, crop, 3].  Support and query clips get the reference's
        DIFFERENT train stacks (ssv2_few_shot.py:507-509): query clips
        always flip, support clips only under AUGMENTATION.RANDOM_FLIP."""
        from clip_fsar_tpu.data.sampling import sample_indices_for_cfg

        path, _ = self.split.get(class_id, idx)
        path = self.path_map(path)
        length = self.decoder.length(path)
        fps = self.decoder.fps(path) if hasattr(self.decoder, "fps") else float(self.cfg.DATA.get("FPS", 30))
        indices = sample_indices_for_cfg(self.cfg, self.mode, length, fps, self.rng)
        frames = self.decoder.read(path, indices)
        if self.mode == "train":
            return fewshot_train_transform(frames, self.cfg, self.rng, is_query=is_query)
        return fewshot_test_transform(frames, self.cfg)

    def reseed_for_step(self, step: int) -> None:
        """Deterministic per-step stream: the episode content of step k
        depends only on (seed, k), not on which worker produced it or in
        what order workers ran — fixed RANDOM_SEED gives a reproducible
        episode sequence (the reference's free-running DataLoader workers
        do not have this property)."""
        self.rng = np.random.default_rng((self.seed, step))

    def reseed_for_slot(self, step: int, slot: int) -> None:
        """Deterministic per-(step, slot) stream: episode `slot` of step k
        depends only on (seed, k, slot).  Beyond reseed_for_step's
        worker-order independence, this makes the batch SLICEABLE: a
        multi-host process can produce exactly its local slots
        [lo, hi) and get the same episodes the single-host run puts at
        those rows (parallel/mesh.py::local_episode_range)."""
        self.rng = np.random.default_rng((self.seed, step, slot))

    def sample_episode(self) -> Episode:
        retries = 5
        for attempt in range(retries):
            try:
                return self._sample_episode_once()
            except Exception:
                if attempt == retries - 1:
                    raise
                logger.warning("episode assembly failed (attempt %d), resampling", attempt + 1, exc_info=True)

    def _sample_episode_once(self) -> Episode:
        rng = self.rng
        batch_classes = rng.choice(self.classes, size=self.way, replace=False)

        sup_imgs, sup_lab, sup_real = [], [], []
        tgt_imgs, tgt_lab, tgt_real = [], [], []
        for local_label, class_id in enumerate(batch_classes):
            class_id = int(class_id)
            n_total = self.split.num_videos_for_class(class_id)
            need = self.shot + self.queries
            if n_total >= need:
                idxs = rng.choice(n_total, size=need, replace=False)
            else:  # tiny classes: sample with replacement rather than fail
                idxs = rng.choice(n_total, size=need, replace=True)
            for j, idx in enumerate(idxs):
                clip = self._load_clip(class_id, int(idx), is_query=j >= self.shot)
                if j < self.shot:
                    sup_imgs.append(clip)
                    sup_lab.append(local_label)
                    sup_real.append(class_id)
                else:
                    tgt_imgs.append(clip)
                    tgt_lab.append(local_label)
                    tgt_real.append(class_id)

        perm_s = rng.permutation(len(sup_imgs))
        perm_t = rng.permutation(len(tgt_imgs))
        return Episode(
            support_images=np.stack(sup_imgs)[perm_s],
            support_labels=np.asarray(sup_lab, np.int32)[perm_s],
            real_support_labels=np.asarray(sup_real, np.int32)[perm_s],
            target_images=np.stack(tgt_imgs)[perm_t],
            target_labels=np.asarray(tgt_lab, np.int32)[perm_t],
            real_target_labels=np.asarray(tgt_real, np.int32)[perm_t],
            batch_class_list=np.asarray(batch_classes, np.int32),
        )


def stack_episodes(episodes) -> Episode:
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *episodes)


class EpisodeLoader:
    """Background-threaded, seed-deterministic episode producer yielding
    [E, ...] batches *in step order*.

    Replaces torch DataLoader workers (datasets/base/builder.py:84-93):
    threads suffice because decode releases the GIL in cv2/PIL and the
    synthetic path is numpy-bound.

    Determinism design: step k's batch is generated from RNG stream
    (seed, k) — workers claim step indices from a shared counter, produce
    out of order, and a reorder buffer delivers in order.  Same seed =>
    identical episode stream for any worker count.
    """

    def __init__(
        self,
        sampler_factory,
        episodes_per_step: int,
        num_workers: int = 4,
        prefetch: int = 2,
        num_steps: Optional[int] = None,
        start_step: int = 0,
        episode_range: Optional[tuple] = None,
    ):
        self.episodes_per_step = episodes_per_step
        # multi-host: this process produces only slots [lo, hi) of each
        # step's global batch (identical content to the same rows of a
        # single-host run, thanks to per-(step, slot) seeding)
        self.episode_range = (0, episodes_per_step) if episode_range is None else (int(episode_range[0]), int(episode_range[1]))
        # steps are GLOBAL indices [start_step, start_step + num_steps):
        # a resumed run passes start_step so the (seed, step) episode
        # stream continues where it left off instead of replaying from 0
        self.start_step = int(start_step)
        self.num_steps = None if num_steps is None else int(num_steps) + self.start_step
        self._stop = threading.Event()
        self._error: Optional[BaseException] = None
        self._samplers = [sampler_factory(i) for i in range(max(num_workers, 1))]
        # reorder buffer: step index -> batch; bounded by window
        self._window = max(prefetch, 1) + len(self._samplers)
        self._buffer: dict = {}
        self._cond = threading.Condition()
        self._next_claim = self.start_step  # next step index a worker may claim
        self._next_emit = self.start_step  # next step index __iter__ will yield
        self._threads = []
        for s in self._samplers:
            th = threading.Thread(target=self._worker, args=(s,), daemon=True)
            th.start()
            self._threads.append(th)

    def _empty_batch(self, sampler: EpisodeSampler) -> Episode:
        """Zero-row batch with the step batch's trailing shapes/dtypes,
        derived from one template episode (computed once)."""
        if getattr(self, "_empty_template", None) is None:
            import jax

            sampler.reseed_for_slot(self.start_step, 0)
            template = stack_episodes([sampler.sample_episode()])
            self._empty_template = jax.tree_util.tree_map(lambda x: x[:0], template)
        return self._empty_template

    def _claim(self) -> Optional[int]:
        with self._cond:
            while not self._stop.is_set():
                if self.num_steps is not None and self._next_claim >= self.num_steps:
                    return None
                # backpressure: don't run further than the reorder window
                if self._next_claim < self._next_emit + self._window:
                    step = self._next_claim
                    self._next_claim += 1
                    return step
                self._cond.wait(timeout=0.2)
            return None

    def _worker(self, sampler: EpisodeSampler) -> None:
        try:
            while not self._stop.is_set():
                step = self._claim()
                if step is None:
                    return
                eps = []
                for slot in range(*self.episode_range):
                    sampler.reseed_for_slot(step, slot)
                    eps.append(sampler.sample_episode())
                # a model-only host owns no data-axis rows (episode_range
                # (0,0), parallel/mesh.py::local_episode_range) — it still
                # must emit a structurally-correct [0, ...] batch for
                # make_array_from_process_local_data
                batch = stack_episodes(eps) if eps else self._empty_batch(sampler)
                with self._cond:
                    self._buffer[step] = batch
                    self._cond.notify_all()
        except BaseException as e:  # noqa: BLE001 — re-raised in __iter__
            # a dying worker would otherwise leave its claimed step
            # unfilled and hang __iter__ forever with no error surfaced
            with self._cond:
                self._error = e
                self._stop.set()
                self._cond.notify_all()

    def __iter__(self) -> Iterator[Episode]:
        while self.num_steps is None or self._next_emit < self.num_steps:
            with self._cond:
                while self._next_emit not in self._buffer and not self._stop.is_set():
                    self._cond.wait(timeout=0.2)
                if self._error is not None:
                    raise RuntimeError("episode worker failed") from self._error
                if self._stop.is_set() and self._next_emit not in self._buffer:
                    return
                batch = self._buffer.pop(self._next_emit)
                self._next_emit += 1
                self._cond.notify_all()
            yield batch

    def close(self) -> None:
        self._stop.set()
        with self._cond:
            self._cond.notify_all()
        for th in self._threads:
            th.join(timeout=2.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
