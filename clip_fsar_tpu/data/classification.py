"""Classification/SSL data service (capability of reference
datasets/base/{base_dataset,hmdb51,ucf101,kinetics400,kinetics700,ssv2,
imagenet,epickitchen100}.py + builder.py).

Samples are (video uint8 [T, crop, crop, 3], label, clip_id); at test time
each video is replicated into NUM_ENSEMBLE_VIEWS x NUM_SPATIAL_CROPS clips
(base_dataset.py:59-61,185-202) and the TestMeter re-assembles per-video
scores by clip_id // num_clips.
"""

from __future__ import annotations

import json
import os
import queue
import threading
from typing import Iterator, List, Optional, Tuple

import numpy as np

from clip_fsar_tpu.data.decode import build_decoder
from clip_fsar_tpu.data.sampling import sample_indices_for_cfg
from clip_fsar_tpu.data.transforms import (
    controlled_crop,
    horizontal_flip,
    random_crop,
    resize_short_side,
)
from clip_fsar_tpu.utils.logging import get_logger
from clip_fsar_tpu.utils.registry import DATASET_REGISTRY

logger = get_logger(__name__)


class ClassificationDataset:
    """Video list + per-sample decode/transform."""

    list_format = "space"  # "space": "<path> <label>" lines; "ssv2_json"

    def __init__(self, cfg, split: str):
        self.cfg = cfg
        self.split = split
        self.data_root = cfg.DATA.DATA_ROOT_DIR
        self.decoder = build_decoder(cfg.DATA.get("DECODER", "auto"), self.data_root, cfg_data=cfg.DATA)
        if split in ("test",):
            self._num_clips = int(cfg.TEST.get("NUM_ENSEMBLE_VIEWS", 1)) * int(cfg.TEST.get("NUM_SPATIAL_CROPS", 1))
        else:
            self._num_clips = 1
        # SSL pretraining (reference base_dataset applies the registered
        # sslgenerator in __getitem__ when PRETRAIN.ENABLE): the generator
        # consumes raw decoded frames and emits (clips [S,F,c,c,3], labels
        # dict) — the worker-side numpy path, device sees fixed shapes
        self.ssl_generator = None
        if "PRETRAIN" in cfg and cfg.PRETRAIN.get("ENABLE", False):
            from clip_fsar_tpu.utils.registry import SSL_GENERATOR_REGISTRY

            gen_name = str(cfg.PRETRAIN.get("GENERATOR", "MoSIGenerator"))
            self.ssl_generator = SSL_GENERATOR_REGISTRY.get(gen_name)(cfg, split)
        self._load_list()

    # -- list handling ------------------------------------------------------
    def _list_name(self) -> str:
        raise NotImplementedError

    def _load_list(self) -> None:
        path = os.path.join(self.cfg.DATA.ANNO_DIR, self._list_name())
        self.samples: List[Tuple[str, int]] = []
        if self.list_format == "ssv2_json":
            with open(path) as f:
                entries = json.load(f)
            for e in entries:
                self.samples.append((str(e["id"]) + ".mp4", int(e["label_idx"])))
        else:
            dual = isinstance(self.cfg.VIDEO.HEAD.get("NUM_CLASSES", 0), (list, tuple))
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    if dual:
                        # EPIC verb+noun lines: "<path> <verb> <noun>"
                        # (reference epickitchen100.py:56-84 reads csv columns)
                        rel, verb, noun = line.rsplit(" ", 2)
                        self.samples.append((rel, (int(verb), int(noun))))
                    else:
                        rel, label = line.rsplit(" ", 1)
                        self.samples.append((rel, int(label)))
        if not self.samples:
            raise ValueError(f"Empty dataset list {path}")
        logger.info("%s[%s]: %d videos x %d clips", type(self).__name__, self.split, len(self.samples), self._num_clips)

    def __len__(self) -> int:
        return len(self.samples) * self._num_clips

    # -- item loading --------------------------------------------------------
    def get_item(self, index: int, rng: np.random.Generator):
        vid_index = index // self._num_clips
        clip_in_video = index % self._num_clips
        rel, label = self.samples[vid_index]
        path = rel if type(self.decoder).__name__ == "SyntheticDecoder" else os.path.join(self.data_root, rel)

        spatial_crops = int(self.cfg.TEST.get("NUM_SPATIAL_CROPS", 1)) if self.split == "test" else 1
        temporal_clips = self._num_clips // spatial_crops
        temporal_idx = clip_in_video // spatial_crops if self.split == "test" else -1
        spatial_idx = clip_in_video % spatial_crops if self.split == "test" else -1

        length = self.decoder.length(path)
        fps = self.decoder.fps(path) if hasattr(self.decoder, "fps") else float(self.cfg.DATA.get("FPS", 30))
        indices = sample_indices_for_cfg(
            self.cfg, self.split, length, fps, rng,
            clip_idx=temporal_idx if self.split == "test" else -1,
            num_clips=temporal_clips,
        )
        frames = self.decoder.read(path, indices)
        if self.ssl_generator is not None:
            # pseudo-motion clips replace the clip; labels come from the
            # generator (dict of per-axis targets), not the class list
            clips, ssl_labels = self.ssl_generator(frames, rng)
            return clips, ssl_labels, index
        frames = self._transform(frames, rng, spatial_idx, spatial_crops)
        return frames, label, index

    def _transform(self, frames: np.ndarray, rng, spatial_idx: int, spatial_crops: int) -> np.ndarray:
        from clip_fsar_tpu.data.transforms import test_transform, train_transform

        if self.split == "train":
            return train_transform(frames, self.cfg, rng)
        return test_transform(frames, self.cfg, spatial_idx)


def _register(name: str, list_fmt: str, template: str):
    class _DS(ClassificationDataset):
        list_format = list_fmt

        def _list_name(self) -> str:
            return template.format("train" if "train" in self.split else ("validation" if list_fmt == "ssv2_json" else "test"))

    _DS.__name__ = name
    DATASET_REGISTRY.register(_DS, name=name)
    return _DS


HMDB51 = _register("HMDB51", "space", "hmdb51_{}_list.txt")
UCF101 = _register("UCF101", "space", "ucf101_{}_list.txt")
Kinetics400 = _register("Kinetics400", "space", "kinetics400_{}_list.txt")
Kinetics700 = _register("Kinetics700", "space", "kinetics700_{}_list.txt")
Imagenet = _register("Imagenet", "space", "imagenet_{}_list.txt")
Epickitchen100 = _register("Epickitchen100", "space", "epickitchen100_{}_list.txt")
Ssv2 = _register("Ssv2", "ssv2_json", "something-something-v2-{}-with-label.json")


class ClassificationLoader:
    """Thread-pooled epoch loader yielding (videos [B,T,H,W,3] uint8,
    labels [B], clip_ids [B]) with a fixed batch size (last partial batch
    dropped at train, padded at test)."""

    def __init__(self, dataset: ClassificationDataset, batch_size: int, shuffle: bool, num_workers: int = 4,
                 prefetch: int = 2, seed: int = 0, drop_last: bool = True, folds: int = 1):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.prefetch = prefetch
        self.seed = seed
        # MultiFold training (reference utils/sampler.py:12-94): one loader
        # epoch covers the dataset ``folds`` times (independent shuffles),
        # so the epoch counter can advance by NUM_FOLDS per loader pass
        self.folds = max(int(folds), 1)
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __len__(self) -> int:
        n = len(self.ds) * self.folds
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator:
        rng = np.random.default_rng(self.seed * 100003 + self._epoch)
        if self.shuffle:
            order = np.concatenate([rng.permutation(len(self.ds)) for _ in range(self.folds)])
        else:
            order = np.tile(np.arange(len(self.ds)), self.folds)
        batches = [order[i : i + self.batch_size] for i in range(0, len(order), self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches = batches[:-1]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker(worker_id: int):
            wrng = np.random.default_rng(self.seed * 7919 + self._epoch * 13 + worker_id)
            for bi in range(worker_id, len(batches), self.num_workers):
                if stop.is_set():
                    return
                idxs = batches[bi]
                vids, labels, clip_ids = [], [], []
                for i in idxs:
                    v, l, c = self.ds.get_item(int(i), wrng)
                    vids.append(v)
                    labels.append(l)
                    clip_ids.append(c)
                if len(vids) < self.batch_size:  # pad the tail batch
                    pad = self.batch_size - len(vids)
                    vids += [vids[-1]] * pad
                    labels += [labels[-1]] * pad
                    clip_ids += [-1] * pad
                if isinstance(labels[0], dict):
                    # SSL generator labels: dict of per-axis targets [S]
                    batched = {k: np.stack([l[k] for l in labels]).astype(np.int32) for k in labels[0]}
                else:
                    batched = np.asarray(labels, np.int32)
                q.put((bi, np.stack(vids), batched, np.asarray(clip_ids, np.int64)))
            q.put((None, None, None, None))

        threads = [threading.Thread(target=worker, args=(w,), daemon=True) for w in range(self.num_workers)]
        for t in threads:
            t.start()
        # reorder buffer: emit batches in index order — deterministic
        # iteration, and all multi-view clips of one video stay contiguous
        # (the property reference MultiSegValDistributedSampler provides,
        # utils/val_dist_sampler.py:15-103)
        finished = 0
        pending = {}
        next_bi = 0
        try:
            while finished < self.num_workers or pending:
                if next_bi in pending:
                    yield pending.pop(next_bi)
                    next_bi += 1
                    continue
                if finished == self.num_workers:
                    break
                bi, v, l, c = q.get()
                if bi is None:
                    finished += 1
                    continue
                pending[bi] = (v, l, c)
        finally:
            stop.set()


def build_classification_loader(cfg, split: str) -> ClassificationLoader:
    name = cfg.TRAIN.DATASET if split == "train" else cfg.TEST.get("DATASET", cfg.TRAIN.DATASET)
    ds = DATASET_REGISTRY.get(name)(cfg, split)
    bs = int(cfg.TRAIN.BATCH_SIZE if split == "train" else cfg.TEST.get("BATCH_SIZE", cfg.TRAIN.BATCH_SIZE))
    return ClassificationLoader(
        ds, bs, shuffle=(split == "train"), num_workers=int(cfg.DATA_LOADER.get("NUM_WORKERS", 4)),
        prefetch=int(cfg.DATA_LOADER.get("PREFETCH", 2)), seed=int(cfg.get("RANDOM_SEED", 0)),
        drop_last=(split == "train"),
        folds=int(cfg.TRAIN.get("NUM_FOLDS", 1)) if split == "train" else 1,
    )
