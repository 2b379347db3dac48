"""Loader builder: config -> episodic (or classification) data service.

Capability of reference datasets/base/builder.py:47-94, redesigned: no
torch DataLoader — a thread-pooled EpisodeLoader emits [E, ...] uint8
numpy batches ready for jax.device_put with a data-axis sharding.
"""

from __future__ import annotations

from typing import Optional

from clip_fsar_tpu.data.episodes import EpisodeLoader
from clip_fsar_tpu.utils.registry import DATASET_REGISTRY

# side-effect: register the dataset classes
from clip_fsar_tpu.data import datasets as _datasets  # noqa: F401


def build_few_shot_loader(
    cfg,
    split: str,
    num_steps: Optional[int] = None,
    episodes_per_step: Optional[int] = None,
    start_step: int = 0,
    episode_range: Optional[tuple] = None,
    sampler_wrap=None,
) -> EpisodeLoader:
    """episode_range: multi-host local slice [lo, hi) of each step's global
    batch (parallel/mesh.py::local_episode_range); None = the full batch.
    sampler_wrap: optional EpisodeSampler -> EpisodeSampler transform (the
    frame-bank index mode, data/frame_bank.py)."""
    name = cfg.TRAIN.DATASET if split == "train" else cfg.TEST.get("DATASET", cfg.TRAIN.DATASET)
    dataset = DATASET_REGISTRY.get(name)(cfg, split)
    if episodes_per_step is None:
        episodes_per_step = int(cfg.TPU.get("EPISODES_PER_STEP", 1)) if split == "train" else 1
    factory = dataset.make_sampler if sampler_wrap is None else (lambda i: sampler_wrap(dataset.make_sampler(i)))
    return EpisodeLoader(
        factory,
        episodes_per_step=episodes_per_step,
        num_workers=int(cfg.DATA_LOADER.get("NUM_WORKERS", 4)),
        prefetch=int(cfg.DATA_LOADER.get("PREFETCH", 2)),
        num_steps=num_steps,
        start_step=start_step,
        episode_range=episode_range,
    )


def build_loader(cfg, split: str, **kwargs):
    if cfg.get("TASK_TYPE", "classification") == "few_shot_action":
        return build_few_shot_loader(cfg, split, **kwargs)
    raise NotImplementedError(f"loader for TASK_TYPE={cfg.get('TASK_TYPE')!r} lands with the classification task")


# ---------------------------------------------------------------------------
# collate functions (reference datasets/utils/collate_functions.py:14-21)
# ---------------------------------------------------------------------------

from clip_fsar_tpu.utils.registry import COLLATE_FN_REGISTRY  # noqa: E402


@COLLATE_FN_REGISTRY.register(name="ZeroShotCollate")
class ZeroShotCollate:
    """Deduplicate the per-item text-embedding table to one copy per batch
    (reference collate_functions.py:14-21: every item of a zero-shot batch
    carries the identical class-text embedding matrix; the collate keeps
    batch[0]'s).  In this framework text banks are model-level constants,
    so this mainly serves dict-style batches from custom datasets."""

    def __init__(self, cfg=None):
        self.cfg = cfg

    def __call__(self, batch: dict) -> dict:
        import numpy as np

        if isinstance(batch, (list, tuple)):
            # stack list-of-dicts into a dict-of-arrays (default_collate)
            keys = batch[0].keys()
            batch = {k: np.stack([np.asarray(item[k]) for item in batch]) for k in keys}
        if "text_embedding" in batch:
            batch = dict(batch)
            batch["text_embedding"] = np.asarray(batch["text_embedding"])[:1]
        return batch
