"""Registered few-shot dataset flavors.

One implementation serves all five benchmarks, as in the reference where
``TRAIN.DATASET`` is always Ssv2_few_shot and ``TRAIN.DATASET_FEW`` only
switches path parsing (ssv2_few_shot.py:42-55,134-135,369-372):

  * SSv2 style ids get ``<root>/<id>.mp4``;
  * the folder styles (HMDB/UCF/K100/Epic) get ``<root>/<relpath>``.
"""

from __future__ import annotations

import os

from clip_fsar_tpu.data.decode import build_decoder
from clip_fsar_tpu.data.episodes import EpisodeSampler
from clip_fsar_tpu.data.splits import load_split_file
from clip_fsar_tpu.utils.registry import DATASET_REGISTRY


class FewShotVideoDataset:
    """Factory for EpisodeSamplers over one split of a few-shot benchmark."""

    style_name = "Ssv2_few_shot"  # fallback when TRAIN.DATASET_FEW is absent

    def __init__(self, cfg, split: str):
        self.cfg = cfg
        self.split = split
        # train reads train_few_shot.txt; val/test read test_few_shot.txt
        # (reference _get_dataset_list_name, ssv2_few_shot.py:100-110)
        list_name = "{}_few_shot.txt".format("train" if split == "train" else "test")
        anno_dir = cfg.DATA.ANNO_DIR
        # DATASET_FEW switches path parsing regardless of which class was
        # registered under TRAIN.DATASET (reference ssv2_few_shot.py:132-135)
        style = cfg.TRAIN.get("DATASET_FEW", self.style_name)
        ssv2_style = style == "Ssv2_few_shot"
        self.fs_split = load_split_file(os.path.join(anno_dir, list_name), "train" if split == "train" else "test", ssv2_style)
        self.data_root = cfg.DATA.DATA_ROOT_DIR
        self.decoder = build_decoder(cfg.DATA.get("DECODER", "auto"), self.data_root, cfg_data=cfg.DATA)
        self._ssv2_style = ssv2_style

    def path_map(self, rel: str) -> str:
        if type(self.decoder).__name__ == "SyntheticDecoder":
            return rel  # synthetic decode keys off the relative path only
        if self._ssv2_style:
            return os.path.join(self.data_root, rel + ".mp4")
        return os.path.join(self.data_root, rel)

    def make_sampler(self, worker_id: int = 0) -> EpisodeSampler:
        # worker-INDEPENDENT seed: the loader reseeds per step index
        # ((seed, step) streams), so the episode sequence is reproducible
        # for any worker count; worker_id must not enter the seed.
        del worker_id
        seed = int(self.cfg.get("RANDOM_SEED", 0)) * 100003 + (0 if self.split == "train" else 1)
        mode = "train" if self.split == "train" else "test"
        return EpisodeSampler(self.cfg, self.fs_split, self.decoder, mode=mode, seed=seed, path_map=self.path_map)

    @property
    def num_classes(self) -> int:
        return len(self.fs_split.unique_classes())


@DATASET_REGISTRY.register(name="Ssv2_few_shot")
class Ssv2FewShot(FewShotVideoDataset):
    style_name = "Ssv2_few_shot"


@DATASET_REGISTRY.register(name="HMDB_few_shot")
class HMDBFewShot(FewShotVideoDataset):
    style_name = "HMDB_few_shot"


@DATASET_REGISTRY.register(name="UCF_few_shot")
class UCFFewShot(FewShotVideoDataset):
    style_name = "UCF_few_shot"


@DATASET_REGISTRY.register(name="Kinetics_few_shot")
class KineticsFewShot(FewShotVideoDataset):
    style_name = "Kinetics_few_shot"


@DATASET_REGISTRY.register(name="Epic_few_shot")
class EpicFewShot(FewShotVideoDataset):
    style_name = "Epic_few_shot"
