"""CLI entry point (capability of reference runs/run.py:23-99).

    python runs/run.py --cfg configs/projects/CLIPFSAR/hmdb51/CLIPFSAR_HMDB51_1shot_v1.yaml [KEY.SUB value ...]

Dispatches on TASK_TYPE and queues train -> test runs.  No process
spawning: the JAX single-controller runtime replaces the per-GPU
torch.multiprocessing launcher (utils/launcher.py:9-36).
"""

from __future__ import annotations

import os
import sys
from typing import List, Optional

from clip_fsar_tpu.config.config import load_config, parse_args
from clip_fsar_tpu.utils.logging import get_logger, setup_logging

logger = get_logger(__name__)


def _honor_platform_env() -> None:
    """Re-apply JAX_PLATFORMS from the environment.

    Some images install a sitecustomize that registers a TPU PJRT plugin at
    interpreter startup and pins jax_platforms before user code runs; an
    explicit ``JAX_PLATFORMS=cpu python runs/run.py ...`` must still win.
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except Exception:  # backend already initialized — keep going
            pass


def _multi_scale_cfg(cfg):
    """Second auto-queued multi-view test (reference run.py:50-72): after
    the single-view test, re-test with the dataset-dependent ensemble
    views/crops."""
    ms = cfg.deep_copy()
    ms.LOG_MODEL_INFO = False
    ms.LOG_CONFIG_INFO = False
    ms.TEST.NUM_ENSEMBLE_VIEWS = 10
    ms.TEST.NUM_SPATIAL_CROPS = 1
    dataset = str(ms.TEST.get("DATASET", ms.TRAIN.get("DATASET", ""))).lower()
    if "kinetics" in dataset or "epickitchen" in dataset:
        ms.TEST.NUM_SPATIAL_CROPS = 3
    if "imagenet" in dataset and not ms.get("PRETRAIN", {}).get("ENABLE", False):
        ms.TEST.NUM_ENSEMBLE_VIEWS = 1
        ms.TEST.NUM_SPATIAL_CROPS = 3
    if "ssv2" in dataset:
        ms.TEST.NUM_ENSEMBLE_VIEWS = 1
        ms.TEST.NUM_SPATIAL_CROPS = 3
    ms.TEST.LOG_FILE = f"val_{ms.TEST.NUM_ENSEMBLE_VIEWS}clipsx{ms.TEST.NUM_SPATIAL_CROPS}crops.log"
    return ms


def _run_list(cfg) -> List[tuple]:
    """[(cfg, runner_name)] — each entry carries its own (deep-copied)
    config like the reference run list (run.py:42-85)."""
    task = cfg.get("TASK_TYPE", "classification")
    runs: List[tuple] = []
    if task == "few_shot_action":
        if cfg.TRAIN.get("ENABLE", False):
            runs.append((cfg.deep_copy(), "train_few_shot"))
        runs.append((cfg.deep_copy(), "test_few_shot"))
    elif task == "classification":
        if cfg.TRAIN.get("ENABLE", False):
            runs.append((cfg.deep_copy(), "train"))
        if cfg.TEST.get("ENABLE", False):
            runs.append((cfg.deep_copy(), "test"))
            if cfg.TEST.get("AUTOMATIC_MULTI_SCALE_TEST", False):
                runs.append((_multi_scale_cfg(cfg), "test"))
        if cfg.get("SUBMISSION", {}).get("ENABLE", False):
            sub = cfg.deep_copy()
            sub.LOG_MODEL_INFO = False
            sub.TEST.NUM_ENSEMBLE_VIEWS = 10
            sub.TEST.NUM_SPATIAL_CROPS = 3
            runs.append((sub, "submission_classification"))
    elif task == "localization":
        if cfg.TRAIN.get("ENABLE", False):
            runs.append((cfg.deep_copy(), "train_localization"))
        runs.append((cfg.deep_copy(), "test_epic_localization"))
    elif task == "submission":
        runs.append((cfg.deep_copy(), "submission_test"))
    elif task == "pretrain":
        runs.append((cfg.deep_copy(), "train"))
    else:
        raise ValueError(f"Unknown TASK_TYPE {task!r}")
    return runs


def main(argv: Optional[List[str]] = None) -> int:
    _honor_platform_env()
    args = parse_args(argv)
    cfg = load_config(args.cfg_file, args.opts)
    setup_logging(cfg.get("OUTPUT_DIR", None))
    logger.info("TASK_TYPE=%s OUTPUT_DIR=%s", cfg.get("TASK_TYPE"), cfg.get("OUTPUT_DIR"))
    if cfg.get("LOG_CONFIG_INFO", True) and cfg.get("OUTPUT_DIR", None):
        # persist the fully-resolved config (reference cfg.dump() to
        # OUTPUT_CFG_FILE, utils/config.py:261-263)
        cfg.dump(os.path.join(cfg.OUTPUT_DIR, str(cfg.get("OUTPUT_CFG_FILE", "configuration.log"))))

    for run_cfg, run_name in _run_list(cfg):
        cfg = run_cfg
        logger.info("=== run: %s ===", run_name)
        if run_name == "train_few_shot":
            from clip_fsar_tpu.train.loop import train_few_shot

            train_few_shot(cfg)
        elif run_name == "test_few_shot":
            from clip_fsar_tpu.train.loop import test_few_shot

            test_few_shot(cfg)
        elif run_name in ("train", "test"):
            from clip_fsar_tpu.train import classification

            getattr(classification, run_name)(cfg)
        elif run_name == "train_localization":
            from clip_fsar_tpu.train.localization import train_localization

            train_localization(cfg)
        elif run_name == "test_epic_localization":
            from clip_fsar_tpu.train.localization import test_epic_localization

            test_epic_localization(cfg)
        elif run_name == "submission_test":
            from clip_fsar_tpu.train.localization import submission_test

            submission_test(cfg)
        elif run_name == "submission_classification":
            from clip_fsar_tpu.train.classification import submission_test

            submission_test(cfg)
        else:
            raise NotImplementedError(f"runner {run_name!r} not yet implemented")
    return 0


if __name__ == "__main__":
    sys.exit(main())
