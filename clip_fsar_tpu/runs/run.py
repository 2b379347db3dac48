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


def _run_list(cfg) -> List[str]:
    task = cfg.get("TASK_TYPE", "classification")
    runs: List[str] = []
    if task == "few_shot_action":
        if cfg.TRAIN.get("ENABLE", False):
            runs.append("train_few_shot")
        runs.append("test_few_shot")
    elif task == "classification":
        if cfg.TRAIN.get("ENABLE", False):
            runs.append("train")
        if cfg.TEST.get("ENABLE", False):
            runs.append("test")
    elif task == "localization":
        if cfg.TRAIN.get("ENABLE", False):
            runs.append("train_localization")
        runs.append("test_epic_localization")
    elif task == "submission":
        runs.append("submission_test")
    elif task == "pretrain":
        runs.append("train")
    else:
        raise ValueError(f"Unknown TASK_TYPE {task!r}")
    return runs


def main(argv: Optional[List[str]] = None) -> int:
    _honor_platform_env()
    args = parse_args(argv)
    cfg = load_config(args.cfg_file, args.opts)
    setup_logging(cfg.get("OUTPUT_DIR", None))
    logger.info("TASK_TYPE=%s OUTPUT_DIR=%s", cfg.get("TASK_TYPE"), cfg.get("OUTPUT_DIR"))

    for run_name in _run_list(cfg):
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
        else:
            raise NotImplementedError(f"runner {run_name!r} not yet implemented")
    return 0


if __name__ == "__main__":
    sys.exit(main())
