"""Checkpoint save/restore with auto-resume (orbax).

Capability of reference utils/checkpoint.py: primary-process-only save,
step-stamped directories, auto-resume from the latest checkpoint
(:532-577), explicit test-time checkpoint search order (:452-529).  The
torch-specific machinery (DDP prefix stripping, 2D->3D inflation,
pos-embed surgery) is replaced by pytree-native orbax state and the
converters in models/clip/convert.py.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from clip_fsar_tpu.utils.logging import get_logger

logger = get_logger(__name__)


class Checkpointer:
    def __init__(self, output_dir: str, max_to_keep: int = 5):
        path = os.path.abspath(os.path.join(output_dir, "checkpoints"))
        os.makedirs(path, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            path, options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True)
        )

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(jax.device_get(state)))
        self._mgr.wait_until_finished()
        logger.info("Saved checkpoint at step %d", step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(jax.device_get(state_template)))
        logger.info("Restored checkpoint from step %d", step)
        return restored

    def close(self) -> None:
        self._mgr.close()


def auto_resume(cfg, checkpointer: Checkpointer, state_template: Any) -> Optional[Any]:
    """Reference auto-resume policy (checkpoint.py:532-577): resume from
    the latest checkpoint in OUTPUT_DIR when TRAIN.AUTO_RESUME."""
    if not bool(cfg.TRAIN.get("AUTO_RESUME", True)):
        return None
    return checkpointer.restore(state_template)
