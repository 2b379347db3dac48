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
        try:
            restored = self._mgr.restore(step, args=ocp.args.StandardRestore(jax.device_get(state_template)))
        except ValueError as e:
            # Non-strict fallback (capability of the reference's
            # strict=False load with mismatch logging, checkpoint.py:
            # 329-331): an on-disk optimizer state from a DIFFERENT
            # optimizer configuration (changed accumulation, method, or
            # layout) cannot feed the current transformation anyway, so
            # restore the model fields and keep the template's freshly
            # initialized opt_state instead of failing the resume.
            restored = self._restore_model_fields(state_template, step, e)
        logger.info("Restored checkpoint from step %d", step)
        return restored

    def _restore_model_fields(self, state_template: Any, step: int, cause: Exception) -> Any:
        import dataclasses

        raw = self._mgr.restore(step)  # structure-free load (nested dicts)
        if not isinstance(raw, dict) or "params" not in raw:
            raise cause
        template = jax.device_get(state_template)
        t_struct = jax.tree_util.tree_structure(template.params)
        r_struct = jax.tree_util.tree_structure(raw["params"])
        if t_struct != r_struct:  # params themselves differ — a real mismatch
            raise cause
        fields = {}
        for f in dataclasses.fields(template):
            if f.name == "opt_state" or raw.get(f.name) is None:
                fields[f.name] = getattr(template, f.name)
            else:
                fields[f.name] = raw[f.name]
        logger.warning(
            "Checkpoint step %d has an optimizer-state layout that does not match "
            "the current optimizer configuration — restored params/model fields "
            "non-strictly and reinitialized the optimizer state (%s)",
            step, type(cause).__name__,
        )
        return dataclasses.replace(template, **fields)

    def close(self) -> None:
        self._mgr.close()


def auto_resume(cfg, checkpointer: Checkpointer, state_template: Any) -> Optional[Any]:
    """Reference auto-resume policy (checkpoint.py:532-577): resume from
    the latest checkpoint in OUTPUT_DIR when TRAIN.AUTO_RESUME."""
    if not bool(cfg.TRAIN.get("AUTO_RESUME", True)):
        return None
    return checkpointer.restore(state_template)
