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
        """Per-field graft: each state field is taken from the checkpoint
        only when BOTH sides have it and the tree structures agree;
        fields the current config disables (template None) stay disabled,
        and only the fields that actually mismatch are reinitialized and
        named in the warning.  A params mismatch is never skippable."""
        import dataclasses

        raw = self._mgr.restore(step)  # structure-free load (nested dicts)
        if not isinstance(raw, dict) or "params" not in raw:
            raise cause
        template = jax.device_get(state_template)

        def structures_match(t, r):
            if jax.tree_util.tree_structure(t) != jax.tree_util.tree_structure(r):
                return False
            return all(
                getattr(a, "shape", None) == getattr(b, "shape", None)
                for a, b in zip(jax.tree_util.tree_leaves(t), jax.tree_util.tree_leaves(r))
            )

        if not structures_match(template.params, raw["params"]):
            raise cause  # model itself differs — a real mismatch
        fields, kept = {}, []
        for f in dataclasses.fields(template):
            t, r = getattr(template, f.name), raw.get(f.name)
            if t is None or r is None:
                fields[f.name] = t  # field disabled/absent on one side: keep the config's choice
                if (t is None) != (r is None):
                    kept.append(f.name)
            elif structures_match(t, r):
                fields[f.name] = r
            else:
                fields[f.name] = t
                kept.append(f.name)
        logger.warning(
            "Checkpoint step %d does not match the current run configuration in "
            "field(s) %s — those were reinitialized from the template; all other "
            "fields restored (%s)",
            step, kept, type(cause).__name__,
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
