"""Model statistics + memory reporting (capability of reference
utils/misc.py:40-165).

The reference counts FLOPs/activations with fvcore tracing on the torch
module; here the numbers come from XLA itself: ``jax.jit(...).lower()
.compile().cost_analysis()`` reports the compiled HLO's flops exactly
(including fusion effects), and ``memory_analysis()`` gives the compiled
peak-memory breakdown — strictly more accurate than op-table tracing.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import numpy as np

from clip_fsar_tpu.utils.logging import get_logger, log_json_stats

logger = get_logger(__name__)


def params_count(params) -> int:
    """Total parameter count of a pytree (reference misc.py:40-50)."""
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params) if hasattr(x, "shape")))


def device_mem_usage() -> Optional[Dict[str, float]]:
    """Per-device memory stats in MB (reference gpu_mem_usage, misc.py:52-66).
    Returns None when the backend doesn't expose memory_stats (CPU)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    mb = 1024.0 * 1024.0
    return {
        "bytes_in_use_mb": round(stats.get("bytes_in_use", 0) / mb, 1),
        "peak_bytes_in_use_mb": round(stats.get("peak_bytes_in_use", 0) / mb, 1),
        "bytes_limit_mb": round(stats.get("bytes_limit", 0) / mb, 1),
    }


def compiled_stats(fn: Callable, *args, static_argnums=()) -> Dict[str, float]:
    """FLOPs + bytes + peak memory of the jitted ``fn(*args)``
    (replaces fvcore flop/activation tracing, reference misc.py:103-142)."""
    compiled = jax.jit(fn, static_argnums=static_argnums).lower(*args).compile()
    out: Dict[str, float] = {}
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0] if cost else {}
        if cost:
            out["gflops"] = round(float(cost.get("flops", 0.0)) / 1e9, 3)
            out["bytes_accessed_gb"] = round(float(cost.get("bytes accessed", 0.0)) / 1e9, 3)
    except Exception:
        pass
    try:
        mem = compiled.memory_analysis()
        if mem is not None:
            mb = 1024.0 * 1024.0
            out["temp_mb"] = round(mem.temp_size_in_bytes / mb, 1)
            out["argument_mb"] = round(mem.argument_size_in_bytes / mb, 1)
            out["output_mb"] = round(mem.output_size_in_bytes / mb, 1)
    except Exception:
        pass
    return out


def log_model_info(params, forward_fn: Optional[Callable] = None, *args, label: str = "model") -> Dict[str, Any]:
    """Log params / FLOPs / memory for a model (reference log_model_info,
    misc.py:145-165).  ``forward_fn(*args)`` is the jittable forward to
    cost-analyze; skipped when not provided."""
    info: Dict[str, Any] = {"_type": "model_info", "label": label, "params": params_count(params)}
    if forward_fn is not None:
        try:
            info.update(compiled_stats(forward_fn, *args))
        except Exception as e:  # never block training on analysis
            logger.info("model stats unavailable: %s", e)
    mem = device_mem_usage()
    if mem:
        info.update(mem)
    log_json_stats(info, logger)
    return info


def is_eval_epoch(cfg, cur_epoch: int) -> bool:
    """Exact reference semantics (utils/misc.py:168-180): evaluate when
    (cur_epoch+1) is a multiple of TRAIN.EVAL_PERIOD, or always within the
    last 10 epochs (non-pretrain runs)."""
    period = int(cfg.TRAIN.get("EVAL_PERIOD", 0) or 0)
    if period == 0:
        return False
    max_epoch = int(cfg.SOLVER.MAX_EPOCH)
    pretrain = bool(cfg.get("PRETRAIN", {}).get("ENABLE", False)) if "PRETRAIN" in cfg else False
    if cur_epoch + 1 >= max_epoch - 10 and not pretrain:
        return True
    return (cur_epoch + 1) % period == 0


def is_checkpoint_epoch(cfg, cur_epoch: int) -> bool:
    """Exact reference semantics (utils/checkpoint.py:89-99): checkpoint on
    CHECKPOINT_PERIOD multiples, the final epoch, or the last 10 epochs
    (non-pretrain runs)."""
    max_epoch = int(cfg.SOLVER.MAX_EPOCH)
    pretrain = bool(cfg.get("PRETRAIN", {}).get("ENABLE", False)) if "PRETRAIN" in cfg else False
    if cur_epoch + 1 >= max_epoch - 10 and not pretrain:
        return True
    period = int(cfg.TRAIN.get("CHECKPOINT_PERIOD", 10) or 10)
    return (cur_epoch + 1) % period == 0 or cur_epoch + 1 == max_epoch
