"""Loss composition (capability of reference models/utils/losses.py
calculate_loss :51-118): supervised CE / soft-target CE (mixup, label
smoothing), '+'-composed SSL losses, '+'-composed localization losses.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import optax

from clip_fsar_tpu.data.mixup import smooth_one_hot
from clip_fsar_tpu.utils.registry import LOCALIZATION_LOSSES, SSL_LOSSES

# side effects: register localization + SSL losses
from clip_fsar_tpu.train import localization_losses as _ll  # noqa: F401
from clip_fsar_tpu.train import ssl_losses as _sl  # noqa: F401


def soft_target_cross_entropy(preds: jnp.ndarray, soft_targets: jnp.ndarray) -> jnp.ndarray:
    """(reference losses.py SoftTargetCrossEntropy :19-30)"""
    return optax.softmax_cross_entropy(preds, soft_targets).mean()


def calculate_loss(cfg, preds, logits, labels: Dict[str, Any], cur_epoch: float = 0.0, rng=None) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    loss_in_parts: Dict[str, jnp.ndarray] = {}
    if cfg.PRETRAIN.get("ENABLE", False):
        loss = 0.0
        parts = str(cfg.PRETRAIN.LOSS).split("+")
        weights = list(cfg.PRETRAIN.LOSS_WEIGHTS)
        for w, name in zip(weights, parts):
            cur, _ = SSL_LOSSES.get("Loss_" + name)(cfg, preds, logits, labels["self-supervised"], cur_epoch)
            for k, v in cur.items():
                loss_in_parts[k] = v
                if "debug" not in k:
                    loss = loss + w * v
        return loss, loss_in_parts
    if cfg.LOCALIZATION.get("ENABLE", False):
        loss = 0.0
        parts = str(cfg.LOCALIZATION.LOSS).split("+")
        weights = list(cfg.LOCALIZATION.LOSS_WEIGHTS)
        for w, name in zip(weights, parts):
            cur, _ = LOCALIZATION_LOSSES.get("Loss_" + name)(cfg, preds, logits, labels, cur_epoch, rng=rng)
            for k, v in cur.items():
                loss_in_parts[k] = v
                if "debug" not in k:
                    loss = loss + w * v
        return loss, loss_in_parts

    # plain supervised
    target = labels.get("supervised_mixup", labels["supervised"])
    if isinstance(target, dict):
        loss = 0.0
        for k, v in target.items():
            part = soft_target_cross_entropy(preds[k], v) if v.ndim > 1 else optax.softmax_cross_entropy_with_integer_labels(preds[k], v).mean()
            loss_in_parts["loss_" + k] = part
            loss = loss + part
        return loss, loss_in_parts
    if target.ndim > 1:  # soft targets
        loss = soft_target_cross_entropy(preds, target)
    else:
        smoothing = float(cfg.AUGMENTATION.get("LABEL_SMOOTHING", 0.0) or 0.0)
        if smoothing > 0:
            loss = soft_target_cross_entropy(preds, smooth_one_hot(target, preds.shape[-1], smoothing))
        else:
            loss = optax.softmax_cross_entropy_with_integer_labels(preds, target).mean()
    return loss, loss_in_parts
