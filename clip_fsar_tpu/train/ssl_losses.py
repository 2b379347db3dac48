"""Self-supervised losses (capability of reference models/utils/losses.py
:120-196 — the MoSI family), registered in SSL_LOSSES for '+'-composition
via calculate_loss.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import optax

from clip_fsar_tpu.utils.registry import SSL_LOSSES


def _ce(preds: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return optax.softmax_cross_entropy_with_integer_labels(preds, labels.reshape(preds.shape[0])).mean()


@SSL_LOSSES.register(name="Loss_MoSIX")
def loss_mosi_x(cfg, preds, logits, labels, cur_epoch: float = 0) -> Tuple[Dict, None]:
    # the reference (losses.py:143) indexes labels["move_joint"] even for
    # the per-axis loss — which KeyErrors under LABEL_MODE=separate (the
    # mode these losses exist for) and only its shipped joint config works.
    # Prefer the correct per-axis labels when present; keep the reference's
    # joint fallback so its working configuration stays bit-identical.
    lab = labels.get("move_x", labels.get("move_joint"))
    return {"loss_move_x": _ce(preds["move_x"], lab)}, None


@SSL_LOSSES.register(name="Loss_MoSIY")
def loss_mosi_y(cfg, preds, logits, labels, cur_epoch: float = 0) -> Tuple[Dict, None]:
    lab = labels.get("move_y", labels.get("move_joint"))
    return {"loss_move_y": _ce(preds["move_y"], lab)}, None


@SSL_LOSSES.register(name="Loss_MoSIJoint")
def loss_mosi_joint(cfg, preds, logits, labels, cur_epoch: float = 0) -> Tuple[Dict, None]:
    return {"loss_joint": _ce(preds["move_joint"], labels["move_joint"])}, None
