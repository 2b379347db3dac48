"""Temporal-action-localization losses (capability of reference
models/utils/localization_losses.py — BMN loss family).

Pure jnp; each returns (dict of named scalars, None) mirroring the
reference signature so the loss-composition layer (``calculate_loss``)
can sum registry-selected terms.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from clip_fsar_tpu.utils.registry import LOCALIZATION_LOSSES

_EPS = 1e-6


def _balanced_bce(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Positive/negative-balanced binary CE over sigmoid scores
    (reference Loss_Tem.bi_loss)."""
    pred = pred.reshape(-1)
    pmask = (gt.reshape(-1) > 0.5).astype(jnp.float32)
    num_entries = jnp.float32(pred.shape[0])
    num_positive = jnp.maximum(pmask.sum(), 1.0)
    ratio = num_entries / num_positive
    coef_0 = 0.5 * ratio / jnp.maximum(ratio - 1.0, _EPS)
    coef_1 = 0.5 * ratio
    loss_pos = coef_1 * jnp.log(pred + _EPS) * pmask
    loss_neg = coef_0 * jnp.log(1.0 - pred + _EPS) * (1.0 - pmask)
    return -jnp.mean(loss_pos + loss_neg)


@LOCALIZATION_LOSSES.register(name="Loss_Tem")
def loss_tem(cfg, preds, logits, labels, cur_epoch: int = 0, rng=None) -> Tuple[Dict, None]:
    sup = labels["supervised"]
    return {"tem": _balanced_bce(preds["start"], sup["start_map"]) + _balanced_bce(preds["end"], sup["end_map"])}, None


@LOCALIZATION_LOSSES.register(name="Loss_PemReg")
def loss_pem_reg(cfg, preds, logits, labels, cur_epoch: int = 0, rng=None) -> Tuple[Dict, None]:
    """Balanced MSE on the regression confidence channel
    (reference Loss_PemReg, incl. the random sub-sampling of medium/low
    IoU cells — rng required at train)."""
    pred = preds["confidence_map"][:, 0]
    sup = labels["supervised"]
    gt = sup["iou_map"] * sup["mask"]
    pos_t = float(cfg.LOCALIZATION.POS_REG_THRES)
    neg_t = float(cfg.LOCALIZATION.NEG_REG_THRES)

    u_h = (gt > pos_t).astype(jnp.float32)
    u_m = ((gt <= pos_t) & (gt > neg_t)).astype(jnp.float32)
    u_l = ((gt <= neg_t) & (gt > 0.0)).astype(jnp.float32) * sup["mask"]
    num_h, num_m, num_l = u_h.sum(), u_m.sum(), u_l.sum()
    r_m = num_h / jnp.maximum(num_m, 1.0)
    r_l = num_h / jnp.maximum(num_l, 1.0)
    rng = rng if rng is not None else jax.random.PRNGKey(cur_epoch)
    r1, r2 = jax.random.split(rng)
    u_sm = (u_m * jax.random.uniform(r1, gt.shape) > (1.0 - r_m)).astype(jnp.float32)
    u_sl = (u_l * jax.random.uniform(r2, gt.shape) > (1.0 - r_l)).astype(jnp.float32)
    weights = u_h + u_sm + u_sl
    mse = jnp.mean((pred * weights - gt * weights) ** 2)
    loss = 0.5 * mse * weights.size / jnp.maximum(weights.sum(), 1.0)
    return {"pem_reg": loss}, None


@LOCALIZATION_LOSSES.register(name="Loss_PemCls")
def loss_pem_cls(cfg, preds, logits, labels, cur_epoch: int = 0, rng=None) -> Tuple[Dict, None]:
    pred = preds["confidence_map"][:, 1]
    sup = labels["supervised"]
    gt = sup["iou_map"] * sup["mask"]
    pmask = (gt > float(cfg.LOCALIZATION.POS_CLS_THRES)).astype(jnp.float32)
    nmask = (gt <= float(cfg.LOCALIZATION.POS_CLS_THRES)).astype(jnp.float32) * sup["mask"]
    num_pos = jnp.maximum(pmask.sum(), 1.0)
    num_entries = num_pos + nmask.sum()
    ratio = num_entries / num_pos
    coef_0 = 0.5 * ratio / jnp.maximum(ratio - 1.0, _EPS)
    coef_1 = 0.5 * ratio
    loss = -(coef_1 * jnp.log(pred + _EPS) * pmask + coef_0 * jnp.log(1.0 - pred + _EPS) * nmask).sum() / num_entries
    return {"pem_cls": loss}, None


@LOCALIZATION_LOSSES.register(name="Loss_BmnActionCls")
def loss_bmn_action_cls(cfg, preds, logits, labels, cur_epoch: int = 0, rng=None) -> Tuple[Dict, None]:
    """Verb/noun CE over high-IoU proposals.  Static-shape version: the
    dynamic boolean select becomes a weighted mean."""
    import optax

    sup = labels["supervised"]
    gt_label = sup["label_map"].reshape(sup["label_map"].shape[0], 2, -1)  # [B, 2, D*T]
    gt_iou = (sup["iou_map"] * sup["mask"]).reshape(sup["iou_map"].shape[0], -1)  # [B, D*T]
    select = (gt_iou >= 0.75).astype(jnp.float32).reshape(-1)
    denom = jnp.maximum(select.sum(), 1.0)
    out = {}
    for i, tag in enumerate(("verb", "noun")):
        pred = preds[f"{tag}_map"].reshape(preds[f"{tag}_map"].shape[0], preds[f"{tag}_map"].shape[1], -1)
        pred = pred.transpose(0, 2, 1).reshape(-1, pred.shape[1])  # [B*D*T, C]
        lab = gt_label[:, i, :].reshape(-1).astype(jnp.int32)
        ce = optax.softmax_cross_entropy_with_integer_labels(pred, lab)
        out[f"{tag}_loss"] = (ce * select).sum() / denom
    return out, None
