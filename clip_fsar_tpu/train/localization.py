"""Localization task: BMN training + sliding-window EPIC-style evaluation
(capability of reference runs/train.py with LOCALIZATION losses and
runs/test_epic_localization.py) and the submission runner
(runs/submission_test.py).
"""

from __future__ import annotations

import collections
import json
import os
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from clip_fsar_tpu.data.tal_features import TalFeatureDataset
from clip_fsar_tpu.models.heads.bmn import BaseBMN
from clip_fsar_tpu.models.video.meta import SimpleLocalizationConv
from clip_fsar_tpu.train.checkpoint import Checkpointer, auto_resume
from clip_fsar_tpu.train.losses import calculate_loss
from clip_fsar_tpu.train.optimizer import apply_lr, build_optimizer, get_lr_at_epoch
from clip_fsar_tpu.train.state import TrainState
from clip_fsar_tpu.utils.logging import get_logger, log_json_stats, setup_logging
from clip_fsar_tpu.utils.tal import detection_map, parse_bmn_proposals, soft_nms

logger = get_logger(__name__)


class BMNModel:
    """SimpleLocalizationConv backbone + BaseBMN head over [B, T, C]."""

    def __init__(self, cfg):
        import flax.linen as nn

        class _Net(nn.Module):
            cfg_: object

            @nn.compact
            def __call__(self, x, train: bool = True):
                feats = SimpleLocalizationConv(cfg=self.cfg_, name="backbone")(x)
                return BaseBMN(cfg=self.cfg_, name="head")(feats, train=train)

        self.module = _Net(cfg_=cfg)
        self.cfg = cfg

    def init(self, rng):
        t, c = int(self.cfg.DATA.TEMPORAL_SCALE), int(self.cfg.DATA.NUM_INPUT_CHANNELS)
        return jax.jit(lambda r: self.module.init(r, jnp.zeros((1, t, c)), train=False))(rng)


def _batches(ds: TalFeatureDataset, batch_size: int, shuffle: bool, seed: int):
    order = np.random.default_rng(seed).permutation(len(ds)) if shuffle else np.arange(len(ds))
    for i in range(0, len(order), batch_size):
        idxs = order[i : i + batch_size]
        feats, maps, metas = [], collections.defaultdict(list), []
        for j in idxs:
            f, m, meta = ds.get_item(int(j))
            feats.append(f)
            for k, v in m.items():
                maps[k].append(v)
            metas.append(meta)
        yield np.stack(feats), {k: np.stack(v) for k, v in maps.items()}, metas


def train_localization(cfg) -> Dict[str, float]:
    setup_logging(cfg.get("OUTPUT_DIR", None))
    cfg.LOCALIZATION.ENABLE = True
    model = BMNModel(cfg)
    variables = jax.device_get(model.init(jax.random.PRNGKey(int(cfg.get("RANDOM_SEED", 0)))))
    tx = build_optimizer(cfg, variables["params"])
    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"], opt_state=tx.init(variables["params"]))

    def loss_fn(params, feats, maps, rng):
        preds, _ = model.module.apply({"params": params}, feats, train=True)
        loss, parts = calculate_loss(cfg, preds, None, {"supervised": maps}, rng=rng)
        return loss, parts

    @jax.jit
    def step(state, feats, maps, lr, rng):
        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, feats, maps, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, apply_lr(updates, lr))
        return state.replace(step=state.step + 1, params=params, opt_state=opt_state), loss, parts

    ds = TalFeatureDataset(cfg, "train")
    bs = int(cfg.TRAIN.BATCH_SIZE)
    rng = jax.random.PRNGKey(1)
    max_epoch = int(cfg.SOLVER.MAX_EPOCH)
    for epoch in range(max_epoch):
        n = max(-(-len(ds) // bs), 1)
        for it, (feats, maps, _) in enumerate(_batches(ds, bs, True, epoch)):
            lr = get_lr_at_epoch(cfg, epoch + it / n)
            rng, srng = jax.random.split(rng)
            state, loss, parts = step(state, jnp.asarray(feats), jax.tree_util.tree_map(jnp.asarray, maps), jnp.float32(lr), srng)
        log_json_stats({"_type": "tal_train_epoch", "epoch": epoch + 1, "loss": round(float(loss), 5),
                        **{k: round(float(v), 4) for k, v in jax.device_get(parts).items()}}, logger)

    ckpt = Checkpointer(cfg.OUTPUT_DIR)
    ckpt.save(max_epoch, jax.device_get(state))
    ckpt.close()
    return {"final_loss": float(loss)}


def _window_proposals(cfg, preds, metas, ds) -> Dict[str, List]:
    """Parse per-window proposals and place them on the global timeline
    (reference fuse_epic_sliding_windows + parse_epic_bmn_proposals)."""
    per_video: Dict[str, List] = collections.defaultdict(list)
    tscale = int(cfg.DATA.TEMPORAL_SCALE)
    start = np.asarray(preds["start"])
    end = np.asarray(preds["end"])
    conf = np.asarray(preds["confidence_map"])
    has_cls = not isinstance(preds.get("verb_map"), dict)
    for bi, (video, w_start) in enumerate(metas):
        props = parse_bmn_proposals(start[bi], end[bi], conf[bi])
        duration = float(ds.annotations[video]["duration"])
        for p in props:
            t0 = (w_start + p["xmin"] * tscale)
            t1 = (w_start + p["xmax"] * tscale)
            label = 0
            if has_cls:
                d_idx = min(int((p["xmax"] - p["xmin"]) * tscale) - 1, conf[bi].shape[1] - 1)
                s_idx = min(int(p["xmin"] * tscale), tscale - 1)
                vm = np.asarray(preds["verb_map"])[bi, :, max(d_idx, 0), s_idx]
                label = int(vm.argmax())
            if t1 <= duration + 1e-6:
                per_video[video].append({"xmin": t0, "xmax": t1, "score": p["score"], "label": label})
    return per_video


def test_epic_localization(cfg) -> Dict[str, float]:
    setup_logging(cfg.get("OUTPUT_DIR", None))
    model = BMNModel(cfg)
    variables = jax.device_get(model.init(jax.random.PRNGKey(int(cfg.get("RANDOM_SEED", 0)))))
    tx = build_optimizer(cfg, variables["params"])
    template = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"], opt_state=tx.init(variables["params"]))
    ckpt = Checkpointer(cfg.OUTPUT_DIR)
    restored = ckpt.restore(template) if ckpt.latest_step() is not None else None
    if restored is not None:
        variables = {"params": restored.params}
        logger.info("testing with checkpoint at step %d", int(restored.step))
    ckpt.close()

    apply_fn = jax.jit(lambda v, x: model.module.apply(v, x, train=False)[0])
    ds = TalFeatureDataset(cfg, cfg.TEST.get("TEST_SET", "val"))
    proposals: Dict[str, List] = collections.defaultdict(list)
    for feats, _maps, metas in _batches(ds, int(cfg.TEST.BATCH_SIZE), False, 0):
        preds = jax.device_get(apply_fn(variables, jnp.asarray(feats)))
        for video, plist in _window_proposals(cfg, preds, metas, ds).items():
            proposals[video].extend(plist)

    loc = cfg.LOCALIZATION
    nms_alpha = float(loc.get("SOFT_NMS_ALPHA", 0.4))
    t1, t2 = float(loc.get("SOFT_NMS_LOW_THRES", 0.5)), float(loc.get("SOFT_NMS_HIGH_THRES", 0.9))
    prop_num = int(loc.get("PROP_NUM", 100))

    predictions = {}
    for video, plist in proposals.items():
        # soft-NMS runs on DURATION-NORMALIZED segments (the reference
        # normalizes before soft_nms and scales by duration only
        # afterwards, tal_tools.py:346-357): its width-dependent threshold
        # t1+(t2-t1)*width assumes widths in [0,1] — frame-unit widths
        # would push the threshold past any IoU and disable the decay
        duration = max(float(ds.annotations[video]["duration"]), 1e-6)
        norm = [dict(p, xmin=p["xmin"] / duration, xmax=p["xmax"] / duration) for p in plist]
        kept = soft_nms(norm, nms_alpha, t1, t2, prop_num)
        predictions[video] = [
            (p["xmin"] * duration, p["xmax"] * duration, p["score"], p.get("label", 0)) for p in kept
        ]

    ground_truth = {
        v: [(a["segment"][0], a["segment"][1], int(a.get("verb", 0))) for a in info["annotations"]]
        for v, info in ds.annotations.items()
    }
    stats = detection_map(ground_truth, predictions)
    log_json_stats({"_type": "tal_eval", **{k: round(v, 4) for k, v in stats.items()}}, logger)
    return stats


def submission_test(cfg) -> str:
    """Write an EPIC-style submission JSON (reference
    runs/submission_test.py)."""
    setup_logging(cfg.get("OUTPUT_DIR", None))
    stats_path = os.path.join(cfg.OUTPUT_DIR, cfg.SUBMISSION.get("SAVE_RESULTS_PATH", "test.json"))
    model = BMNModel(cfg)
    variables = jax.device_get(model.init(jax.random.PRNGKey(0)))
    apply_fn = jax.jit(lambda v, x: model.module.apply(v, x, train=False)[0])
    ds = TalFeatureDataset(cfg, cfg.TEST.get("TEST_SET", "test"))
    proposals: Dict[str, List] = collections.defaultdict(list)
    for feats, _maps, metas in _batches(ds, int(cfg.TEST.BATCH_SIZE), False, 0):
        preds = jax.device_get(apply_fn(variables, jnp.asarray(feats)))
        for video, plist in _window_proposals(cfg, preds, metas, ds).items():
            proposals[video].extend(plist)
    results = {
        v: [{"segment": [p["xmin"], p["xmax"]], "score": p["score"], "label": p["label"]} for p in plist]
        for v, plist in proposals.items()
    }
    os.makedirs(os.path.dirname(stats_path) or ".", exist_ok=True)
    with open(stats_path, "w") as f:
        json.dump({"version": "0.2", "results": results}, f)
    logger.info("submission written to %s", stats_path)
    return stats_path
