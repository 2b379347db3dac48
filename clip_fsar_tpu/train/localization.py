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
from clip_fsar_tpu.utils.tal import detection_map, fuse_verb_noun_map, parse_bmn_proposals, soft_nms

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
    (reference fuse_epic_sliding_windows + parse_epic_bmn_proposals).

    When the BMN head emits verb/noun maps, each proposal also carries the
    fused top-k action candidates (reference tal_tools.py:125,139-167):
    ``verb_noun`` [k, 2] (verb_id, noun_id) and ``vn_score`` [k, 3]
    (verb, noun, fused score)."""
    per_video: Dict[str, List] = collections.defaultdict(list)
    tscale = int(cfg.DATA.TEMPORAL_SCALE)
    start = np.asarray(preds["start"])
    end = np.asarray(preds["end"])
    conf = np.asarray(preds["confidence_map"])
    has_cls = not isinstance(preds.get("verb_map"), dict)
    if has_cls:
        verb_map = np.asarray(preds["verb_map"])  # [B, V, D, T]
        noun_map = np.asarray(preds["noun_map"])  # [B, N, D, T]
    for bi, (video, w_start) in enumerate(metas):
        props = parse_bmn_proposals(start[bi], end[bi], conf[bi])
        duration = float(ds.annotations[video]["duration"])
        for p in props:
            t0 = (w_start + p["xmin"] * tscale)
            t1 = (w_start + p["xmax"] * tscale)
            if t1 > duration + 1e-6:
                continue
            out = dict(p, xmin=t0, xmax=t1)
            out["label"] = 0
            if has_cls:
                # the (duration, start) cell this proposal was read from
                d_idx = max(min(int((p["xmax"] - p["xmin"]) * tscale) - 1, conf[bi].shape[1] - 1), 0)
                s_idx = min(int(p["xmin"] * tscale), tscale - 1)
                vn, vn_score = fuse_verb_noun_map(verb_map[bi, :, d_idx, s_idx], noun_map[bi, :, d_idx, s_idx])
                out["verb_noun"], out["vn_score"] = vn, vn_score
                out["label"] = int(vn[0, 0])
            per_video[video].append(out)
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

    predictions = _post_process(cfg, proposals, ds)

    # three evaluation streams like the reference Epicdetection
    # (eval_epic_detection.py:231-242): action = exact (verb, noun) pair,
    # plus marginal verb-only and noun-only streams
    tious = (0.1, 0.2, 0.3, 0.4, 0.5)
    gt = {"action": {}, "verb": {}, "noun": {}}
    for v, info in ds.annotations.items():
        anns = [(a["segment"][0], a["segment"][1], int(a.get("verb", 0)), int(a.get("noun", 0))) for a in info["annotations"]]
        gt["action"][v] = [(s, e, (vb, nn)) for s, e, vb, nn in anns]
        gt["verb"][v] = [(s, e, vb) for s, e, vb, _ in anns]
        gt["noun"][v] = [(s, e, nn) for s, e, _, nn in anns]
    pred = {"action": {}, "verb": {}, "noun": {}}
    for v, dets in predictions.items():
        pred["action"][v] = [(d["segment"][0], d["segment"][1], d["score"], (d["verb"], d["noun"])) for d in dets]
        pred["verb"][v] = [(d["segment"][0], d["segment"][1], d["score"], d["verb"]) for d in dets]
        pred["noun"][v] = [(d["segment"][0], d["segment"][1], d["score"], d["noun"]) for d in dets]

    stats: Dict[str, float] = {}
    for stream in ("action", "verb", "noun"):
        for k, val in detection_map(gt[stream], pred[stream], tiou_thresholds=tious).items():
            stats[f"{stream}/{k}"] = val
    log_json_stats({"_type": "tal_eval", **{k: round(v, 4) for k, v in stats.items()}}, logger)
    return stats


def _post_process(cfg, proposals: Dict[str, List], ds) -> Dict[str, List[Dict]]:
    """Score + soft-NMS + top-k action expansion per video (reference
    epic_video_post_process, tal_tools.py:298-372).

    Returns video -> [{"segment": [t0, t1], "score", "verb", "noun"}].
    """
    loc = cfg.LOCALIZATION
    pp = loc.get("POST_PROCESS", loc)  # legacy flat keys as fallback
    nms_alpha = float(pp.get("SOFT_NMS_ALPHA", 0.4))
    t1, t2 = float(pp.get("SOFT_NMS_LOW_THRES", 0.0)), float(pp.get("SOFT_NMS_HIGH_THRES", 0.0))
    iou_power = float(pp.get("IOU_POWER", 2.0))
    select_score = float(pp.get("SELECT_SCORE", 0.0))
    score_type = str(pp.get("SCORE_TYPE", "cr"))
    clr_power = float(pp.get("CLR_POWER", 1.2))
    reg_power = float(pp.get("REG_POWER", 1.2))
    action_power = float(pp.get("ACTION_SCORE_POWER", 1.0))
    use_topk = int(pp.get("USE_TOPK", 5))

    predictions: Dict[str, List[Dict]] = {}
    for video, plist in proposals.items():
        duration = max(float(ds.annotations[video]["duration"]), 1e-6)
        # the reference recomputes the ranking score from its factors
        # (tal_tools.py:332-343); 'cr' is the shipped default
        for p in plist:
            if score_type == "cr":
                p["score"] = p.get("clr_score", p["score"]) ** clr_power * p.get("reg_score", 1.0) ** reg_power
            elif score_type == "se":
                p["score"] = p.get("xmin_score", p["score"]) ** 2
            elif score_type == "secr":
                p["score"] = (p.get("clr_score", 1.0) * p.get("reg_score", 1.0)
                              * p.get("xmin_score", p["score"]) ** 2)
        plist = [p for p in plist if p["score"] > select_score]
        # soft-NMS runs on DURATION-NORMALIZED segments (the reference
        # normalizes before soft_nms and scales by duration only
        # afterwards, tal_tools.py:346-370): its width-dependent threshold
        # t1+(t2-t1)*width assumes widths in [0,1] — frame-unit widths
        # would push the threshold past any IoU and disable the decay
        norm = [dict(p, xmin=p["xmin"] / duration, xmax=p["xmax"] / duration) for p in plist]
        # the reference only runs soft-NMS with >1 proposal (tal_tools.py:345)
        # — and soft_nms itself would drop a lone proposal since its loop
        # requires two left
        if len(norm) > 1:
            kept = soft_nms(norm, nms_alpha, t1, t2, int(pp.get("PROP_NUM", 100)), iou_power)
        else:
            kept = norm
        dets = []
        for p in kept:
            seg = [max(0.0, p["xmin"]) * duration, min(1.0, p["xmax"]) * duration]
            if "verb_noun" in p:
                # every surviving proposal fans out into its top-k fused
                # actions, each scored score * fused^ACTION_SCORE_POWER
                # (tal_tools.py:359-371)
                vn, vs = p["verb_noun"], p["vn_score"]
                for k in range(min(use_topk, len(vn))):
                    dets.append({"segment": seg, "score": float(p["score"] * vs[k, 2] ** action_power),
                                 "verb": int(vn[k, 0]), "noun": int(vn[k, 1])})
            else:
                dets.append({"segment": seg, "score": float(p["score"]), "verb": int(p.get("label", 0)), "noun": 0})
        predictions[video] = dets
    return predictions


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
    # EPIC challenge schema (reference epic_localization_post_processing,
    # tal_tools.py:229-238 + per-det keys at :362-371); 'label' is the key on
    # val splits, 'action' on the held-out test split (:315)
    action_key = "label" if "val" in str(cfg.TEST.get("TEST_SET", "test")) else "action"
    results = {}
    for v, dets in _post_process(cfg, proposals, ds).items():
        results[v] = [
            {"score": d["score"], action_key: f"{d['verb']},{d['noun']}", "verb": d["verb"],
             "noun": d["noun"], "segment": d["segment"]}
            for d in dets
        ]
    os.makedirs(os.path.dirname(stats_path) or ".", exist_ok=True)
    with open(stats_path, "w") as f:
        json.dump({"version": "0.2", "challenge": "action_detection", "sls_pt": 2,
                   "sls_tl": 3, "sls_td": 3, "results": results}, f, indent=4)
    logger.info("submission written to %s", stats_path)
    return stats_path
