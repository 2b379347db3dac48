"""Classification task: epoch-driven train + multi-view test
(capability of reference runs/train.py and runs/test.py).

TPU design: batches sharded over the data mesh axis, params replicated,
one jitted step; mixup/label smoothing applied device-side; multi-view
test scores re-assembled per video id by the TestMeter.
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from clip_fsar_tpu.data.classification import build_classification_loader
from clip_fsar_tpu.data.mixup import mixup_batch, smooth_one_hot
from clip_fsar_tpu.data.transforms import normalize_images
from clip_fsar_tpu.models.video.model import build_video_model
from clip_fsar_tpu.parallel.mesh import build_mesh, data_sharding, replicate, shard_params
from clip_fsar_tpu.train.checkpoint import Checkpointer, auto_resume
from clip_fsar_tpu.train.optimizer import apply_lr, build_optimizer, get_lr_at_epoch
from clip_fsar_tpu.train.state import TrainState
from clip_fsar_tpu.utils.logging import get_logger, log_json_stats, setup_logging
from clip_fsar_tpu.utils.meters import ScalarMeter, TestMeter

logger = get_logger(__name__)


def _dtype(cfg):
    name = str(cfg.TPU.get("COMPUTE_DTYPE", "bfloat16")) if "TPU" in cfg else "float32"
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


def _build(cfg):
    model = build_video_model(cfg, dtype=_dtype(cfg))
    t, res = int(cfg.DATA.NUM_INPUT_FRAMES), int(cfg.DATA.TRAIN_CROP_SIZE)
    dummy = jnp.zeros((1, t, res, res, 3), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, dummy, train=False))(jax.random.PRNGKey(int(cfg.get("RANDOM_SEED", 0))))
    return model, jax.device_get(variables)


def make_classification_train_step(model, tx, cfg):
    mean = tuple(float(x) for x in cfg.DATA.MEAN)
    std = tuple(float(x) for x in cfg.DATA.STD)
    nc = cfg.VIDEO.HEAD.NUM_CLASSES
    dual_head = isinstance(nc, (list, tuple))  # EPIC verb+noun (BaseHeadx2)
    num_classes = None if dual_head else int(nc)
    aug = cfg.AUGMENTATION
    mix_enabled = bool(aug.MIXUP.get("ENABLE", False)) or bool(aug.CUTMIX.get("ENABLE", False))
    smoothing = float(aug.get("LABEL_SMOOTHING", 0.0) or 0.0)
    ema_decay = float(cfg.MODEL.EMA.DECAY) if cfg.MODEL.EMA.get("ENABLE", False) else None

    color_or_erase = bool(aug.get("COLOR_AUG", False)) or (
        hasattr(aug.get("RANDOM_ERASING", {}), "get") and bool(aug.RANDOM_ERASING.get("ENABLE", False))
    )

    pretrain = bool(cfg.PRETRAIN.get("ENABLE", False)) if "PRETRAIN" in cfg else False

    def loss_fn(params, batch_stats, videos, labels, rng):
        if pretrain:
            # SSL pretraining (reference train.py + losses.calculate_loss
            # SSL '+'-composition): videos [B, S, F, H, W, 3] pseudo-motion
            # clips, labels a dict of per-axis targets [B, S]
            from clip_fsar_tpu.train.losses import calculate_loss

            if color_or_erase:
                # the reference applies the transform pipeline AFTER the
                # ssl generator (base_dataset.py __getitem__: generator,
                # then self.transform) — jitter the generated clips with
                # one consistent draw per sample, like CONSISTENT=true
                from clip_fsar_tpu.data.augment import apply_train_augment

                rng, aug_rng = jax.random.split(rng)
                b, s = videos.shape[:2]
                flat = videos.reshape((b, s * videos.shape[2]) + videos.shape[3:])
                x = apply_train_augment(aug_rng, flat, cfg, mean, std)
                x = x.reshape(videos.shape)
            else:
                x = normalize_images(videos, mean, std)
            variables = {"params": params}
            if batch_stats is not None:
                variables["batch_stats"] = batch_stats
            preds, logits = model.apply(variables, x, train=True, rngs={"dropout": rng})
            loss, parts = calculate_loss(cfg, preds, logits, {"self-supervised": labels})
            metrics = {"loss": loss}
            shared = [k for k in preds if k in labels]
            if shared:
                k = shared[0]
                metrics["top1"] = (jnp.argmax(preds[k], -1) == labels[k].reshape(-1)).mean()
            else:
                metrics["top1"] = jnp.zeros(())
            return loss, metrics
        if color_or_erase:
            # device-side jitter/erasing (the reference's AUGMENTATION.USE_GPU
            # path, finetune.yaml) fused into the jitted step
            from clip_fsar_tpu.data.augment import apply_train_augment

            rng, aug_rng = jax.random.split(rng)
            x = apply_train_augment(aug_rng, videos, cfg, mean, std)
        else:
            x = normalize_images(videos, mean, std)
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        if dual_head:
            # EPIC verb+noun: loss_verb + loss_noun (reference
            # losses.calculate_loss:110-116 sums CE per label key)
            (pv, pn), _ = model.apply(variables, x, train=True, rngs={"dropout": rng})
            tv = smooth_one_hot(labels[:, 0], int(nc[0]), smoothing)
            tn = smooth_one_hot(labels[:, 1], int(nc[1]), smoothing)
            loss = optax.softmax_cross_entropy(pv, tv).mean() + optax.softmax_cross_entropy(pn, tn).mean()
            top1 = ((jnp.argmax(pv, -1) == labels[:, 0]) & (jnp.argmax(pn, -1) == labels[:, 1])).mean()
            return loss, {"loss": loss, "top1": top1}
        if mix_enabled:
            rng, mix_rng = jax.random.split(rng)
            minmax = aug.CUTMIX.get("MINMAX", None) if aug.CUTMIX.get("ENABLE", False) else None
            x, targets = mixup_batch(
                mix_rng, x, labels, num_classes,
                mixup_alpha=float(aug.MIXUP.get("ALPHA", 0.8) or 0.0),
                cutmix_alpha=float(aug.CUTMIX.get("ALPHA", 0.0) or 0.0),
                prob=float(aug.MIXUP.get("PROB", 1.0)),
                switch_prob=float(aug.MIXUP.get("SWITCH_PROB", 0.5)),
                smoothing=smoothing,
                mode=str(aug.MIXUP.get("MODE", "batch")),
                cutmix_minmax=tuple(minmax) if minmax else None,
            )
        else:
            targets = smooth_one_hot(labels, num_classes, smoothing)
        logits, _ = model.apply(variables, x, train=True, rngs={"dropout": rng})
        loss = optax.softmax_cross_entropy(logits, targets).mean()
        top1 = (jnp.argmax(logits, -1) == labels).mean()
        return loss, {"loss": loss, "top1": top1}

    def step(state: TrainState, videos, labels, lr, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, videos, labels, rng
        )
        # NaN guard via lax.cond — only the taken branch runs on TPU (see
        # train/step.py; per-leaf jnp.where selects cost ~6 ms/step)
        ok = jnp.isfinite(loss)

        def do_update(args):
            grads, params, opt_state = args
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, apply_lr(updates, lr)), opt_state

        params, opt_state = jax.lax.cond(
            ok, do_update, lambda args: (args[1], args[2]), (grads, state.params, state.opt_state)
        )
        state = state.replace(step=state.step + 1, params=params, opt_state=opt_state)
        if ema_decay is not None and state.ema_params is not None:
            state = state.replace(
                ema_params=jax.tree_util.tree_map(lambda e, p: ema_decay * e + (1 - ema_decay) * p, state.ema_params, state.params)
            )
        return state, metrics

    return step


def make_classification_eval_step(model, cfg, capture_features: bool = False):
    mean = tuple(float(x) for x in cfg.DATA.MEAN)
    std = tuple(float(x) for x in cfg.DATA.STD)

    def step(variables, videos):
        x = normalize_images(videos, mean, std)
        if capture_features:
            # feature-map visualization (reference base_blocks.py:23-63):
            # sow residual-block outputs in one traced apply instead of
            # per-layer torch hooks
            from clip_fsar_tpu.utils.visualization import feature_map_filter

            (preds, _), inter = model.apply(
                variables, x, train=False,
                capture_intermediates=feature_map_filter(), mutable=["intermediates"],
            )
            return preds, inter["intermediates"]
        preds, _ = model.apply(variables, x, train=False)
        return preds

    return step


def train(cfg) -> Dict[str, float]:
    setup_logging(cfg.get("OUTPUT_DIR", None))
    mesh = build_mesh(cfg)
    model, variables = _build(cfg)
    tx = build_optimizer(cfg, variables["params"])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        opt_state=tx.init(variables["params"]),
        batch_stats=variables.get("batch_stats"),
        ema_params=variables["params"] if cfg.MODEL.EMA.get("ENABLE", False) else None,
    )
    ckpt = Checkpointer(cfg.OUTPUT_DIR)
    resumed = auto_resume(cfg, ckpt, state)
    start_epoch = 0
    if resumed is not None:
        state = resumed
        start_epoch = int(cfg.TRAIN.get("RESUME_EPOCH", 0))
    else:
        # finetune/continue from a config-pointed checkpoint, with optional
        # 2D->3D inflation + pos-embed surgery (reference checkpoint.py:547-576)
        from clip_fsar_tpu.train.pretrain import load_train_checkpoint_file

        loaded_vars, ok = load_train_checkpoint_file(cfg, variables)
        if ok:
            state = state.replace(params=loaded_vars["params"], batch_stats=loaded_vars.get("batch_stats"))
            if state.ema_params is not None:
                state = state.replace(ema_params=loaded_vars["params"])
    state = shard_params(state, mesh)
    sh = data_sharding(mesh)

    train_step = jax.jit(make_classification_train_step(model, tx, cfg), donate_argnums=0)
    eval_step = jax.jit(make_classification_eval_step(model, cfg))

    loader = build_classification_loader(cfg, "train")
    max_epoch = int(cfg.SOLVER.MAX_EPOCH)
    num_folds = int(cfg.TRAIN.get("NUM_FOLDS", 1))
    eval_period = int(cfg.TRAIN.get("EVAL_PERIOD", 10))
    rng = jax.random.PRNGKey(int(cfg.get("RANDOM_SEED", 0)) + 2)
    loss_meter = ScalarMeter(int(cfg.get("LOG_PERIOD", 10)))
    best_top1 = 0.0
    pretrain = bool(cfg.PRETRAIN.get("ENABLE", False)) if "PRETRAIN" in cfg else False
    ssl_eval_step = None  # jitted once on first eval epoch, reused after

    for cur_epoch in range(start_epoch, max_epoch, num_folds):
        loader.set_epoch(cur_epoch)
        data_size = max(len(loader), 1)
        for it, (videos, labels, _) in enumerate(loader):
            lr = get_lr_at_epoch(cfg, cur_epoch + num_folds * it / data_size)
            rng, step_rng = jax.random.split(rng)
            videos = jax.device_put(videos, sh)
            labels = jax.device_put(labels, sh)
            state, metrics = train_step(state, videos, labels, jnp.float32(lr), step_rng)
            if (it + 1) % int(cfg.get("LOG_PERIOD", 10)) == 0:
                m = jax.device_get(metrics)
                loss_meter.add_value(float(m["loss"]))
                log_json_stats(
                    {"_type": "train_iter", "epoch": cur_epoch + 1, "iter": f"{it + 1}/{data_size}",
                     "loss": round(loss_meter.get_win_median(), 5), "top1": round(float(m["top1"]) * 100, 2), "lr": lr},
                    logger,
                )
        from clip_fsar_tpu.utils.misc import is_checkpoint_epoch, is_eval_epoch

        # reference cadence (misc.py:168-180, checkpoint.py:89-99), checked
        # for every epoch this fold-step covered
        covered = range(cur_epoch, min(cur_epoch + num_folds, max_epoch))
        if any(is_eval_epoch(cfg, e_) for e_ in covered):
            if pretrain:
                if ssl_eval_step is None:
                    ssl_eval_step = make_ssl_eval_step(model, cfg)
                _eval_epoch_ssl(cfg, model, jax.device_get(state).model_variables, mesh, step=ssl_eval_step)
            else:
                stats = _eval_epoch(cfg, model, jax.device_get(state).model_variables, eval_step, mesh)
                best_top1 = max(best_top1, stats["top1_acc"])
        if any(is_checkpoint_epoch(cfg, e_) for e_ in covered):
            ckpt.save(cur_epoch + num_folds, jax.device_get(state))
    ckpt.save(max_epoch, jax.device_get(state))
    ckpt.close()
    return {"best_top1": best_top1}


def _dual_head(cfg) -> bool:
    return isinstance(cfg.VIDEO.HEAD.get("NUM_CLASSES", 0), (list, tuple))


def make_ssl_eval_step(model, cfg):
    """Jitted once per run (train() hoists it out of the epoch loop):
    per-SAMPLE SSL cross-entropies + per-clip hit counts so tail-batch
    padding duplicates (clip_id < 0) can be masked out exactly."""
    mean = tuple(float(x) for x in cfg.DATA.MEAN)
    std = tuple(float(x) for x in cfg.DATA.STD)

    def step(variables, videos, labels, valid):
        x = normalize_images(videos, mean, std)
        preds, _ = model.apply(variables, x, train=False)
        b, s = videos.shape[:2]
        w = jnp.repeat(valid.astype(jnp.float32), s)  # per-clip weights
        denom = jnp.maximum(w.sum(), 1.0)
        losses, accs = {}, {}
        for k in preds:
            lab = labels.get(k, labels.get("move_joint"))
            if lab is None:
                continue
            lab = lab.reshape(-1)
            ce = optax.softmax_cross_entropy_with_integer_labels(preds[k], lab)
            losses[k] = (ce * w).sum() / denom
            accs[k] = (((jnp.argmax(preds[k], -1) == lab) * w).sum()) / denom
        total = sum(losses.values()) / max(len(losses), 1)
        return total, accs, w.sum()

    return jax.jit(step)


def _eval_epoch_ssl(cfg, model, variables, mesh, step=None) -> Dict[str, float]:
    """Pretrain validation: SSL loss (+ per-axis accuracy) over the val
    split (reference train.py eval_epoch with SSL losses), padding-aware."""
    if step is None:
        step = make_ssl_eval_step(model, cfg)
    sh = data_sharding(mesh)
    variables = shard_params(variables, mesh)
    loader = build_classification_loader(cfg, "test")
    loss_sum = 0.0
    w_sum = 0.0
    accs_sum: Dict[str, float] = {}
    for videos, labels, clip_ids in loader:
        valid = jnp.asarray(clip_ids >= 0)
        loss, accs, w = jax.device_get(
            step(variables, jax.device_put(videos, sh), jax.device_put(labels, sh), valid)
        )
        loss_sum += float(loss) * float(w)
        w_sum += float(w)
        for k, v in accs.items():
            accs_sum[k] = accs_sum.get(k, 0.0) + float(v) * float(w)
    stats = {"loss": loss_sum / max(w_sum, 1.0)}
    stats.update({f"acc_{k}": round(v / max(w_sum, 1.0) * 100.0, 2) for k, v in accs_sum.items()})
    log_json_stats({"_type": "val_epoch_ssl", **stats, "clips": int(w_sum)}, logger)
    return stats


def _eval_epoch(cfg, model, variables, eval_step, mesh) -> Dict[str, float]:
    sh = data_sharding(mesh)
    variables = shard_params(variables, mesh)
    loader = build_classification_loader(cfg, "test")
    dual = _dual_head(cfg)
    correct = total = 0
    for videos, labels, clip_ids in loader:
        out = jax.device_get(eval_step(variables, jax.device_put(videos, sh)))
        valid = clip_ids >= 0
        if dual:
            pv, pn = (np.asarray(o) for o in out)
            hit = (pv.argmax(-1)[valid] == labels[valid, 0]) & (pn.argmax(-1)[valid] == labels[valid, 1])
            correct += int(hit.sum())
        else:
            preds = np.asarray(out)
            correct += int((preds.argmax(-1)[valid] == labels[valid]).sum())
        total += int(valid.sum())
    stats = {"top1_acc": correct / max(total, 1) * 100.0}
    log_json_stats({"_type": "val_epoch", **stats, "samples": total}, logger)
    return stats


def test(cfg) -> Dict[str, float]:
    """Multi-view ensemble test (reference runs/test.py + TestMeter)."""
    setup_logging(cfg.get("OUTPUT_DIR", None))
    mesh = build_mesh(cfg)
    model, variables = _build(cfg)
    tx = build_optimizer(cfg, variables["params"])
    template = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"], opt_state=tx.init(variables["params"]), batch_stats=variables.get("batch_stats"))
    ckpt = Checkpointer(cfg.OUTPUT_DIR)
    from clip_fsar_tpu.train.pretrain import load_test_variables

    variables = load_test_variables(cfg, ckpt, template, variables)
    ckpt.close()

    eval_step = jax.jit(make_classification_eval_step(model, cfg))
    loader = build_classification_loader(cfg, "test")
    num_clips = loader.ds._num_clips
    sh = data_sharding(mesh)
    variables = shard_params(variables, mesh)

    if _dual_head(cfg):
        # EPIC verb+noun multi-view protocol (reference runs/test.py +
        # EpicKitchenMeter, meters.py:178-468)
        from clip_fsar_tpu.utils.meters import EpicKitchenMeter

        meter = EpicKitchenMeter(
            num_videos=len(loader.ds.samples), num_clips=num_clips,
            num_cls=cfg.VIDEO.HEAD.NUM_CLASSES,
            ensemble_method=str(cfg.DATA.get("ENSEMBLE_METHOD", "sum")),
        )
        pending = None  # dispatch batch N before fetching N-1: meter work overlaps device compute
        for videos, labels, clip_ids in loader:
            fut = eval_step(variables, jax.device_put(videos, sh))
            if pending is not None:
                _drain_epic(meter, *pending)
            pending = (fut, labels, clip_ids)
        if pending is not None:
            _drain_epic(meter, *pending)
        return meter.finalize_metrics()

    from clip_fsar_tpu.utils.visualization import save_feature_maps, visualization_enabled

    viz = visualization_enabled(cfg)
    if viz:
        eval_step = jax.jit(make_classification_eval_step(model, cfg, capture_features=True))

    meter = TestMeter(
        num_videos=len(loader.ds.samples), num_clips=num_clips, num_cls=int(cfg.VIDEO.HEAD.NUM_CLASSES),
        ensemble_method=str(cfg.DATA.get("ENSEMBLE_METHOD", "sum")),
    )
    viz_id = 0

    def drain(fut, labels, clip_ids):
        nonlocal viz_id
        out = jax.device_get(fut)
        if viz:
            preds, inter = np.asarray(out[0]), out[1]
            viz_id += save_feature_maps(inter, cfg, start_id=viz_id, valid=clip_ids >= 0)
        else:
            preds = np.asarray(out)
        valid = clip_ids >= 0
        meter.update_stats(preds[valid], labels[valid], clip_ids[valid])

    pending = None  # dispatch batch N before fetching N-1
    for videos, labels, clip_ids in loader:
        fut = eval_step(variables, jax.device_put(videos, sh))
        if pending is not None:
            drain(*pending)
        pending = (fut, labels, clip_ids)
    if pending is not None:
        drain(*pending)
    return meter.finalize_metrics()


def _drain_epic(meter, fut, labels, clip_ids):
    pv, pn = (np.asarray(o) for o in jax.device_get(fut))
    valid = clip_ids >= 0
    meter.update_stats(pv[valid], pn[valid], labels[valid, 0], labels[valid, 1], clip_ids[valid])


def submission_test(cfg) -> Dict[str, float]:
    """EPIC test-set submission (reference runs/submission_test.py:24-282):
    run the multi-view EPIC test, then write the per-video ensembled
    verb/noun scores as a submission JSON."""
    import json
    import os

    setup_logging(cfg.get("OUTPUT_DIR", None))
    mesh = build_mesh(cfg)
    model, variables = _build(cfg)
    tx = build_optimizer(cfg, variables["params"])
    template = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"], opt_state=tx.init(variables["params"]), batch_stats=variables.get("batch_stats"))
    ckpt = Checkpointer(cfg.OUTPUT_DIR)
    from clip_fsar_tpu.train.pretrain import load_test_variables
    from clip_fsar_tpu.utils.meters import EpicKitchenMeter

    variables = load_test_variables(cfg, ckpt, template, variables)
    ckpt.close()

    eval_step = jax.jit(make_classification_eval_step(model, cfg))
    loader = build_classification_loader(cfg, "test")
    meter = EpicKitchenMeter(
        num_videos=len(loader.ds.samples), num_clips=loader.ds._num_clips,
        num_cls=cfg.VIDEO.HEAD.NUM_CLASSES,
        ensemble_method=str(cfg.DATA.get("ENSEMBLE_METHOD", "sum")),
    )
    sh = data_sharding(mesh)
    variables = shard_params(variables, mesh)
    for videos, labels, clip_ids in loader:
        pv, pn = (np.asarray(o) for o in jax.device_get(eval_step(variables, jax.device_put(videos, sh))))
        valid = clip_ids >= 0
        meter.update_stats(pv[valid], pn[valid], labels[valid, 0], labels[valid, 1], clip_ids[valid])

    preds = meter.get_video_preds()
    results = {
        "version": "0.2",
        "challenge": "action_recognition",
        "results": {
            str(loader.ds.samples[v][0]): {
                "verb": {str(c): float(s) for c, s in enumerate(preds["verb_class"][v])},
                "noun": {str(c): float(s) for c, s in enumerate(preds["noun_class"][v])},
            }
            for v in range(len(loader.ds.samples))
        },
    }
    out_path = os.path.join(cfg.OUTPUT_DIR, "submission.json")
    with open(out_path, "w") as f:
        json.dump(results, f)
    logger.info("wrote EPIC submission JSON: %s", out_path)
    return meter.finalize_metrics()
