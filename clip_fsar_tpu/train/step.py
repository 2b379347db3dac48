"""Jitted train/eval steps over batched episodes.

Loss parity with the reference few-shot loop (runs/train_net_few_shot.py
:108-152): CE(episode logits, target labels) +
USE_CLASSIFICATION_VALUE * CE(video-text logits, real class ids), with
NaN-loss steps contributing zero gradient (:140-144), gradient clipping,
accumulation, EMA.  Scale note: the reference's loss/BATCH_SIZE + DDP-mean
+ BATCH_SIZE_PER_TASK accumulation reduces to a plain mean over the
BATCH_SIZE*BATCH_SIZE_PER_TASK episodes of one optimizer step — which is
exactly mean-over-E here composed with MultiSteps' mean over micro-steps.

Design: episodes come in as uint8 [E, ...]; normalization happens inside
jit (fused into the first conv by XLA); the head is vmapped over E so the
CLIP tower sees E*(S+Q)*T frames per call; GSPMD shards E over the
``data`` mesh axis.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from clip_fsar_tpu.data.transforms import normalize_images
from clip_fsar_tpu.data.types import Episode
from clip_fsar_tpu.train.optimizer import apply_lr
from clip_fsar_tpu.train.state import TrainState


def _normalize_episode(ep: Episode, mean, std) -> Episode:
    return ep.replace(
        support_images=normalize_images(ep.support_images, mean, std),
        target_images=normalize_images(ep.target_images, mean, std),
    )


def make_train_step(head, tx, cfg, text_train, text_test) -> Callable:
    mean = tuple(float(x) for x in cfg.DATA.MEAN)
    std = tuple(float(x) for x in cfg.DATA.STD)
    use_cls = bool(cfg.TRAIN.get("USE_CLASSIFICATION", False))
    cls_value = float(cfg.TRAIN.get("USE_CLASSIFICATION_VALUE", 1.0) or 1.0)
    cls_only = bool(cfg.TRAIN.get("USE_CLASSIFICATION_ONLY", False))
    use_local = bool(cfg.TRAIN.get("USE_LOCAL", False))
    temporal_weight = float(cfg.TRAIN.get("TEMPORAL_LOSS_WEIGHT", 0.0) or 0.0)
    use_contrastive = bool(cfg.TRAIN.get("USE_CONTRASTIVE", False))
    contrastive_coff = float(cfg.TRAIN.get("USE_CONTRASTIVE_COFF", 1.0) or 1.0)
    # the reference divides every CE term by BATCH_SIZE but adds
    # RECONS_COFF*loss_recons UNdivided (train_net_few_shot.py:131-133);
    # relative to this step's mean-over-episodes CE that makes the
    # effective reconstruction weight RECONS_COFF * BATCH_SIZE
    recons_coff = float(cfg.TRAIN.get("RECONS_COFF", 0.0) or 0.0) if cfg.TRAIN.get("USE_RECONS", False) else 0.0
    recons_coff *= float(cfg.TRAIN.get("BATCH_SIZE", 1) or 1)
    num_frames = int(cfg.DATA.NUM_INPUT_FRAMES)
    ema_decay = float(cfg.MODEL.EMA.DECAY) if ("MODEL" in cfg and cfg.MODEL.EMA.get("ENABLE", False)) else None
    # in-step gradient accumulation (TPU.EPISODE_CHUNKS, base.yaml): scan
    # over episode micro-batches so only E/chunks episodes' fwd+bwd temps
    # are live at once; one optimizer update per loader batch either way
    ep_chunks = int(cfg.TPU.get("EPISODE_CHUNKS", 1)) if "TPU" in cfg else 1

    # RN towers with live BatchNorm mutate running stats during training
    # (reference trains the whole model; BN.FREEZE=false default)
    bn_mutable = bool(getattr(head, "train_backbone_bn", False))

    def episode_loss(params, batch_stats, ep: Episode, rng) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        variables = {"params": params}
        new_stats = None
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        if batch_stats is not None and bn_mutable:
            out, mutated = head.apply(
                variables, ep, text_train, text_test, train=True, rngs={"dropout": rng}, mutable=["batch_stats"]
            )
            new_stats = mutated["batch_stats"]
        else:
            out = head.apply(variables, ep, text_train, text_test, train=True, rngs={"dropout": rng})
        logits = out["logits"]
        ep_ce = optax.softmax_cross_entropy_with_integer_labels(logits, ep.target_labels).mean()
        loss = ep_ce
        if use_cls:
            real = jnp.concatenate([ep.real_support_labels, ep.real_target_labels], axis=0)
            if use_local:
                # per-frame classification logits (HyRSM USE_LOCAL path,
                # train_net_few_shot.py:113-117): repeat labels per frame
                real = jnp.repeat(real[:, None], num_frames, axis=1).reshape(-1)
            cls_ce = optax.softmax_cross_entropy_with_integer_labels(out["class_logits"], real).mean()
            loss = cls_value * cls_ce if cls_only else ep_ce + cls_value * cls_ce
        if temporal_weight and out.get("loss_temporal_regular") is not None:
            loss = loss + temporal_weight * out["loss_temporal_regular"]
        if use_contrastive:
            # MoLo global<->local contrastive terms (train_net_few_shot.py:120-131)
            for key in ("logits_s2q", "logits_q2s", "logits_s2q_motion", "logits_q2s_motion"):
                if out.get(key) is not None:
                    loss = loss + contrastive_coff * optax.softmax_cross_entropy_with_integer_labels(
                        out[key], ep.target_labels
                    ).mean()
        if recons_coff and out.get("loss_recons") is not None:
            loss = loss + recons_coff * out["loss_recons"]
        top1 = (jnp.argmax(logits, -1) == ep.target_labels).mean()
        return loss, ({"loss": loss, "ce": ep_ce, "top1": top1}, new_stats)

    def batch_loss(params, batch_stats, batch: Episode, rngs) -> Tuple[jnp.ndarray, Tuple[Dict, Any]]:
        # rngs: one pre-split dropout key per episode ([E_chunk, ...]) so the
        # chunked and unchunked paths draw identical per-episode keys
        losses, (metrics, new_stats) = jax.vmap(lambda ep, r: episode_loss(params, batch_stats, ep, r))(batch, rngs)
        if new_stats is not None:
            # each episode updated stats from the same starting point
            # (reference: one episode per replica, no SyncBN) — average
            new_stats = jax.tree_util.tree_map(lambda s: s.mean(axis=0), new_stats)
        return losses.mean(), (jax.tree_util.tree_map(lambda m: m.mean(), metrics), new_stats)

    def train_step(state: TrainState, batch: Episode, lr: jnp.ndarray, rng) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        # device-side tail of the reference's episodic train stacks
        # (ColorJitter / Normalize / RandomErasing with support-vs-query
        # gates, data/augment.py); flatten [E, N, ...] clips for per-clip
        # jitter draws
        from clip_fsar_tpu.data.augment import fewshot_train_augment

        rng, ks, kt = jax.random.split(rng, 3)

        def aug(images, key, is_query):
            e, n = images.shape[:2]
            flat = images.reshape((e * n,) + images.shape[2:])
            out = fewshot_train_augment(key, flat, cfg, mean, std, is_query=is_query)
            return out.reshape((e, n) + out.shape[1:])

        batch = batch.replace(
            support_images=aug(batch.support_images, ks, False),
            target_images=aug(batch.target_images, kt, True),
        )
        e = batch.support_images.shape[0]
        rngs = jax.random.split(rng, e)
        grad_fn = jax.value_and_grad(batch_loss, has_aux=True)
        c = ep_chunks if (ep_chunks > 1 and e % ep_chunks == 0) else 1
        if c == 1:
            (loss, (metrics, new_stats)), grads = grad_fn(state.params, state.batch_stats, batch, rngs)
        else:
            # sequential micro-batches: grads accumulate in a params-sized
            # carry; each chunk's BN stats start from state.batch_stats
            # (reference: one episode per replica, no SyncBN), chunk-means
            # average to the same episode mean as the unchunked path
            split = lambda x: x.reshape((c, x.shape[0] // c) + x.shape[1:])
            chunks = jax.tree_util.tree_map(split, batch)
            chunk_rngs = split(rngs)

            def body(gsum, xs):
                chunk, r = xs
                (loss_c, (metrics_c, stats_c)), grads_c = grad_fn(state.params, state.batch_stats, chunk, r)
                gsum = jax.tree_util.tree_map(jnp.add, gsum, grads_c)
                return gsum, (loss_c, metrics_c, stats_c)

            gsum, (losses, metrics, stats) = jax.lax.scan(
                body, jax.tree_util.tree_map(jnp.zeros_like, state.params), (chunks, chunk_rngs)
            )
            grads = jax.tree_util.tree_map(lambda g: g / c, gsum)
            loss = losses.mean()
            metrics = jax.tree_util.tree_map(lambda m: m.mean(axis=0), metrics)
            new_stats = jax.tree_util.tree_map(lambda s: s.mean(axis=0), stats)
        # NaN guard (reference train_net_few_shot.py:140-144): a non-finite
        # loss leaves params AND optimizer state untouched (Adam moments
        # would otherwise still move parameters on zero gradients).
        # lax.cond executes only the taken branch on TPU — the common
        # (finite) path pays zero guard cost, vs ~6 ms/step of per-leaf
        # jnp.where select passes in the tree_map formulation.
        ok = jnp.isfinite(loss)

        def do_update(args):
            grads, params, opt_state = args
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, apply_lr(updates, lr)), opt_state

        params, opt_state = jax.lax.cond(
            ok, do_update, lambda args: (args[1], args[2]), (grads, state.params, state.opt_state)
        )
        new_state = state.replace(step=state.step + 1, params=params, opt_state=opt_state)
        if new_stats is not None:
            keep = lambda new, old: jax.tree_util.tree_map(lambda n, o: jnp.where(ok, n, o), new, old)
            new_state = new_state.replace(batch_stats=keep(new_stats, state.batch_stats))
        if ema_decay is not None:
            ema = jax.tree_util.tree_map(
                lambda e_, p: ema_decay * e_ + (1.0 - ema_decay) * p, state.ema_params, params
            )
            new_state = new_state.replace(ema_params=ema)
        metrics["nan_skipped"] = (~ok).astype(jnp.float32)
        return new_state, metrics

    return train_step


def make_eval_step(head, cfg, text_train, text_test) -> Callable:
    mean = tuple(float(x) for x in cfg.DATA.MEAN)
    std = tuple(float(x) for x in cfg.DATA.STD)

    def episode_eval(variables, ep: Episode) -> Dict[str, jnp.ndarray]:
        out = head.apply(variables, ep, text_train, text_test, train=False)
        logits = out["logits"]
        labels = ep.target_labels
        order = jnp.argsort(-logits, axis=-1)
        top1 = (order[:, 0] == labels).sum()
        kmax = min(5, logits.shape[-1])
        top5 = (order[:, :kmax] == labels[:, None]).any(-1).sum()
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        # per-class correctness for the per-class accuracy report
        correct = (order[:, 0] == labels).astype(jnp.float32)
        return {
            "top1_correct": top1,
            "top5_correct": top5,
            "count": jnp.asarray(labels.shape[0], jnp.int32),
            "loss": ce,
            "real_labels": ep.real_target_labels,
            "correct": correct,
        }

    def eval_step(variables, batch: Episode) -> Dict[str, jnp.ndarray]:
        batch = _normalize_episode(batch, mean, std)
        return jax.vmap(lambda ep: episode_eval(variables, ep))(batch)

    return eval_step
