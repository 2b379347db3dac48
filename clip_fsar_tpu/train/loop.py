"""Few-shot train/test loops (capability of runs/train_net_few_shot.py +
runs/test_net_few_shot.py, TPU-native).

Iteration accounting: the reference counts per-GPU iterations of one
episode each (NUM_TRAIN_TASKS of them, with BATCH_SIZE==NUM_GPUS episodes
in flight per iteration and BATCH_SIZE_PER_TASK accumulation).  Here one
jitted step consumes TPU.EPISODES_PER_STEP episodes; configs generated
from the reference set EPISODES_PER_STEP == BATCH_SIZE, so step s
corresponds 1:1 to reference iteration s: the LR schedule, VAL_FRE_ITER
and NUM_TRAIN_TASKS transfer unchanged.
"""

from __future__ import annotations

import collections
import functools
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from clip_fsar_tpu.data.loader import build_few_shot_loader
from clip_fsar_tpu.models.builder import build_few_shot_model
from clip_fsar_tpu.parallel.mesh import (
    build_mesh,
    check_batch_divisible,
    local_episode_range,
    replicate,
    replicated,
    retry_transient,
    round_to_data_mesh,
    shard_batch,
    shard_params,
)
from clip_fsar_tpu.train.checkpoint import Checkpointer, auto_resume
from clip_fsar_tpu.train.optimizer import build_optimizer, epoch_for_iter, get_lr_at_epoch
from clip_fsar_tpu.train.state import TrainState
from clip_fsar_tpu.train.step import make_eval_step, make_train_step
from clip_fsar_tpu.utils.logging import get_logger, log_json_stats, setup_logging
from clip_fsar_tpu.utils.meters import ScalarMeter

logger = get_logger(__name__)


def build_state(cfg, model, tx) -> TrainState:
    params = model.variables["params"]
    ema = None
    if "MODEL" in cfg and cfg.MODEL.EMA.get("ENABLE", False):
        ema = jax.tree_util.tree_map(lambda x: x, params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=model.variables.get("batch_stats"),
        ema_params=ema,
    )


def evaluate(
    cfg, model, variables, mesh, num_tasks: int, episodes_per_step: int = None, split: str = "test",
    eval_step=None, bank_ctx=None,
) -> Dict[str, float]:
    """Episode-sampled evaluation: top-1/top-5 over num_tasks episodes plus
    per-class top-1 (reference test_net_few_shot.py:35-224).  Pass a
    pre-jitted ``eval_step`` when calling repeatedly (interleaved
    validation) — a fresh closure per call would recompile the tower.

    TPU.EVAL_FRAME_BANK=true pins the split's quantized frames in HBM once
    and feeds int32 gather indices per step instead of pixels
    (data/frame_bank.py) — same episode stream, same metrics, ~4e4x less
    host->device traffic on the protocol loop."""
    sampler_wrap = None
    if bank_ctx is None and eval_step is None and bool(cfg.TPU.get("EVAL_FRAME_BANK", False)):
        from clip_fsar_tpu.data.frame_bank import make_bank_eval_context

        bank_ctx = make_bank_eval_context(cfg, model, mesh, split)
    if bank_ctx is not None:
        from clip_fsar_tpu.data.frame_bank import IndexEpisodeSampler

        eval_step = functools.partial(bank_ctx.eval_step, bank=bank_ctx.bank)
        sampler_wrap = lambda s: IndexEpisodeSampler(s, bank_ctx.table)  # noqa: E731
    if eval_step is None:
        # replicated outputs: every process of a multi-host job can fetch
        # the full per-episode metric arrays (GSPMD all-gathers over ICI);
        # free on a single-process mesh
        eval_step = jax.jit(
            make_eval_step(model.head, cfg, model.text_train, model.text_test),
            out_shardings=replicated(mesh),
        )
    # eval has no backward residuals, so it wants a LARGER episode batch
    # than training (E=8 measured 13.9 eps/s vs 10.9 at E=1 on ViT-B/16,
    # PERFORMANCE.md) — TPU.EVAL_EPISODES_PER_STEP overrides when set
    e = episodes_per_step or int(
        cfg.TPU.get("EVAL_EPISODES_PER_STEP", 0) or cfg.TPU.get("EPISODES_PER_STEP", 1)
    )
    e = round_to_data_mesh(e, mesh)
    check_batch_divisible(e, mesh)
    # exactly num_tasks episodes are counted (reference cuts the loop at
    # NUM_TEST_TASKS, test_net_few_shot.py:57): surplus episodes of the
    # last (ceil) batch are dropped from the accounting
    num_steps = max(-(-num_tasks // e), 1)
    variables = shard_params(variables, mesh)

    top1 = top5 = count = 0
    loss_sum = 0.0
    episodes_left = num_tasks
    per_class = collections.defaultdict(lambda: [0, 0])  # real label -> [correct, total]
    ep_range = local_episode_range(e, mesh)

    def consume(out_arrays):
        nonlocal top1, top5, count, loss_sum, episodes_left
        take = min(e, episodes_left)
        episodes_left -= take
        top1 += out_arrays["top1_correct"][:take].sum()
        top5 += out_arrays["top5_correct"][:take].sum()
        count += out_arrays["count"][:take].sum()
        loss_sum += float(out_arrays["loss"][:take].mean())
        for real, corr in zip(out_arrays["real_labels"][:take].reshape(-1), out_arrays["correct"][:take].reshape(-1)):
            per_class[int(real)][0] += corr
            per_class[int(real)][1] += 1
        return out_arrays

    out = None
    pending = None
    # long protocol runs (NUM_TEST_TASKS=10000, reference
    # test_net_few_shot.py:57) get a running stat line every ~50 steps;
    # interleaved validations stay below the period and log nothing extra
    log_every = 50
    steps_done = 0
    t0 = time.perf_counter()
    with build_few_shot_loader(
        cfg, split, num_steps=num_steps, episodes_per_step=e, episode_range=ep_range,
        sampler_wrap=sampler_wrap,
    ) as loader:
        for batch in loader:
            # dispatch step N before fetching step N-1: host-side metric
            # accounting overlaps the device's next batch
            batch_dev = retry_transient(
                lambda: shard_batch(batch, mesh, global_e=e), "eval batch upload"  # noqa: B023
            )
            fut = eval_step(variables, batch_dev)
            if pending is not None:
                out = consume(jax.device_get(pending))
                steps_done += 1
                if steps_done % log_every == 0:
                    log_json_stats(
                        {
                            "_type": f"eval_{split}_iter",
                            "episodes": int(num_tasks - episodes_left),
                            "of": num_tasks,
                            "top1_acc": round(float(top1) / max(count, 1) * 100.0, 2),
                            "eps_per_sec": round((num_tasks - episodes_left) / max(time.perf_counter() - t0, 1e-9), 2),
                        },
                        logger,
                    )
            pending = fut
        if pending is not None:
            out = consume(jax.device_get(pending))
    stats = {
        "top1_acc": float(top1) / max(count, 1) * 100.0,
        "top5_acc": float(top5) / max(count, 1) * 100.0,
        "loss": loss_sum / max(num_steps, 1),
        "episodes": int(count / max(out["count"][0], 1)) if out is not None else 0,
    }
    src = cfg.TEST if split != "train" else cfg.TRAIN
    class_names = list(src.get("CLASS_NAME", []) or [])
    per_class_acc = {
        class_names[k] if k < len(class_names) else str(k): round(float(v[0]) / max(float(v[1]), 1.0) * 100.0, 2)
        for k, v in sorted(per_class.items())
    }
    log_json_stats({"_type": f"eval_{split}", **stats}, logger)
    log_json_stats({"_type": "eval_per_class", **per_class_acc}, logger)
    return stats


def train_few_shot(cfg) -> Dict[str, float]:
    setup_logging(cfg.get("OUTPUT_DIR", None))
    from clip_fsar_tpu.parallel.mesh import maybe_init_distributed

    maybe_init_distributed(cfg)
    mesh = build_mesh(cfg)
    e = int(cfg.TPU.get("EPISODES_PER_STEP", 1))
    from clip_fsar_tpu.parallel.mesh import data_axis_size

    rounded = round_to_data_mesh(e, mesh)
    if rounded != e:
        logger.info(
            "TPU.EPISODES_PER_STEP=%d is not divisible by the %d-device data "
            "mesh — rounding up to %d episodes/step", e, data_axis_size(mesh), rounded,
        )
        e = rounded
    check_batch_divisible(e, mesh)
    logger.info("mesh: %s devices on axis 'data'; %d episodes/step", mesh.devices.size, e)

    rng = jax.random.PRNGKey(int(cfg.get("RANDOM_SEED", 0)))
    model = build_few_shot_model(cfg, rng, flow="train")
    tx = build_optimizer(cfg, model.variables["params"], name_prefix="head")
    state = build_state(cfg, model, tx)

    if cfg.get("LOG_MODEL_INFO", False):
        from clip_fsar_tpu.utils.misc import log_model_info

        log_model_info(state.params, label=f"{cfg.VIDEO.HEAD.NAME}/{cfg.VIDEO.HEAD.BACKBONE_NAME}")

    ckpt = Checkpointer(cfg.OUTPUT_DIR)
    resumed = auto_resume(cfg, ckpt, state)
    start_iter = 0
    if resumed is not None:
        state = resumed
        # optimizer steps -> loader iterations (MultiSteps counts micro-steps)
        start_iter = int(state.step)
        logger.info("auto-resumed at iteration %d", start_iter)
    else:
        from clip_fsar_tpu.train.pretrain import load_train_checkpoint_file

        loaded_vars, ok = load_train_checkpoint_file(cfg, model.variables)
        if ok:
            state = state.replace(params=loaded_vars["params"], batch_stats=loaded_vars.get("batch_stats"))
            if state.ema_params is not None:
                state = state.replace(ema_params=loaded_vars["params"])
    state = shard_params(state, mesh)

    # TPU.TRAIN_FRAME_BANK: the train split's stretched frames live in HBM
    # once; the loader ships row indices + crop/flip params instead of
    # pixels and the jitted step assembles clips on device — identical
    # augmentation distribution, ~4 orders of magnitude less upload per
    # step (data/frame_bank.py module docstring; PERFORMANCE.md
    # "Train-path attribution")
    train_bank_ctx = None
    train_sampler_wrap = None
    if bool(cfg.TPU.get("TRAIN_FRAME_BANK", False)):
        from clip_fsar_tpu.data.frame_bank import TrainIndexEpisodeSampler, make_bank_train_context

        train_bank_ctx = make_bank_train_context(cfg, model, mesh, tx)
        train_sampler_wrap = lambda s: TrainIndexEpisodeSampler(s, train_bank_ctx.table)  # noqa: E731
        train_step = train_bank_ctx.train_step
    else:
        train_step = jax.jit(make_train_step(model.head, tx, cfg, model.text_train, model.text_test), donate_argnums=0)

    num_train_tasks = int(cfg.TRAIN.NUM_TRAIN_TASKS)
    val_every = int(cfg.TRAIN.get("VAL_FRE_ITER", 0) or 0)
    num_val_tasks = int(cfg.TRAIN.get("NUM_VAL_TASKS", 500))

    loss_meter = ScalarMeter(int(cfg.get("LOG_PERIOD", 10)))
    t_meter = ScalarMeter(int(cfg.get("LOG_PERIOD", 10)))
    dropout_rng = jax.random.PRNGKey(int(cfg.get("RANDOM_SEED", 0)) + 1)
    best = {"top1_acc": 0.0}

    # jit the eval step ONCE: interleaved validation (and its EMA pass)
    # would otherwise recompile the tower on every VAL_FRE_ITER boundary.
    # With TPU.EVAL_FRAME_BANK the bank context plays that role (one
    # build + one compile, cached on the model).
    interleaved_eval_step = None
    interleaved_bank_ctx = None
    if val_every:
        if bool(cfg.TPU.get("EVAL_FRAME_BANK", False)):
            from clip_fsar_tpu.data.frame_bank import make_bank_eval_context

            # interleaved validation runs on the VAL split (reference
            # train_net_few_shot.py:78-82 eval_epoch over the val loader)
            interleaved_bank_ctx = make_bank_eval_context(cfg, model, mesh, "val")
        else:
            interleaved_eval_step = jax.jit(
                make_eval_step(model.head, cfg, model.text_train, model.text_test),
                out_shardings=replicated(mesh),
            )

    remaining = max(num_train_tasks - start_iter, 0)
    # start_step=start_iter: a resumed run CONTINUES the (seed, step)
    # episode stream instead of replaying episodes 0..remaining-1;
    # episode_range: each host decodes only its local slice of the batch
    with build_few_shot_loader(
        cfg, "train", num_steps=remaining, episodes_per_step=e, start_step=start_iter,
        episode_range=local_episode_range(e, mesh), sampler_wrap=train_sampler_wrap,
    ) as loader:
        cur_iter = start_iter
        log_period = int(cfg.get("LOG_PERIOD", 10))
        logger.info("train loop: %d iterations x %d episodes/step (first step compiles the tower)", remaining, e)
        t_last, iters_last = time.perf_counter(), cur_iter
        for batch in loader:
            lr = get_lr_at_epoch(cfg, epoch_for_iter(cfg, cur_iter))
            # uploads and eager RNG ops are retried on transient device
            # pressure (shared-chip tenant spikes); the donated train step
            # itself is not retryable and is left to fail loudly.
            # Multi-process caveat: one host sleeping in the retry (or
            # raising after exhausting it) leaves peers blocked in the
            # step's collectives — an asymmetric failure becomes a
            # cross-host hang that only the stall watchdog
            # (tools/supervise_train.py) reaps, by killing the whole job.
            dropout_rng, step_rng = retry_transient(
                lambda: jax.random.split(dropout_rng), "rng split"  # noqa: B023
            )
            batch_dev = retry_transient(
                lambda: shard_batch(batch, mesh, global_e=e), "train batch upload"  # noqa: B023
            )
            if train_bank_ctx is not None:
                state, metrics = train_step(state, batch_dev, jnp.float32(lr), step_rng, train_bank_ctx.bank)
            else:
                state, metrics = train_step(state, batch_dev, jnp.float32(lr), step_rng)
            cur_iter += 1

            if cur_iter % log_period == 0 or cur_iter == num_train_tasks:
                metrics = jax.device_get(metrics)  # sync point only when logging
                loss_meter.add_value(float(metrics["loss"]))
                # whole-window wall rate: steps are dispatched async, so a
                # single iteration's wall time would count the queue drain
                # of the sync above against one step and lie by ~LOG_PERIOD
                now = time.perf_counter()
                t_meter.add_value((now - t_last) / max(cur_iter - iters_last, 1))
                t_last, iters_last = now, cur_iter
                log_json_stats(
                    {
                        "_type": "train_iter",
                        "iter": f"{cur_iter}/{num_train_tasks}",
                        "loss": round(loss_meter.get_win_median(), 5),
                        "top1": round(float(metrics["top1"]) * 100, 2),
                        "lr": lr,
                        "eps_per_sec": round(e / max(t_meter.get_win_median(), 1e-9), 3),
                    },
                    logger,
                )

            if val_every and cur_iter % val_every == 0:
                ckpt.save(cur_iter, jax.device_get(state))
                stats = evaluate(
                    cfg, model, jax.device_get(state).model_variables, mesh, num_val_tasks,
                    split="val", eval_step=interleaved_eval_step, bank_ctx=interleaved_bank_ctx,
                )
                if stats["top1_acc"] >= best["top1_acc"]:
                    best = stats
                if state.ema_params is not None:
                    evaluate(
                        cfg, model, jax.device_get(state).ema_variables(), mesh, num_val_tasks,
                        split="val", eval_step=interleaved_eval_step, bank_ctx=interleaved_bank_ctx,
                    )
                t_last, iters_last = time.perf_counter(), cur_iter  # exclude val/ckpt from the rate window

    final_state = jax.device_get(state)
    ckpt.save(max(num_train_tasks, 1), final_state)
    ckpt.close()
    logger.info("training done at iter %d; best interleaved top1=%.3f", num_train_tasks, best["top1_acc"])
    return {"best_val_top1": best["top1_acc"], "final_iter": num_train_tasks}


def test_few_shot(cfg) -> Dict[str, float]:
    setup_logging(cfg.get("OUTPUT_DIR", None))
    from clip_fsar_tpu.parallel.mesh import maybe_init_distributed

    maybe_init_distributed(cfg)  # same multi-host join as train_few_shot
    mesh = build_mesh(cfg)
    rng = jax.random.PRNGKey(int(cfg.get("RANDOM_SEED", 0)))
    model = build_few_shot_model(cfg, rng, flow="test")

    # test-time checkpoint search (reference checkpoint.py:452-529):
    # TEST path -> latest train checkpoint -> TRAIN path -> fresh weights
    from clip_fsar_tpu.train.pretrain import load_test_variables

    ckpt = Checkpointer(cfg.OUTPUT_DIR)
    tx = build_optimizer(cfg, model.variables["params"], name_prefix="head")
    template = build_state(cfg, model, tx)
    variables = load_test_variables(cfg, ckpt, template, model.variables)
    ckpt.close()

    num_tasks = int(cfg.TRAIN.get("NUM_TEST_TASKS", 10000))
    e = round_to_data_mesh(int(cfg.TEST.get("BATCH_SIZE", cfg.TPU.get("EPISODES_PER_STEP", 1))), mesh)
    return evaluate(cfg, model, variables, mesh, num_tasks, episodes_per_step=e)
