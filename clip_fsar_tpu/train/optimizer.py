"""Optimizers + LR policies (optax).

Behavioral parity with reference models/utils/{optimizer,lr_policy}.py:

  * LR policies: cosine, steps_with_relative_lrs, linear warmup that
    interpolates from WARMUP_START_LR to policy(WARMUP_EPOCHS)
    (lr_policy.py:10-56);
  * torch-L2 weight-decay semantics: decay added to the gradient *before*
    the Adam moments (torch.optim.Adam(weight_decay=...)), not decoupled;
  * parameter grouping quirk preserved (optimizer.py:43-83): parameters
    whose name contains "bn"/"norm" get BN.WEIGHT_DECAY (default 0);
    everything else — including CLIP's ln_* LayerNorms, positional
    embeddings — gets SOLVER.WEIGHT_DECAY, matching the reference's
    substring matching on torch names;
  * gradient accumulation via optax.MultiSteps (BATCH_SIZE_PER_TASK);
  * LARS for SSL pretraining parity.

The learning rate is injected per step (``optax.inject_hyperparams``-free:
we scale by a schedule-free placeholder and pass lr explicitly), because
the reference recomputes lr from the iteration index every step
(train_net_few_shot.py:95-96).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax


# ---------------------------------------------------------------------------
# LR policies
# ---------------------------------------------------------------------------


def lr_cosine(cfg, cur_epoch: float) -> float:
    s = cfg.SOLVER
    return float(s.BASE_LR) * (math.cos(math.pi * cur_epoch / float(s.MAX_EPOCH)) + 1.0) * 0.5


def lr_steps_with_relative_lrs(cfg, cur_epoch: float) -> float:
    s = cfg.SOLVER
    steps = list(s.STEPS) + [s.MAX_EPOCH]
    ind = 0
    for ind, step in enumerate(steps):
        if cur_epoch < step:
            break
    return float(s.LRS[ind - 1]) * float(s.BASE_LR)


_POLICIES = {"cosine": lr_cosine, "steps_with_relative_lrs": lr_steps_with_relative_lrs}


def get_lr_at_epoch(cfg, cur_epoch: float) -> float:
    """Policy LR with linear warmup below WARMUP_EPOCHS (lr_policy.py:10-27)."""
    policy = _POLICIES[cfg.SOLVER.LR_POLICY]
    lr = policy(cfg, cur_epoch)
    warmup = float(cfg.SOLVER.get("WARMUP_EPOCHS", 0))
    if cur_epoch < warmup:
        lr_start = float(cfg.SOLVER.WARMUP_START_LR)
        lr_end = policy(cfg, warmup)
        lr = cur_epoch * (lr_end - lr_start) / warmup + lr_start
    return lr


def epoch_for_iter(cfg, cur_iter: int, data_size: int) -> float:
    """Few-shot trainers are iteration-driven: the 'epoch' is
    cur_iter // SOLVER.STEPS_ITER plus a fractional term
    (train_net_few_shot.py:65,95)."""
    steps_iter = int(cfg.SOLVER.get("STEPS_ITER", 1) or 1)
    cur_epoch = cur_iter // steps_iter
    num_folds = int(cfg.TRAIN.get("NUM_FOLDS", 1))
    return cur_epoch + num_folds * float(cur_iter) / max(data_size, 1)


# ---------------------------------------------------------------------------
# optimizer construction
# ---------------------------------------------------------------------------


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path).lower()


def make_decay_mask(params, bn_keywords=("bn", "batchnorm", "norm")) -> Any:
    """True -> gets SOLVER.WEIGHT_DECAY; False -> BN group (no decay)."""

    def is_decayed(path, _):
        p = _path_str(path)
        parts = p.split("/")
        for part in parts:
            for kw in bn_keywords:
                if part.startswith(kw) or part.startswith("layernorm") or part.startswith("groupnorm"):
                    return False
        return True

    return jax.tree_util.tree_map_with_path(is_decayed, params)


def scale_by_lars(momentum: float = 0.9, trust_coefficient: float = 0.001, eps: float = 1e-8):
    """LARS layer-wise adaptive scaling (capability of models/utils/lars.py)."""

    def init_fn(params):
        return {"momentum": jax.tree_util.tree_map(jnp.zeros_like, params)}

    def update_fn(updates, state, params=None):
        def one(g, p, m):
            p_norm = jnp.linalg.norm(p.reshape(-1))
            g_norm = jnp.linalg.norm(g.reshape(-1))
            trust = jnp.where((p_norm > 0) & (g_norm > 0), trust_coefficient * p_norm / (g_norm + eps), 1.0)
            return momentum * m + trust * g

        new_m = jax.tree_util.tree_map(one, updates, params, state["momentum"])
        return new_m, {"momentum": new_m}

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(cfg, params) -> optax.GradientTransformation:
    """Construct the gradient transformation WITHOUT the learning-rate
    scaling: the trainer multiplies the emitted updates by ``-lr`` each
    step (see ``apply_lr``), mirroring the reference's per-iteration
    ``set_lr`` (train_net_few_shot.py:95-96).  With MultiSteps wrapping,
    the lr of the boundary iteration applies — exactly torch's behavior
    where ``optimizer.step()`` uses the latest lr.
    """
    s = cfg.SOLVER
    method = s.get("OPTIM_METHOD", "adam")
    wd = float(s.get("WEIGHT_DECAY", 0.0) or 0.0)
    bn_wd = float(cfg.BN.get("WEIGHT_DECAY", 0.0) or 0.0) if "BN" in cfg else 0.0
    decay_mask = make_decay_mask(params)
    inv_mask = jax.tree_util.tree_map(lambda m: not m, decay_mask)

    chain = []
    clip_norm = cfg.TRAIN.get("CLIP_GRAD_NORM", None)
    if clip_norm:
        chain.append(optax.clip_by_global_norm(float(clip_norm)))
    if method == "adam":
        if wd:
            chain.append(optax.add_decayed_weights(wd, mask=decay_mask))  # torch-L2: before moments
        if bn_wd:
            chain.append(optax.add_decayed_weights(bn_wd, mask=inv_mask))
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999))
    elif method == "adamw":
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999))
        if wd:  # decoupled: after moments
            chain.append(optax.add_decayed_weights(wd, mask=decay_mask))
    elif method == "sgd":
        if wd:
            chain.append(optax.add_decayed_weights(wd, mask=decay_mask))
        chain.append(optax.trace(decay=float(s.get("MOMENTUM", 0.9)), nesterov=bool(s.get("NESTEROV", False))))
    elif method == "lars":
        if wd:
            chain.append(optax.add_decayed_weights(wd, mask=decay_mask))
        chain.append(scale_by_lars(momentum=float(s.get("MOMENTUM", 0.9))))
    else:
        raise NotImplementedError(f"Unsupported OPTIM_METHOD {method!r}")

    tx = optax.chain(*chain)
    accum = int(cfg.TRAIN.get("BATCH_SIZE_PER_TASK", 1))
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx


def apply_lr(updates, lr) -> Any:
    """Scale raw transformation output by -lr (descent direction)."""
    return jax.tree_util.tree_map(lambda u: -lr * u, updates)
