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
from typing import Any, Callable, NamedTuple, Optional

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


def epoch_for_iter(cfg, cur_iter: int, data_size: int = 0) -> float:
    """Few-shot trainers are iteration-driven.  Exact reference math
    (train_net_few_shot.py:58,65,95): data_size is OVERWRITTEN with
    SOLVER.STEPS_ITER before the loop, so the lr epoch at global iter i is
    i // STEPS_ITER + NUM_FOLDS * i / STEPS_ITER — the fractional term
    divides by STEPS_ITER too (for NUM_FOLDS=1 the schedule advances at
    ~2i/STEPS_ITER; a reference quirk, preserved).  ``data_size`` is
    accepted for backward compatibility and ignored."""
    steps_iter = int(cfg.SOLVER.get("STEPS_ITER", 1) or 1)
    cur_epoch = cur_iter // steps_iter
    num_folds = int(cfg.TRAIN.get("NUM_FOLDS", 1))
    return cur_epoch + num_folds * float(cur_iter) / max(steps_iter, 1)


# ---------------------------------------------------------------------------
# optimizer construction
# ---------------------------------------------------------------------------


def _path_parts(path, name_prefix: str = "") -> list:
    parts = [str(getattr(k, "key", getattr(k, "idx", k))).lower() for k in path]
    if name_prefix:
        parts = list(name_prefix.lower().split("/")) + parts
    return parts


def _reference_name_parts(parts: list) -> list:
    """Drop flax-internal norm-wrapper segments whose parent is a CLIP
    ``ln_*`` module: the reference's torch names for those params are
    ``ln_1.weight`` etc. — they contain neither "bn" nor "norm", so CLIP
    LayerNorms DO receive weight decay (reference optimizer.py:58-70).
    Everywhere else our authored module names mirror the torch names
    ("bn1", "norm_0", ...), so the wrapper segment is redundant anyway."""
    out = []
    for i, p in enumerate(parts):
        if p.startswith(("layernorm_", "batchnorm_", "groupnorm_")) and i > 0 and parts[i - 1].startswith("ln"):
            continue
        out.append(p)
    return out


def classify_param(parts: list) -> str:
    """Reference param grouping (models/utils/optimizer.py:58-70), same
    elif order, substring matching on reference-equivalent names:
      'no_decay' — "embd"/"cls_token" (wd 0)
      'bn'       — "bn"/"norm" (wd BN.WEIGHT_DECAY, lr_reduce group)
      'head'     — "head" (full wd, never lr-reduced)
      'rest'     — everything else (full wd, lr_reduce group)
    """
    name = ".".join(_reference_name_parts(parts))
    if "embd" in name or "cls_token" in name:
        return "no_decay"
    if "bn" in name or "norm" in name:
        return "bn"
    if "head" in name:
        return "head"
    return "rest"


def param_groups(params, name_prefix: str = "") -> Any:
    """Tree of group labels; ``name_prefix`` positions the tree inside the
    reference's model namespace (few-shot heads live under ``head.``)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: classify_param(_path_parts(path, name_prefix)), params
    )


def make_decay_mask(params, name_prefix: str = "") -> Any:
    """True -> gets SOLVER.WEIGHT_DECAY; False -> BN/no-decay groups."""
    return jax.tree_util.tree_map(lambda g: g in ("rest", "head"), param_groups(params, name_prefix))


def make_fixed_mask(params, cfg, name_prefix: str = "") -> Any:
    """True -> parameter is frozen.  Mirrors reference optimizer.py:50-57
    (TRAIN.FIXED_WEIGHTS matches the 2nd/3rd component of the torch name,
    i.e. our first two path segments) plus TRAIN.ONLY_LINEAR (head-only)."""
    fixed = set(cfg.TRAIN.get("FIXED_WEIGHTS", []) or []) if "TRAIN" in cfg else set()
    only_linear = bool(cfg.TRAIN.get("ONLY_LINEAR", False)) if "TRAIN" in cfg else False

    def is_fixed(path, _):
        parts = _path_parts(path, name_prefix)
        if any(p in fixed for p in parts[:2]):
            return True
        if only_linear and "head" not in ".".join(_reference_name_parts(parts)):
            return True
        return False

    return jax.tree_util.tree_map_with_path(is_fixed, params)


def scale_by_lars(
    momentum: float = 0.9,
    trust_coefficient: float = 0.001,
    wd_tree=None,
    nesterov: bool = False,
):
    """LARS (reference models/utils/lars.py:75-117, exact math):
    local_lr = eta * ||p|| / (||g|| + wd * ||p||) with the RAW gradient
    norm (weight decay enters the denominator as wd*||p||, not folded into
    g first); the update is (g + wd*p) * local_lr, accumulated in the
    momentum buffer.  ``wd_tree`` gives the per-leaf weight decay (the
    reference's per-group wd).  One deliberate divergence, see PARITY.md:
    the reference multiplies the CURRENT lr into the momentum buffer; here
    lr is applied after the transformation (apply_lr), so under a varying
    schedule the momentum history is weighted by the current lr instead of
    each step's historical lr."""

    def init_fn(params):
        return {"momentum": jax.tree_util.tree_map(jnp.zeros_like, params)}

    def update_fn(updates, state, params=None):
        def one(g, p, m, wd):
            p_norm = jnp.linalg.norm(p.reshape(-1))
            g_norm = jnp.linalg.norm(g.reshape(-1))
            local_lr = jnp.where(
                (p_norm > 0) & (g_norm > 0),
                trust_coefficient * p_norm / (g_norm + wd * p_norm),
                1.0,
            )
            d = (g + wd * p) * local_lr
            buf = momentum * m + d
            return (d + momentum * buf if nesterov else buf), buf

        wds = wd_tree if wd_tree is not None else jax.tree_util.tree_map(lambda _: 0.0, updates)
        out = jax.tree_util.tree_map(one, updates, params, state["momentum"], wds)
        upd = jax.tree_util.tree_map(lambda t: t[0], out, is_leaf=lambda t: isinstance(t, tuple))
        new_m = jax.tree_util.tree_map(lambda t: t[1], out, is_leaf=lambda t: isinstance(t, tuple))
        return upd, {"momentum": new_m}

    return optax.GradientTransformation(init_fn, update_fn)


class _CondMultiStepsState(NamedTuple):
    mini_step: jnp.ndarray  # int32, 0..k-1
    acc: Any  # gradient SUMS over the open window
    inner_state: Any


def cond_multi_steps(inner: optax.GradientTransformation, k: int) -> optax.GradientTransformation:
    """Gradient accumulation that only pays for what it runs.

    Same semantics as ``optax.MultiSteps(inner, every_k_schedule=k)`` —
    accumulate k micro-step gradients, emit ``inner.update`` of their mean
    on the k-th, zero updates otherwise — but via ``lax.cond``, so the
    inner optimizer executes ONLY on emitting steps.  optax.MultiSteps
    instead runs the full inner update every micro-step and
    select-discards it leaf-by-leaf (MultiSteps.update builds
    ``jnp.where(emit, new, old)`` over every inner-state leaf), which at
    the flagship shape is ~6 ms/step of select/multiply passes over a
    flat 89M-param vector.  Accumulation is sum-then-divide (vs
    MultiSteps' running mean) — numerically at least as good.
    """

    def init(params):
        return _CondMultiStepsState(
            mini_step=jnp.zeros((), jnp.int32),
            acc=jax.tree_util.tree_map(jnp.zeros_like, params),
            inner_state=inner.init(params),
        )

    def update(grads, state, params=None):
        acc = jax.tree_util.tree_map(lambda a, g: a + g, state.acc, grads)

        def do_emit(args):
            acc, inner_state = args
            mean = jax.tree_util.tree_map(lambda a: a / k, acc)
            updates, new_inner = inner.update(mean, inner_state, params)
            return updates, new_inner, jax.tree_util.tree_map(jnp.zeros_like, acc)

        def do_skip(args):
            acc, inner_state = args
            return jax.tree_util.tree_map(jnp.zeros_like, grads), inner_state, acc

        updates, inner_state, acc = jax.lax.cond(
            state.mini_step >= k - 1, do_emit, do_skip, (acc, state.inner_state)
        )
        return updates, _CondMultiStepsState((state.mini_step + 1) % k, acc, inner_state)

    return optax.GradientTransformation(init, update)


def build_optimizer(cfg, params, name_prefix: str = "") -> optax.GradientTransformation:
    """Construct the gradient transformation WITHOUT the learning-rate
    scaling: the trainer multiplies the emitted updates by ``-lr`` each
    step (see ``apply_lr``), mirroring the reference's per-iteration
    ``set_lr`` (train_net_few_shot.py:95-96).  With MultiSteps wrapping,
    the lr of the boundary iteration applies — exactly torch's behavior
    where ``optimizer.step()`` uses the latest lr.

    Group semantics (reference optimizer.py:43-83 + set_lr:146-156):
      * decay: 'rest'/'head' -> SOLVER.WEIGHT_DECAY; 'bn' ->
        BN.WEIGHT_DECAY; 'embd'/'cls_token' -> 0;
      * BN.WB_LOCK freezes the bn group entirely;
      * TRAIN.LR_REDUCE and TRAIN.FINE_TUNE scale the 'bn'+'rest' groups'
        lr by 1/10 (the head keeps full lr for finetuning);
      * TRAIN.FIXED_WEIGHTS / TRAIN.ONLY_LINEAR freeze parameters.

    ``name_prefix`` positions the param tree inside the reference model
    namespace — few-shot trainers pass "head" because the episodic heads
    own the whole model (reference names are ``head.backbone...``).
    """
    s = cfg.SOLVER
    method = s.get("OPTIM_METHOD", "adam")
    wd = float(s.get("WEIGHT_DECAY", 0.0) or 0.0)
    bn_wd = float(cfg.BN.get("WEIGHT_DECAY", 0.0) or 0.0) if "BN" in cfg else 0.0
    wb_lock = bool(cfg.BN.get("WB_LOCK", False)) if "BN" in cfg else False
    groups = param_groups(params, name_prefix)
    decay_mask = jax.tree_util.tree_map(lambda g: g in ("rest", "head"), groups)
    bn_mask = jax.tree_util.tree_map(lambda g: g == "bn", groups)

    chain = []
    clip_norm = cfg.TRAIN.get("CLIP_GRAD_NORM", None)
    if clip_norm:
        chain.append(optax.clip_by_global_norm(float(clip_norm)))
    if method == "adam":
        if wd:
            chain.append(optax.add_decayed_weights(wd, mask=decay_mask))  # torch-L2: before moments
        if bn_wd:
            chain.append(optax.add_decayed_weights(bn_wd, mask=bn_mask))
        core = optax.scale_by_adam(b1=0.9, b2=0.999)
        chain.append(core)
    elif method == "adamw":
        core = optax.scale_by_adam(b1=0.9, b2=0.999)
        chain.append(core)
        if wd:  # decoupled: after moments
            chain.append(optax.add_decayed_weights(wd, mask=decay_mask))
    elif method == "sgd":
        if wd:
            chain.append(optax.add_decayed_weights(wd, mask=decay_mask))
        if bn_wd:
            chain.append(optax.add_decayed_weights(bn_wd, mask=bn_mask))
        core = optax.trace(decay=float(s.get("MOMENTUM", 0.9)), nesterov=bool(s.get("NESTEROV", False)))
        chain.append(core)
    elif method == "lars":
        # weight decay goes INSIDE the LARS rule (per-group wd in the
        # trust-ratio denominator, reference lars.py:96-103) — folding it
        # into the gradient first would change ||g||
        wd_tree = jax.tree_util.tree_map(
            lambda g: wd if g in ("rest", "head") else (bn_wd if g == "bn" else 0.0), groups
        )
        chain.append(
            scale_by_lars(
                momentum=float(s.get("MOMENTUM", 0.9)),
                wd_tree=wd_tree,
                nesterov=bool(s.get("NESTEROV", False)),
            )
        )
    else:
        raise NotImplementedError(f"Unsupported OPTIM_METHOD {method!r}")

    # lr_reduce ÷10 for the non-head groups when finetuning (set_lr:146-156)
    lr_reduce = bool(cfg.TRAIN.get("LR_REDUCE", False)) and bool(cfg.TRAIN.get("FINE_TUNE", False)) if "TRAIN" in cfg else False
    if lr_reduce:
        reduce_mask = jax.tree_util.tree_map(lambda g: g in ("bn", "rest"), groups)
        chain.append(optax.masked(optax.scale(0.1), reduce_mask))

    # frozen parameters: FIXED_WEIGHTS, ONLY_LINEAR, BN.WB_LOCK
    fixed_mask = make_fixed_mask(params, cfg, name_prefix)
    if wb_lock:
        fixed_mask = jax.tree_util.tree_map(lambda f, b: bool(f or b), fixed_mask, bn_mask)
    if any(jax.tree_util.tree_leaves(fixed_mask)):
        chain.append(optax.masked(optax.set_to_zero(), fixed_mask))

    accum = int(cfg.TRAIN.get("BATCH_SIZE_PER_TASK", 1))
    flat = bool(cfg.TPU.get("FLAT_OPTIMIZER", True)) if "TPU" in cfg else True
    if flat and method != "lars":
        # Flatten the moment core: per-leaf optimizer math is launch-bound
        # on TPU (~370 tiny select/add fusions = 71 ms of a 488 ms
        # ViT-B/16 step, PERFORMANCE.md trace) — ravel the params once and
        # run the adam/momentum moments as a few whole-model vector ops.
        # The masked decay/scale/freeze stages stay at tree level
        # BEFORE/AFTER the flat core (their masks are per-leaf), and
        # accumulation wraps the WHOLE chain so clipping applies to the
        # window mean and decoupled (adamw) decay fires only on emitting
        # steps — identical semantics to the non-flat MultiSteps path.
        # LARS keeps the tree form — its trust ratio is
        # per-parameter-tensor by definition.
        idx = next(i for i, t in enumerate(chain) if t is core)
        pre, post = chain[:idx], chain[idx + 1 :]
        tx = optax.chain(*pre, optax.flatten(core), *post)
        return cond_multi_steps(tx, accum) if accum > 1 else tx
    tx = optax.chain(*chain)
    if accum > 1:
        tx = cond_multi_steps(tx, accum)
    return tx


def apply_lr(updates, lr) -> Any:
    """Scale raw transformation output by -lr (descent direction)."""
    return jax.tree_util.tree_map(lambda u: -lr * u, updates)
