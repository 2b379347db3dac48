"""LR policy parity, optimizer semantics vs torch, train-step behavior,
checkpoint roundtrip."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from clip_fsar_tpu.config import Config
from clip_fsar_tpu.train.optimizer import (
    apply_lr,
    build_optimizer,
    epoch_for_iter,
    get_lr_at_epoch,
    lr_steps_with_relative_lrs,
    make_decay_mask,
)


def solver_cfg(**kw):
    base = dict(
        BASE_LR=1e-5, LR_POLICY="steps_with_relative_lrs", STEPS=[0, 4, 6], LRS=[1, 0.1, 0.01],
        MAX_EPOCH=10, WARMUP_EPOCHS=1, WARMUP_START_LR=1e-6, OPTIM_METHOD="adam",
        WEIGHT_DECAY=5e-5, MOMENTUM=0.9, NESTEROV=True, STEPS_ITER=700,
    )
    base.update(kw)
    return Config({"SOLVER": base, "TRAIN": {"NUM_FOLDS": 1, "BATCH_SIZE_PER_TASK": 1}, "BN": {"WEIGHT_DECAY": 0.0}})


def test_steps_with_relative_lrs():
    cfg = solver_cfg()
    assert lr_steps_with_relative_lrs(cfg, 0.0) == pytest.approx(1e-5)
    assert lr_steps_with_relative_lrs(cfg, 3.9) == pytest.approx(1e-5)
    assert lr_steps_with_relative_lrs(cfg, 4.0) == pytest.approx(1e-6)
    assert lr_steps_with_relative_lrs(cfg, 6.5) == pytest.approx(1e-7)


def test_warmup_interpolates_to_policy():
    cfg = solver_cfg()
    assert get_lr_at_epoch(cfg, 0.0) == pytest.approx(1e-6)
    # warmup target is policy(WARMUP_EPOCHS) = 1e-5
    assert get_lr_at_epoch(cfg, 0.5) == pytest.approx((1e-6 + 1e-5) / 2)
    assert get_lr_at_epoch(cfg, 1.0) == pytest.approx(1e-5)
    assert get_lr_at_epoch(cfg, 5.0) == pytest.approx(1e-6)


def test_epoch_for_iter():
    """Exact reference math (train_net_few_shot.py:58,65,95): lr epoch =
    i // STEPS_ITER + NUM_FOLDS * i / STEPS_ITER — the fractional term
    divides by STEPS_ITER (data_size is overwritten with STEPS_ITER in
    the reference before the loop), so the schedule advances at ~2x the
    naive i/STEPS_ITER rate for NUM_FOLDS=1."""
    cfg = solver_cfg()
    assert epoch_for_iter(cfg, 0) == pytest.approx(0.0)
    assert epoch_for_iter(cfg, 350) == pytest.approx(0.5)  # 0 + 350/700
    assert epoch_for_iter(cfg, 1400) == pytest.approx(4.0)  # 2 + 1400/700
    cfg.TRAIN.NUM_FOLDS = 2
    assert epoch_for_iter(cfg, 700) == pytest.approx(3.0)  # 1 + 2*700/700


def test_cosine_policy():
    cfg = solver_cfg(LR_POLICY="cosine", WARMUP_EPOCHS=0)
    assert get_lr_at_epoch(cfg, 0.0) == pytest.approx(1e-5)
    assert get_lr_at_epoch(cfg, 5.0) == pytest.approx(0.5e-5)
    assert get_lr_at_epoch(cfg, 10.0) == pytest.approx(0.0, abs=1e-12)


def test_decay_mask_matches_reference_grouping():
    """Pin every group against the reference's torch-name substring rules
    (reference optimizer.py:58-70): CLIP ``ln_*`` params contain neither
    "bn" nor "norm" in torch, so they DO get weight decay; ``bn*``/``norm*``
    go to the BN group; ``embd``/``cls_token`` get none; everything in the
    few-shot head tree that matches nothing is the "head" group."""
    from clip_fsar_tpu.train.optimizer import param_groups

    params = {
        "backbone": {
            "ln_1": {"LayerNorm_0": {"scale": np.ones(3), "bias": np.zeros(3)}},
            "bn1": {"BatchNorm_0": {"scale": np.ones(3), "bias": np.zeros(3)}},
            "conv1": {"kernel": np.ones((3, 3))},
            "positional_embedding": np.ones((5, 3)),
        },
        "context2": {"norm_0": {"scale": np.ones(3)}},
        "scale": np.ones(1),
    }
    mask = make_decay_mask(params, name_prefix="head")
    # CLIP ln_* DID get decay in the reference (torch name "ln_1.weight")
    assert mask["backbone"]["ln_1"]["LayerNorm_0"]["scale"] is True
    assert mask["backbone"]["ln_1"]["LayerNorm_0"]["bias"] is True
    # "bn"/"norm" named components go to the BN group (BN.WEIGHT_DECAY)
    assert mask["backbone"]["bn1"]["BatchNorm_0"]["scale"] is False
    assert mask["context2"]["norm_0"]["scale"] is False
    assert mask["backbone"]["conv1"]["kernel"] is True
    assert mask["backbone"]["positional_embedding"] is True  # no "embd" substring
    assert mask["scale"] is True

    groups = param_groups(params, name_prefix="head")
    assert groups["backbone"]["ln_1"]["LayerNorm_0"]["scale"] == "head"
    assert groups["backbone"]["bn1"]["BatchNorm_0"]["scale"] == "bn"
    assert groups["context2"]["norm_0"]["scale"] == "bn"
    assert groups["scale"] == "head"

    # video-transformer names: pos_embd/cls_token -> no decay; bare tree
    # (classification task) distinguishes head vs rest
    vparams = {
        "backbone": {"pos_embd": np.ones(3), "cls_token": np.ones(3), "blocks_0": {"fc": {"kernel": np.ones((2, 2))}}},
        "head": {"out": {"kernel": np.ones((2, 2))}},
    }
    vgroups = param_groups(vparams)
    assert vgroups["backbone"]["pos_embd"] == "no_decay"
    assert vgroups["backbone"]["cls_token"] == "no_decay"
    assert vgroups["backbone"]["blocks_0"]["fc"]["kernel"] == "rest"
    assert vgroups["head"]["out"]["kernel"] == "head"


def test_fixed_weights_and_lr_reduce():
    """TRAIN.FIXED_WEIGHTS freezes matched top-level modules; LR_REDUCE +
    FINE_TUNE scales non-head groups' lr by 1/10 (reference
    optimizer.py:50-57, set_lr:146-156)."""
    from clip_fsar_tpu.config import Config

    params = {
        "backbone": {"conv1": {"kernel": jnp.ones((2, 2))}},
        "context2": {"ff_0": {"fc1": {"kernel": jnp.ones((2, 2))}}},
        "scale": jnp.ones(1),
    }
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    cfg = Config({
        "SOLVER": {"OPTIM_METHOD": "sgd", "WEIGHT_DECAY": 0.0, "BASE_LR": 1.0, "MOMENTUM": 0.0, "NESTEROV": False},
        "TRAIN": {"BATCH_SIZE_PER_TASK": 1, "FIXED_WEIGHTS": ["backbone"]},
        "BN": {"WEIGHT_DECAY": 0.0},
    })
    tx = build_optimizer(cfg, params, name_prefix="head")
    st = tx.init(params)
    upd, _ = tx.update(grads, st, params)
    np.testing.assert_allclose(np.asarray(upd["backbone"]["conv1"]["kernel"]), 0.0)  # frozen
    np.testing.assert_allclose(np.asarray(upd["scale"]), 1.0)

    cfg2 = Config({
        "SOLVER": {"OPTIM_METHOD": "sgd", "WEIGHT_DECAY": 0.0, "BASE_LR": 1.0, "MOMENTUM": 0.0, "NESTEROV": False},
        "TRAIN": {"BATCH_SIZE_PER_TASK": 1, "LR_REDUCE": True, "FINE_TUNE": True},
        "BN": {"WEIGHT_DECAY": 0.0},
    })
    # bare tree: backbone params are the lr-reduced "rest" group, head keeps lr
    bare = {"backbone": {"conv1": {"kernel": jnp.ones((2, 2))}}, "head": {"fc": {"kernel": jnp.ones((2, 2))}}}
    tx2 = build_optimizer(cfg2, bare)
    st2 = tx2.init(bare)
    upd2, _ = tx2.update(jax.tree_util.tree_map(jnp.ones_like, bare), st2, bare)
    np.testing.assert_allclose(np.asarray(upd2["backbone"]["conv1"]["kernel"]), 0.1)
    np.testing.assert_allclose(np.asarray(upd2["head"]["fc"]["kernel"]), 1.0)


def test_adam_matches_torch_l2_semantics():
    """Our chain (add_decayed_weights -> scale_by_adam -> -lr) must track
    torch.optim.Adam(weight_decay=wd) on dense params."""
    import torch

    wd, lr = 1e-2, 1e-3
    w0 = np.random.RandomState(0).randn(4, 3).astype(np.float32)
    grads_seq = [np.random.RandomState(i + 1).randn(4, 3).astype(np.float32) for i in range(5)]

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.Adam([tw], lr=lr, weight_decay=wd)
    for g in grads_seq:
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        topt.step()

    cfg = Config({
        "SOLVER": {"OPTIM_METHOD": "adam", "WEIGHT_DECAY": wd, "BASE_LR": lr, "MOMENTUM": 0.9, "NESTEROV": False},
        "TRAIN": {"BATCH_SIZE_PER_TASK": 1},
        "BN": {"WEIGHT_DECAY": 0.0},
    })
    params = {"dense": {"kernel": jnp.asarray(w0.copy())}}
    tx = build_optimizer(cfg, params)
    opt_state = tx.init(params)
    for g in grads_seq:
        updates, opt_state = tx.update({"dense": {"kernel": jnp.asarray(g)}}, opt_state, params)
        params = optax.apply_updates(params, apply_lr(updates, lr))
    np.testing.assert_allclose(np.asarray(params["dense"]["kernel"]), tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_multisteps_accumulation():
    cfg = Config({
        "SOLVER": {"OPTIM_METHOD": "sgd", "WEIGHT_DECAY": 0.0, "BASE_LR": 1.0, "MOMENTUM": 0.0, "NESTEROV": False},
        "TRAIN": {"BATCH_SIZE_PER_TASK": 2},
        "BN": {"WEIGHT_DECAY": 0.0},
    })
    params = {"w": jnp.zeros(2)}
    tx = build_optimizer(cfg, params)
    st = tx.init(params)
    g1, g2 = {"w": jnp.asarray([1.0, 0.0])}, {"w": jnp.asarray([0.0, 2.0])}
    u1, st = tx.update(g1, st, params)
    assert np.allclose(np.asarray(u1["w"]), 0.0)  # accumulation step: no update yet
    u2, st = tx.update(g2, st, params)
    params = optax.apply_updates(params, apply_lr(u2, 1.0))
    # mean of the two grads, lr=1
    np.testing.assert_allclose(np.asarray(params["w"]), [-0.5, -1.0], rtol=1e-6)


def test_cond_multi_steps_matches_optax_multisteps():
    """cond_multi_steps (lax.cond accumulation) == optax.MultiSteps over
    several full windows of adam updates."""
    import optax as _optax

    from clip_fsar_tpu.train.optimizer import cond_multi_steps

    k = 3
    core_a = _optax.scale_by_adam(b1=0.9, b2=0.999)
    core_b = _optax.scale_by_adam(b1=0.9, b2=0.999)
    tx_a = cond_multi_steps(core_a, k)
    tx_b = _optax.MultiSteps(core_b, every_k_schedule=k)
    params = {"w": jnp.asarray([0.5, -1.0, 2.0]), "b": jnp.asarray([0.1])}
    st_a, st_b = tx_a.init(params), tx_b.init(params)
    rng = np.random.RandomState(0)
    for i in range(2 * k + 1):
        g = jax.tree_util.tree_map(lambda p: jnp.asarray(rng.randn(*p.shape), jnp.float32), params)
        u_a, st_a = tx_a.update(g, st_a, params)
        u_b, st_b = tx_b.update(g, st_b, params)
        emit = (i + 1) % k == 0
        for ka in u_a:
            np.testing.assert_allclose(np.asarray(u_a[ka]), np.asarray(u_b[ka]), rtol=1e-5, atol=1e-7)
            if not emit:
                assert np.allclose(np.asarray(u_a[ka]), 0.0)


def test_flat_optimizer_matches_tree_chain_under_accumulation():
    """The FLAT_OPTIMIZER assembly must be semantically identical to the
    tree-level chain when accumulation + clipping + decoupled decay are all
    on: clipping applies to the window MEAN (not each micro-grad) and adamw
    decay fires only on emitting steps.  Regression for the round-2 flat
    path, which originally ran clip per micro-step and decay on every
    micro-step (k-fold overdecay)."""
    base = {
        "SOLVER": {"OPTIM_METHOD": "adamw", "WEIGHT_DECAY": 0.05, "BASE_LR": 1.0, "MOMENTUM": 0.9, "NESTEROV": False},
        "TRAIN": {"BATCH_SIZE_PER_TASK": 3, "CLIP_GRAD_NORM": 0.25},
        "BN": {"WEIGHT_DECAY": 0.0},
    }
    params0 = {"dense": {"kernel": jnp.asarray([[0.5, -1.0], [2.0, 0.3]])}, "bias": jnp.asarray([0.1, -0.2])}
    rng = np.random.RandomState(3)
    grads = [
        jax.tree_util.tree_map(lambda p: jnp.asarray(rng.randn(*p.shape) * 4.0, jnp.float32), params0)
        for _ in range(7)
    ]

    trajs = []
    for flat in (True, False):
        cfg = Config({**base, "TPU": {"FLAT_OPTIMIZER": flat}})
        params = params0
        tx = build_optimizer(cfg, params)
        st = tx.init(params)
        for i, g in enumerate(grads):
            u, st = tx.update(g, st, params)
            if (i + 1) % 3 != 0:  # accumulation-only step: no update, no decay
                assert all(np.allclose(np.asarray(x), 0.0) for x in jax.tree_util.tree_leaves(u))
            params = optax.apply_updates(params, apply_lr(u, 0.1))
        trajs.append(params)
    a, b = (jax.tree_util.tree_leaves(t) for t in trajs)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-7)


def test_train_step_updates_params_and_handles_nan():
    from clip_fsar_tpu.models.clip.model import ARCHS
    from clip_fsar_tpu.models.heads.clipfsar import CLIPFSARConfig, CLIPFSARHead
    from clip_fsar_tpu.train.loop import build_state
    from clip_fsar_tpu.train.step import make_train_step
    from tests.test_clipfsar_head import make_episode, WAY, T, C_TRAIN, C_TEST, DIM

    cfg = Config({
        "SOLVER": {"OPTIM_METHOD": "adam", "WEIGHT_DECAY": 0.0, "BASE_LR": 1e-3, "MOMENTUM": 0.9, "NESTEROV": False},
        "TRAIN": {"BATCH_SIZE_PER_TASK": 1, "USE_CLASSIFICATION": True, "USE_CLASSIFICATION_VALUE": 1.2},
        "BN": {"WEIGHT_DECAY": 0.0},
        "DATA": {
            "MEAN": [0.48145466, 0.4578275, 0.40821073],
            "STD": [0.26862954, 0.26130258, 0.27577711],
            "NUM_INPUT_FRAMES": T,
        },
        "MODEL": {"EMA": {"ENABLE": False, "DECAY": 0.999}},
    })
    head = CLIPFSARHead(arch=ARCHS["ViT-Tiny-Test"], head_cfg=CLIPFSARConfig(way=WAY, num_frames=T))
    ep = make_episode(0)
    text_train = jnp.asarray(np.random.RandomState(7).randn(C_TRAIN, DIM).astype(np.float32))
    text_test = jnp.asarray(np.random.RandomState(8).randn(C_TEST, DIM).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), ep, text_train, text_test, train=False)

    from clip_fsar_tpu.train.optimizer import build_optimizer as bo

    tx = bo(cfg, variables["params"])

    class Model:
        pass

    m = Model()
    m.variables = variables
    m.head = head
    state = build_state(cfg, m, tx)
    step = jax.jit(make_train_step(head, tx, cfg, text_train, text_test))

    batch = jax.tree_util.tree_map(lambda x: x[None].astype(np.uint8) if x.dtype in (np.float32, jnp.float32) else x[None], jax.device_get(ep))
    new_state, metrics = step(state, batch, jnp.float32(1e-3), jax.random.PRNGKey(1))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    before = jax.device_get(state.params["scale"])
    after = jax.device_get(new_state.params["scale"])
    assert not np.allclose(before, after)  # params moved

    # NaN batch -> zero grads, params unchanged, nan_skipped flag set
    bad = batch.replace(support_images=jnp.full_like(batch.support_images, 255), target_images=batch.target_images)
    bad = bad.replace(support_images=bad.support_images.astype(jnp.float32) * jnp.nan)
    st2, m2 = step(new_state, bad, jnp.float32(1e-3), jax.random.PRNGKey(2))
    assert float(m2["nan_skipped"]) == 1.0
    np.testing.assert_allclose(jax.device_get(st2.params["scale"]), after)


def test_episode_chunks_matches_unchunked_update():
    """TPU.EPISODE_CHUNKS (in-step gradient accumulation via lax.scan) must
    produce the same optimizer update as the plain vmap-over-E step: equal
    chunk-mean of grads == batch mean, identical per-episode dropout keys."""
    from clip_fsar_tpu.models.clip.model import ARCHS
    from clip_fsar_tpu.models.heads.clipfsar import CLIPFSARConfig, CLIPFSARHead
    from clip_fsar_tpu.train.loop import build_state
    from clip_fsar_tpu.train.step import make_train_step
    from tests.test_clipfsar_head import make_episode, WAY, T, C_TRAIN, C_TEST, DIM

    def make_cfg(chunks):
        # SGD: update == lr * grad, so param comparison IS grad comparison.
        # (A single Adam step normalizes to m̂/√v̂ == sign(g) elementwise,
        # which flips on fp-noise-level gradients and can't be compared.)
        return Config({
            "SOLVER": {"OPTIM_METHOD": "sgd", "WEIGHT_DECAY": 0.0, "BASE_LR": 1e-3, "MOMENTUM": 0.0, "NESTEROV": False},
            "TRAIN": {"BATCH_SIZE_PER_TASK": 1, "USE_CLASSIFICATION": True, "USE_CLASSIFICATION_VALUE": 1.2},
            "BN": {"WEIGHT_DECAY": 0.0},
            "DATA": {
                "MEAN": [0.48145466, 0.4578275, 0.40821073],
                "STD": [0.26862954, 0.26130258, 0.27577711],
                "NUM_INPUT_FRAMES": T,
            },
            "MODEL": {"EMA": {"ENABLE": False, "DECAY": 0.999}},
            "TPU": {"EPISODE_CHUNKS": chunks},
        })

    head = CLIPFSARHead(arch=ARCHS["ViT-Tiny-Test"], head_cfg=CLIPFSARConfig(way=WAY, num_frames=T))
    eps = [make_episode(i) for i in range(4)]
    batch = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x).astype(np.uint8) if x.dtype in (np.float32, jnp.float32) else np.asarray(x) for x in xs]),
        *eps,
    )
    text_train = jnp.asarray(np.random.RandomState(7).randn(C_TRAIN, DIM).astype(np.float32))
    text_test = jnp.asarray(np.random.RandomState(8).randn(C_TEST, DIM).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), eps[0], text_train, text_test, train=False)

    from clip_fsar_tpu.train.optimizer import build_optimizer as bo

    results = []
    for chunks in (1, 2, 4):
        cfg = make_cfg(chunks)
        tx = bo(cfg, variables["params"])

        class Model:
            pass

        m = Model()
        m.variables = variables
        m.head = head
        state = build_state(cfg, m, tx)
        step = jax.jit(make_train_step(head, tx, cfg, text_train, text_test))
        if chunks > 1:
            # the scan path must actually engage (lax.scan lowers to a
            # while op) — guard against a silent fallback to the vmap path
            hlo = step.lower(state, batch, jnp.float32(1e-3), jax.random.PRNGKey(1)).as_text()
            assert "while(" in hlo or "stablehlo.while" in hlo, f"EPISODE_CHUNKS={chunks} did not produce a scan"
        new_state, metrics = step(state, batch, jnp.float32(1e-3), jax.random.PRNGKey(1))
        results.append((jax.device_get(new_state.params), float(metrics["loss"])))

    ref_params, ref_loss = results[0]
    for params, loss in results[1:]:
        np.testing.assert_allclose(loss, ref_loss, rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(ref_params), jax.tree_util.tree_leaves(params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)


def test_checkpoint_roundtrip(tmp_path):
    from clip_fsar_tpu.train.checkpoint import Checkpointer
    from clip_fsar_tpu.train.state import TrainState

    state = TrainState(step=jnp.asarray(7, jnp.int32), params={"w": jnp.arange(4.0)}, opt_state={"m": jnp.zeros(4)})
    ck = Checkpointer(str(tmp_path))
    ck.save(7, state)
    assert ck.latest_step() == 7
    template = TrainState(step=jnp.asarray(0, jnp.int32), params={"w": jnp.zeros(4)}, opt_state={"m": jnp.ones(4)})
    restored = ck.restore(template)
    assert int(restored.step) == 7
    np.testing.assert_allclose(np.asarray(restored.params["w"]), np.arange(4.0))
    ck.close()


def test_checkpoint_restore_survives_optimizer_layout_change(tmp_path):
    """Resume after the optimizer configuration changed (e.g. different
    accumulation wrapping): params/step restore non-strictly and the
    template's fresh opt_state is kept — capability of the reference's
    strict=False load with mismatch logging (checkpoint.py:329-331).
    A params mismatch must still raise."""
    from clip_fsar_tpu.train.checkpoint import Checkpointer
    from clip_fsar_tpu.train.state import TrainState

    state = TrainState(step=jnp.asarray(9, jnp.int32), params={"w": jnp.arange(4.0)},
                       opt_state={"m": jnp.zeros(4)})
    ck = Checkpointer(str(tmp_path))
    ck.save(9, state)

    # opt_state is now a TUPLE of stages (layout change) -> fallback path
    fresh_opt = ({"acc": jnp.ones(4)}, {"m": jnp.full(4, 5.0)})
    template = TrainState(step=jnp.asarray(0, jnp.int32), params={"w": jnp.zeros(4)}, opt_state=fresh_opt)
    restored = ck.restore(template)
    assert int(restored.step) == 9
    np.testing.assert_allclose(np.asarray(restored.params["w"]), np.arange(4.0))
    np.testing.assert_allclose(np.asarray(restored.opt_state[1]["m"]), 5.0)  # template's fresh opt

    # params structure mismatch is a REAL error, not silently skipped
    bad = TrainState(step=jnp.asarray(0, jnp.int32), params={"w": jnp.zeros(4), "extra": jnp.zeros(2)},
                     opt_state=fresh_opt)
    with pytest.raises(ValueError):
        ck.restore(bad)
    ck.close()


def test_checkpoint_restore_per_field_graft(tmp_path):
    """The non-strict path grafts per FIELD: fields whose structure+shape
    match the checkpoint are restored even when another field mismatches;
    a field the current config disables (template None) stays disabled;
    and a params SHAPE change (same tree, different leaf shape) is a real
    mismatch that must raise rather than load garbage."""
    from clip_fsar_tpu.train.checkpoint import Checkpointer
    from clip_fsar_tpu.train.state import TrainState

    state = TrainState(step=jnp.asarray(3, jnp.int32), params={"w": jnp.arange(4.0)},
                       opt_state={"m": jnp.zeros(4)}, ema_params={"w": jnp.full(4, 7.0)})
    ck = Checkpointer(str(tmp_path))
    ck.save(3, state)

    # opt layout changed AND this run disables EMA: params/step still restore,
    # ema stays off (template None wins over the checkpoint's ema).
    template = TrainState(step=jnp.asarray(0, jnp.int32), params={"w": jnp.zeros(4)},
                          opt_state=({"acc": jnp.ones(4)},), ema_params=None)
    restored = ck.restore(template)
    assert int(restored.step) == 3
    np.testing.assert_allclose(np.asarray(restored.params["w"]), np.arange(4.0))
    assert restored.ema_params is None

    # opt layout changed + EMA newly ENABLED: matching params restore, fresh ema kept.
    template2 = TrainState(step=jnp.asarray(0, jnp.int32), params={"w": jnp.zeros(4)},
                           opt_state=({"acc": jnp.ones(4)},), ema_params={"w": jnp.zeros(4)})
    restored2 = ck.restore(template2)
    np.testing.assert_allclose(np.asarray(restored2.ema_params["w"]), 7.0)  # same tree -> restored

    # params leaf SHAPE change (same tree structure) is a real mismatch.
    bad = TrainState(step=jnp.asarray(0, jnp.int32), params={"w": jnp.zeros(8)},
                     opt_state=({"acc": jnp.ones(4)},), ema_params=None)
    with pytest.raises(ValueError):
        ck.restore(bad)
    ck.close()
