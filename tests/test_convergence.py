"""End-to-end trainability: overfit one episode.

The reference has no equivalent test (SURVEY.md §4 — its only quality
signal is the 10k-episode statistical eval); this pins the whole
train-step stack — model build, loss composition (episode CE +
USE_CLASSIFICATION_VALUE * video-text CE, reference
runs/train_net_few_shot.py:108-137), adam, donation, NaN guard — by
asserting the loss on a FIXED episode drops under repeated steps.
"""

import jax
import jax.numpy as jnp
import numpy as np


def test_overfit_single_episode():
    import __graft_entry__ as g
    from clip_fsar_tpu.models.builder import build_few_shot_model
    from clip_fsar_tpu.train.optimizer import build_optimizer
    from clip_fsar_tpu.train.loop import build_state
    from clip_fsar_tpu.train.step import make_train_step

    ways, shot, qpc, frames, res = 3, 1, 2, 4, 64
    cfg = g._cfg("ViT-Tiny-Test", frames, res, episodes=1, ways=ways, shot=shot, qpc=qpc)
    cfg.TRAIN.BATCH_SIZE_PER_TASK = 1  # no grad accumulation: every step applies
    # episode CE only: the auxiliary video-text CE is cosine-bounded near
    # log(n_classes) until `scale` grows, which needs far more steps than
    # a unit test should take — trainability of that term is covered by
    # the parity tests; here we pin that the episodic matcher can learn
    cfg.TRAIN.USE_CLASSIFICATION = False
    model = build_few_shot_model(cfg, jax.random.PRNGKey(0))
    tx = build_optimizer(cfg, model.variables["params"], name_prefix="head")
    state = build_state(cfg, model, tx)

    # signal-bearing episode: videos of class c = class pattern + small
    # noise, so support/query matching is actually learnable (pure noise
    # would leave the episode CE at log(ways) forever)
    rng = np.random.RandomState(0)
    ep = g._dummy_episode(rng, ways, shot, qpc, frames, res)
    patterns = rng.rand(ways, 1, res, res, 3).astype(np.float32)

    def with_signal(imgs, labels):
        base = np.asarray(imgs)
        lab = np.asarray(labels)
        return jnp.asarray(0.85 * patterns[lab] + 0.15 * base)

    ep = ep.replace(
        support_images=with_signal(ep.support_images, ep.support_labels),
        target_images=with_signal(ep.target_images, ep.target_labels),
    )
    batch = jax.tree_util.tree_map(lambda x: jnp.asarray(np.asarray(x)[None]), ep)

    step = jax.jit(make_train_step(model.head, tx, cfg, model.text_train, model.text_test))
    lr = jnp.float32(2e-3)  # tiny model, aggressive lr to overfit fast
    # constant dropout key: at this toy scale a fresh dropout draw per step
    # (rate 0.2 over 5-token modulation attention) is enough noise to stop
    # single-episode overfitting entirely — verified with plain optax.adam
    # too, so it is a property of the setup, not of the train step
    key = jax.random.PRNGKey(1)

    losses = []
    for i in range(60):
        state, metrics = step(state, batch, lr, key)
        losses.append(float(metrics["loss"]))

    first, last = np.mean(losses[:3]), np.mean(losses[-3:])
    assert np.isfinite(losses).all(), losses
    assert last < first * 0.5, f"loss did not drop: first≈{first:.4f} last≈{last:.4f}\n{losses}"
