"""CLIPFSARHead behavior: shapes, train/eval variants, episode batching."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clip_fsar_tpu.data.types import Episode
from clip_fsar_tpu.models.clip.model import ARCHS
from clip_fsar_tpu.models.heads.clipfsar import CLIPFSARConfig, CLIPFSARHead

WAY, SHOT, QPC, T, RES = 3, 1, 2, 4, 64
C_TRAIN, C_TEST = 7, 5
ARCH = ARCHS["ViT-Tiny-Test"]
DIM = ARCH.embed_dim


def make_episode(seed=0, shot=SHOT):
    rng = np.random.RandomState(seed)
    s, q = WAY * shot, WAY * QPC
    sl = np.repeat(np.arange(WAY), shot)
    ql = np.repeat(np.arange(WAY), QPC)
    perm_s, perm_q = rng.permutation(s), rng.permutation(q)
    classes = rng.choice(C_TEST, WAY, replace=False)
    return Episode(
        support_images=jnp.asarray(rng.rand(s, T, RES, RES, 3).astype(np.float32)),
        support_labels=jnp.asarray(sl[perm_s]),
        real_support_labels=jnp.asarray(classes[sl[perm_s]]),
        target_images=jnp.asarray(rng.rand(q, T, RES, RES, 3).astype(np.float32)),
        target_labels=jnp.asarray(ql[perm_q]),
        real_target_labels=jnp.asarray(classes[ql[perm_q]]),
        batch_class_list=jnp.asarray(classes),
    )


@pytest.fixture(scope="module")
def head_and_params():
    head = CLIPFSARHead(arch=ARCH, head_cfg=CLIPFSARConfig(way=WAY, num_frames=T))
    ep = make_episode()
    text_train = jnp.asarray(np.random.RandomState(7).randn(C_TRAIN, DIM).astype(np.float32))
    text_test = jnp.asarray(np.random.RandomState(8).randn(C_TEST, DIM).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), ep, text_train, text_test, train=False)
    return head, variables, text_train, text_test


def test_train_forward_shapes(head_and_params):
    head, variables, text_train, text_test = head_and_params
    ep = make_episode(1)
    out = head.apply(variables, ep, text_train, text_test, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    assert out["logits"].shape == (WAY * QPC, WAY)
    assert out["class_logits"].shape == (WAY * (SHOT + QPC), C_TRAIN)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_eval_forward_and_jit(head_and_params):
    head, variables, text_train, text_test = head_and_params
    ep = make_episode(2)
    fn = jax.jit(lambda v, e: head.apply(v, e, text_train, text_test, train=False))
    out = fn(variables, ep)
    assert out["logits"].shape == (WAY * QPC, WAY)


def test_eval_variants(head_and_params):
    head, variables, text_train, text_test = head_and_params
    ep = make_episode(3)
    base = head.apply(variables, ep, text_train, text_test, train=False)["logits"]

    eval_text = CLIPFSARHead(arch=ARCH, head_cfg=CLIPFSARConfig(way=WAY, num_frames=T, eval_text=True))
    zt = eval_text.apply(variables, ep, text_train, text_test, train=False)["logits"]
    assert zt.shape == (WAY * QPC, WAY)
    # zero-shot logits are softmax rows
    np.testing.assert_allclose(np.asarray(zt).sum(-1), 1.0, rtol=1e-5)

    combine = CLIPFSARHead(arch=ARCH, head_cfg=CLIPFSARConfig(way=WAY, num_frames=T, combine=True))
    cb = combine.apply(variables, ep, text_train, text_test, train=False)["logits"]
    assert cb.shape == (WAY * QPC, WAY)
    assert not np.allclose(np.asarray(cb), np.asarray(base))

    single = CLIPFSARHead(arch=ARCH, head_cfg=CLIPFSARConfig(way=WAY, num_frames=T, single_direct=True))
    sd = single.apply(variables, ep, text_train, text_test, train=False)["logits"]
    assert not np.allclose(np.asarray(sd), np.asarray(base))


def test_merge_before_5shot(head_and_params):
    head, variables, text_train, text_test = head_and_params
    mb = CLIPFSARHead(arch=ARCH, head_cfg=CLIPFSARConfig(way=WAY, num_frames=T, merge_before=True))
    ep = make_episode(4, shot=5)
    out = mb.apply(variables, ep, text_train, text_test, train=False)
    assert out["logits"].shape == (WAY * QPC, WAY)


def test_episode_batching_vmap_matches_single(head_and_params):
    head, variables, text_train, text_test = head_and_params
    eps = [make_episode(10 + i) for i in range(3)]
    batched = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *eps)
    fn = lambda e: head.apply(variables, e, text_train, text_test, train=False)["logits"]
    out_b = np.asarray(jax.vmap(fn)(batched))
    for i, ep in enumerate(eps):
        np.testing.assert_allclose(out_b[i], np.asarray(fn(ep)), rtol=2e-4, atol=1e-5)


def test_support_shuffle_invariance(head_and_params):
    """Prototypes are class-means: permuting support order must not change
    eval logits (load-bearing for the static one-hot class_mean design)."""
    head, variables, text_train, text_test = head_and_params
    ep = make_episode(20, shot=2)
    perm = np.random.RandomState(0).permutation(WAY * 2)
    ep2 = Episode(
        support_images=ep.support_images[perm],
        support_labels=ep.support_labels[perm],
        real_support_labels=ep.real_support_labels[perm],
        target_images=ep.target_images,
        target_labels=ep.target_labels,
        real_target_labels=ep.real_target_labels,
        batch_class_list=ep.batch_class_list,
    )
    a = np.asarray(head.apply(variables, ep, text_train, text_test, train=False)["logits"])
    b = np.asarray(head.apply(variables, ep2, text_train, text_test, train=False)["logits"])
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_head_cfg_from_cfg():
    from clip_fsar_tpu.config import Config

    cfg = Config({"TRAIN": {"WAY": 5, "USE_CLASSIFICATION": True, "MERGE_BEFORE": True}, "DATA": {"NUM_INPUT_FRAMES": 8}})
    hc = CLIPFSARConfig.from_cfg(cfg)
    assert hc.way == 5 and hc.num_frames == 8 and hc.use_classification and hc.merge_before
    assert not hc.combine and hc.text_coff is None


def test_frame_chunks_match_unchunked(head_and_params):
    """TPU.FRAME_CHUNKS: sequential rematted tower chunks are numerically
    identical to the one-shot tower (per-frame math is independent), for
    both forward logits and gradients."""
    head, variables, text_train, text_test = head_and_params
    chunked = CLIPFSARHead(arch=ARCH, head_cfg=CLIPFSARConfig(way=WAY, num_frames=T), frame_chunks=3)
    ep = make_episode(4)

    out_ref = head.apply(variables, ep, text_train, text_test, train=False)
    out_chk = chunked.apply(variables, ep, text_train, text_test, train=False)
    np.testing.assert_allclose(np.asarray(out_chk["logits"]), np.asarray(out_ref["logits"]), rtol=1e-5, atol=1e-5)

    def loss(h):
        def f(params):
            out = h.apply(
                {**variables, "params": params}, ep, text_train, text_test,
                train=True, deterministic=True,
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            return jnp.mean(out["logits"])
        return jax.grad(f)(variables["params"])

    g_ref, g_chk = loss(head), loss(chunked)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_chk = jax.tree_util.tree_leaves(g_chk)
    assert len(flat_ref) == len(flat_chk)
    for a, b in zip(flat_ref, flat_chk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_frame_chunks_init_params_identical():
    """Param tree (names and shapes) is unchanged by chunking — checkpoints
    move freely between chunked and unchunked execution."""
    ep = make_episode(5)
    tt = jnp.zeros((C_TRAIN, DIM), jnp.float32)
    v1 = CLIPFSARHead(arch=ARCH, head_cfg=CLIPFSARConfig(way=WAY, num_frames=T)).init(
        jax.random.PRNGKey(0), ep, tt, tt, train=False)
    v2 = CLIPFSARHead(arch=ARCH, head_cfg=CLIPFSARConfig(way=WAY, num_frames=T), frame_chunks=3).init(
        jax.random.PRNGKey(0), ep, tt, tt, train=False)
    s1 = jax.tree_util.tree_map(lambda x: x.shape, v1)
    s2 = jax.tree_util.tree_map(lambda x: x.shape, v2)
    assert s1 == s2
