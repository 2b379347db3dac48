"""Classic few-shot heads: shapes, jit, class-grouping semantics."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clip_fsar_tpu.models.heads.fsheads import (
    CNNCrossTransformerHead,
    CNNHyRSMHead,
    CNNOTAMHead,
    CNNTRXHead,
    CNNTSNHead,
)
from tests.test_clipfsar_head import make_episode, WAY, QPC, T, RES


BACKBONE = "ViT-Tiny-Test"  # small CLIP tower keeps these tests fast


def _run(head, seed=0, shot=1, **apply_kw):
    ep = make_episode(seed, shot=shot)
    variables = head.init(jax.random.PRNGKey(0), ep, train=False)
    out = head.apply(variables, ep, train=False, **apply_kw)
    return ep, variables, out


def test_tsn_head():
    head = CNNTSNHead(backbone_name=BACKBONE, way=WAY, num_frames=T)
    ep, variables, out = _run(head)
    assert out["logits"].shape == (WAY * QPC, WAY)
    # norm-squared variant differs
    head2 = CNNTSNHead(backbone_name=BACKBONE, way=WAY, num_frames=T, norm_sq_dist=True)
    out2 = head2.apply(variables, ep, train=False)
    assert out2["logits"].shape == (WAY * QPC, WAY)
    assert not np.allclose(np.asarray(out["logits"]), np.asarray(out2["logits"]))


def test_otam_plain_head_and_class_grouping():
    head = CNNOTAMHead(backbone_name=BACKBONE, way=WAY, num_frames=T)
    ep, variables, out = _run(head, shot=2)
    assert out["logits"].shape == (WAY * QPC, WAY)
    # permuting support order must not change logits (class-mean over clips)
    perm = np.random.RandomState(0).permutation(WAY * 2)
    ep2 = ep.replace(
        support_images=ep.support_images[perm],
        support_labels=ep.support_labels[perm],
        real_support_labels=ep.real_support_labels[perm],
    )
    out2 = head.apply(variables, ep2, train=False)
    np.testing.assert_allclose(np.asarray(out["logits"]), np.asarray(out2["logits"]), rtol=1e-4, atol=1e-5)


def test_trx_head():
    head = CNNTRXHead(backbone_name=BACKBONE, way=WAY, num_frames=T, temp_set=(2, 3))
    ep, variables, out = _run(head)
    assert out["logits"].shape == (WAY * QPC, WAY)
    assert np.isfinite(np.asarray(out["logits"])).all()
    # logits are negative squared distances
    assert (np.asarray(out["logits"]) <= 0).all()


def test_cross_transformer_head():
    head = CNNCrossTransformerHead(backbone_name=BACKBONE, way=WAY, shot=2, num_frames=T, hidden_dim=16)
    ep, variables, out = _run(head, shot=2)
    assert out["logits"].shape == (WAY * QPC, WAY)


@pytest.mark.parametrize("five_shot", [False, True])
def test_hyrsm_heads(five_shot):
    head = CNNHyRSMHead(backbone_name=BACKBONE, way=WAY, num_frames=T, five_shot=five_shot, num_class=11)
    ep, variables, out = _run(head, shot=2)
    assert out["logits"].shape == (WAY * QPC, WAY)
    # per-frame classification logits: [(S+Q)*T, num_class]
    assert out["class_logits"].shape == ((WAY * 2 + WAY * QPC) * T, 11)


def test_heads_jit_and_vmap():
    head = CNNTSNHead(backbone_name=BACKBONE, way=WAY, num_frames=T)
    ep, variables, _ = _run(head)
    fn = jax.jit(lambda v, e: head.apply(v, e, train=False)["logits"])
    a = fn(variables, ep)
    eps = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *[make_episode(i) for i in range(2)])
    b = jax.vmap(lambda e: head.apply(variables, e, train=False)["logits"])(eps)
    assert a.shape == (WAY * QPC, WAY) and b.shape == (2, WAY * QPC, WAY)


def test_registry_factories():
    from clip_fsar_tpu.config import Config
    from clip_fsar_tpu.utils.registry import HEAD_REGISTRY
    import clip_fsar_tpu.models.builder  # noqa: F401 — registers heads

    cfg = Config({
        "TRAIN": {"WAY": 5, "SHOT": 1},
        "DATA": {"NUM_INPUT_FRAMES": 8},
        "VIDEO": {"HEAD": {"NAME": "CNN_TRX", "BACKBONE_NAME": "resnet50"}},
    })
    for name in ("CNN_TSN", "CNN_OTAM", "CNN_TRX", "CNN_CrossTransformer", "CNN_HyRSM_1shot", "CNN_HyRSM_5shot", "CNN_OTAM_CLIPFSAR"):
        assert name in HEAD_REGISTRY
    head = HEAD_REGISTRY.get("CNN_TRX")(cfg)
    assert head.backbone_name == "resnet50"


def test_torch_resnet_matches_torchvision_structure():
    """Random-init structural check + GAP output shape for resnet18."""
    from clip_fsar_tpu.models.resnet import TorchResNet

    m = TorchResNet(depth="resnet18")
    x = jnp.zeros((2, 64, 64, 3))
    vs = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(vs, x)
    assert out.shape == (2, 512)
    spatial = m.apply(vs, x, pool=False)
    assert spatial.shape == (2, 2, 2, 512)


def test_hyrsm_plusplus_head():
    from clip_fsar_tpu.models.heads.fsheads import CNNHyRSMPlusPlusHead

    head = CNNHyRSMPlusPlusHead(backbone_name=BACKBONE, way=WAY, num_frames=T, num_class=11, window_size=1, temporal_balance=2.0)
    ep, variables, out = _run(head, shot=2)
    assert out["logits"].shape == (WAY * QPC, WAY)
    assert np.isfinite(float(out["loss_temporal_regular"]))
    assert float(out["loss_temporal_regular"]) >= 0


def test_molo_head():
    from clip_fsar_tpu.models.heads.molo import MoLoHead

    head = MoLoHead(backbone_name=BACKBONE, way=WAY, num_frames=T, num_class=11, use_classification=True)
    ep = make_episode(5)
    variables = head.init(jax.random.PRNGKey(0), ep, train=True)
    # MoLo trains its decoder BatchNorms (train_backbone_bn=True), so train-mode
    # apply must open batch_stats as mutable — mirrors train/step.py:69-75.
    out, _ = head.apply(
        variables, ep, train=True, rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"]
    )
    q = WAY * QPC
    assert out["logits"].shape == (q, WAY)
    assert out["logits_s2q"].shape == (q, WAY)
    assert out["logits_q2s"].shape == (q, WAY)
    assert out["logits_s2q_motion"].shape == (q, WAY)
    assert out["logits_q2s_motion"].shape == (q, WAY)
    assert float(out["loss_recons"]) > 0
    # eval: no recon loss
    out_e = head.apply(variables, ep, train=False)
    assert float(out_e["loss_recons"]) == 0.0


def test_molo_registry_and_temporal_regular_masks():
    from clip_fsar_tpu.models.heads.fsheads import _temporal_regular_masks
    from clip_fsar_tpu.utils.registry import HEAD_REGISTRY
    import clip_fsar_tpu.models.builder  # noqa: F401

    reg, lab = _temporal_regular_masks(4, 1, 2.0)
    assert lab[0, 0] == 1 and lab[0, 1] == 1 and lab[0, 2] == 0
    assert reg[0, 0] == 1.0 and abs(reg[0, 1] - 0.5) < 1e-6
    assert abs(reg[0, 2] - (1 - np.exp(-1 / 2.0))) < 1e-6
    for name in ("CNN_BiMHM_MoLo", "CNN_HyRSM_plusplus_1shot", "CNN_HyRSM_plusplus_5shot"):
        assert name in HEAD_REGISTRY


def test_hyrsm_pp_semi_head():
    """CNN_HyRSM_plusplus_semi (reference few_shot.py:2193-2390):
    prototype-relate base path + pseudo-labeled support extension."""
    from clip_fsar_tpu.models.heads.fsheads import CNNHyRSMPlusPlusSemiHead

    head = CNNHyRSMPlusPlusSemiHead(backbone_name=BACKBONE, way=WAY, num_frames=T, num_class=7)
    ep, variables, out = _run(head, shot=2)
    assert out["logits"].shape == (WAY * QPC, WAY)
    assert out["class_logits"].shape == (WAY * (2 + QPC) * T, 7)
    assert np.isfinite(float(out["loss_temporal_regular"]))

    # an impossible confidence threshold accepts nothing: logits must match
    # the no-unlabeled forward exactly (mask-all-zero == support-only means)
    rng = np.random.RandomState(3)
    unl = jnp.asarray(rng.rand(4, T, RES, RES, 3).astype(np.float32))
    strict = CNNHyRSMPlusPlusSemiHead(
        backbone_name=BACKBONE, way=WAY, num_frames=T, num_class=7, semi_threshold=1.5
    )
    out_strict = strict.apply(variables, ep.replace(unlabeled_images=unl), train=False)
    np.testing.assert_allclose(
        np.asarray(out_strict["logits"]), np.asarray(out["logits"]), rtol=1e-4, atol=1e-5
    )

    # threshold 0 accepts every unlabeled clip: prototypes move, logits change
    accept = CNNHyRSMPlusPlusSemiHead(
        backbone_name=BACKBONE, way=WAY, num_frames=T, num_class=7, semi_threshold=0.0
    )
    out_accept = accept.apply(variables, ep.replace(unlabeled_images=unl), train=False)
    assert not np.allclose(np.asarray(out_accept["logits"]), np.asarray(out["logits"]))


def test_hyrsm_pp_semi_registry():
    from clip_fsar_tpu.config import Config
    from clip_fsar_tpu.utils.registry import HEAD_REGISTRY

    cfg = Config({
        "VIDEO": {"HEAD": {"BACKBONE_NAME": BACKBONE}},
        "TRAIN": {"WAY": WAY, "WINDOW_SIZE": 3, "TEMPORAL_BALANCE": 1.0, "SEMI_THRESHOLD": 0.7,
                  "SEMI_TEMPORAL": 0.5, "NUM_CLASS": 7, "USE_CLASSIFICATION": True},
        "DATA": {"NUM_INPUT_FRAMES": T},
    })
    head = HEAD_REGISTRY.get("CNN_HyRSM_plusplus_semi")(cfg)
    assert head.semi_threshold == 0.7 and head.semi_temporal == 0.5
