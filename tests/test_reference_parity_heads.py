"""Full-head reference parity for the classic episodic heads.

Both sides share one deterministic "backbone": per-frame mean pixel
projected by a fixed random matrix W [3, 2048] — the reference head gets
a torch module in ``.backbone``, ours monkeypatches ``fsheads._encode``.
With identical transplanted head weights, logits must match to fp32
tolerance.

Oracles (reference models/base/few_shot.py):
  * CNN_TSN (:1533-1572), CNN_OTAM λ=0.1 (:1405-1444)
  * CNN_HyRSM_{1,5}shot (:1689-1900), CNN_HyRSM_plusplus_1shot (:1902-…)
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from reference_oracle import NS, import_reference_few_shot, zero_dropout

import clip_fsar_tpu.models.heads.fsheads as fsheads_mod
from clip_fsar_tpu.data.types import Episode

fs = import_reference_few_shot()

WAY, SHOT, QPC, T, RES = 3, 1, 2, 4, 16
DIM = 2048  # reference mid_dim for resnet50
_W = np.random.RandomState(42).randn(3, DIM).astype(np.float32) * 0.2


class _TorchProjBackbone(torch.nn.Module):
    def forward(self, x):  # [N, 3, H, W] -> [N, DIM]
        return x.mean(dim=(2, 3)) @ torch.from_numpy(_W)


def _fake_encode(backbone, images, dim):
    # [N, T, H, W, 3] -> [N, T, dim]
    feats = images.astype(jnp.float32).mean(axis=(2, 3)) @ jnp.asarray(_W)
    return feats


@pytest.fixture()
def fake_encode(monkeypatch):
    monkeypatch.setattr(fsheads_mod, "_encode", _fake_encode)
    yield


def _episode(seed, shot=SHOT):
    rng = np.random.RandomState(seed)
    s, q = WAY * shot, WAY * QPC
    perm_s, perm_q = rng.permutation(s), rng.permutation(q)
    sl = np.repeat(np.arange(WAY), shot)[perm_s]
    ql = np.repeat(np.arange(WAY), QPC)[perm_q]
    sup = rng.randn(s, T, RES, RES, 3).astype(np.float32)
    tgt = rng.randn(q, T, RES, RES, 3).astype(np.float32)
    ep = Episode(
        support_images=jnp.asarray(sup),
        support_labels=jnp.asarray(sl.astype(np.int32)),
        real_support_labels=jnp.asarray(sl.astype(np.int32)),
        target_images=jnp.asarray(tgt),
        target_labels=jnp.asarray(ql.astype(np.int32)),
        real_target_labels=jnp.asarray(ql.astype(np.int32)),
        batch_class_list=jnp.asarray(np.arange(WAY, dtype=np.int32)),
    )
    task = {
        "support_set": torch.from_numpy(sup.transpose(0, 1, 4, 2, 3).reshape(s * T, 3, RES, RES)),
        "support_labels": torch.from_numpy(sl.astype(np.int64)),
        "target_set": torch.from_numpy(tgt.transpose(0, 1, 4, 2, 3).reshape(q * T, 3, RES, RES)),
        "target_labels": torch.from_numpy(ql.astype(np.int64)),
        "real_support_labels": torch.from_numpy(sl.astype(np.int64)),
    }
    return ep, task


def _ref_cfg(**train):
    base = dict(WAY=WAY, SHOT=SHOT, DDP_GPU=1)
    base.update(train)
    return NS(
        VIDEO=NS(HEAD=NS(BACKBONE_NAME="resnet50")),
        TRAIN=NS(**base),
        DATA=NS(NUM_INPUT_FRAMES=T),
    )


def _build_ref(cls_name, **train):
    torch.manual_seed(0)
    head = getattr(fs, cls_name)(_ref_cfg(**train)).float()
    head.backbone = _TorchProjBackbone()
    zero_dropout(head)
    head.eval()
    return head


def test_cnn_tsn_parity(fake_encode):
    ref = _build_ref("CNN_TSN")
    ep, task = _episode(20)
    with torch.no_grad():
        want = ref(task)["logits"].numpy()
    ours = fsheads_mod.CNNTSNHead(backbone_name="resnet50", way=WAY, num_frames=T)
    variables = ours.init(jax.random.PRNGKey(0), ep, train=False)
    got = np.asarray(ours.apply(variables, ep, train=False)["logits"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_cnn_otam_parity(fake_encode):
    """Bidirectional OTAM with λ=0.1 (OTAM_cum_dist, :1371-1401)."""
    ref = _build_ref("CNN_OTAM")
    ep, task = _episode(21, shot=2)
    with torch.no_grad():
        want = ref(task)["logits"].numpy()
    ours = fsheads_mod.CNNOTAMHead(backbone_name="resnet50", way=WAY, num_frames=T)
    variables = ours.init(jax.random.PRNGKey(0), ep, train=False)
    got = np.asarray(ours.apply(variables, ep, train=False)["logits"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def _hyrsm_params(ref):
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    feats = {
        "temporal_atte_before": {
            "norm": {"scale": sd["temporal_atte_before.norm.weight"], "bias": sd["temporal_atte_before.norm.bias"]},
            "to_qkv": {"kernel": sd["temporal_atte_before.fn.to_qkv.weight"].T},
            "to_out": {"kernel": sd["temporal_atte_before.fn.to_out.0.weight"].T, "bias": sd["temporal_atte_before.fn.to_out.0.bias"]},
        },
        "temporal_atte": {
            "w_qs": {"kernel": sd["temporal_atte.w_qs.weight"].T},
            "w_ks": {"kernel": sd["temporal_atte.w_ks.weight"].T},
            "w_vs": {"kernel": sd["temporal_atte.w_vs.weight"].T},
            "fc": {"kernel": sd["temporal_atte.fc.weight"].T, "bias": sd["temporal_atte.fc.bias"]},
            "layer_norm": {"scale": sd["temporal_atte.layer_norm.weight"], "bias": sd["temporal_atte.layer_norm.bias"]},
        },
        # Conv1d k=1 [out, in, 1] == Dense [in, out]
        "layer2": {"kernel": sd["layer2.0.weight"][:, :, 0].T, "bias": sd["layer2.0.bias"]},
        "classification_layer": {"kernel": sd["classification_layer.weight"].T, "bias": sd["classification_layer.bias"]},
    }
    return jax.tree_util.tree_map(jnp.asarray, {"features": feats})


@pytest.mark.parametrize("five_shot", [False, True])
def test_cnn_hyrsm_parity(fake_encode, five_shot):
    cls = "CNN_HyRSM_5shot" if five_shot else "CNN_HyRSM_1shot"
    shot = 2 if five_shot else 1
    ref = _build_ref(cls, NUM_CLASS=11, HEAD=8, POSITION_A=10.0, POSITION_B=1.0)
    ep, task = _episode(22, shot=shot)
    with torch.no_grad():
        out = ref(task)
        want, want_cls = out["logits"].numpy(), out["class_logits"].numpy()

    ours = fsheads_mod.CNNHyRSMHead(
        backbone_name="resnet50", way=WAY, num_frames=T, five_shot=five_shot, num_class=11, heads=8
    )
    got_out = ours.apply({"params": _hyrsm_params(ref)}, ep, train=False)
    np.testing.assert_allclose(np.asarray(got_out["logits"]), want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_out["class_logits"]), want_cls, rtol=1e-4, atol=1e-4)


def test_cnn_hyrsm_plusplus_parity(fake_encode):
    """HyRSM++ adds the temporal-coherence regularizer (λ windows masks,
    :1939-2035)."""
    ref = _build_ref(
        "CNN_HyRSM_plusplus_1shot",
        NUM_CLASS=11, HEAD=8, POSITION_A=10.0, POSITION_B=1.0, WINDOW_SIZE=2, TEMPORAL_BALANCE=1.5,
        BALANCE_COEFFICIENT=0.7, USE_CLASSIFICATION=True,
    )
    ep, task = _episode(23)
    with torch.no_grad():
        out = ref(task)
        want = out["logits"].numpy()
        want_reg = float(out["loss_temporal_regular"])

    ours = fsheads_mod.CNNHyRSMPlusPlusHead(
        backbone_name="resnet50", way=WAY, num_frames=T, num_class=11, heads=8,
        window_size=2, temporal_balance=1.5, balance_coefficient=0.7, use_classification=True,
    )
    got = ours.apply({"params": _hyrsm_params(ref)}, ep, train=False)
    np.testing.assert_allclose(np.asarray(got["logits"]), want, rtol=1e-4, atol=1e-4)
    assert abs(float(got["loss_temporal_regular"]) - want_reg) < 1e-4


def test_cnn_trx_parity(fake_encode):
    """TRX tuple cross-attention, cardinalities [2, 3] (reference
    :1227-1366): joint softmax over (shot x support-tuple), query-specific
    prototypes, -||diff||^2 / n_tuples averaged over cardinalities."""
    ref = _build_ref("CNN_TRX")
    ep, task = _episode(24, shot=2)
    with torch.no_grad():
        want = ref(task)["logits"].numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {}
    for i, card in enumerate((2, 3)):
        params[f"trx_{card}"] = {
            "k_linear": {"kernel": sd[f"transformers.{i}.k_linear.weight"].T, "bias": sd[f"transformers.{i}.k_linear.bias"]},
            "v_linear": {"kernel": sd[f"transformers.{i}.v_linear.weight"].T, "bias": sd[f"transformers.{i}.v_linear.bias"]},
            "norm_k": {"scale": sd[f"transformers.{i}.norm_k.weight"], "bias": sd[f"transformers.{i}.norm_k.bias"]},
        }
    ours = fsheads_mod.CNNTRXHead(backbone_name="resnet50", way=WAY, num_frames=T, temp_set=(2, 3))
    got = np.asarray(ours.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)}, ep, train=False)["logits"])
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-2)  # -||.||^2 magnitudes ~1e3


def test_cnn_cross_transformer_parity(fake_encode):
    """CrossTransformer query-aligned prototypes (reference :1451-1529):
    shared key/query 1x1 conv, (shot x frame)-flattened support tokens,
    cosine /8 scoring."""
    shot = 2
    ref = _build_ref("CNN_CrossTransformer", SHOT=shot)
    ep, task = _episode(25, shot=shot)
    with torch.no_grad():
        want = ref(task)["logits"].numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "key_head": {"kernel": sd["key_head.weight"][:, :, 0].T},
        "value_head": {"kernel": sd["value_head.weight"][:, :, 0].T},
    }
    ours = fsheads_mod.CNNCrossTransformerHead(backbone_name="resnet50", way=WAY, shot=shot, num_frames=T)
    got = np.asarray(ours.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)}, ep, train=False)["logits"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class _TorchSpatialBackbone(torch.nn.Module):
    """[N, 3, H, W] -> [N, DIM, 7, 7]: 7x7 adaptive mean pool, per-cell
    fixed projection (the reference MoLo hardcodes the 7x7 grid)."""

    def forward(self, x):
        p = torch.nn.functional.adaptive_avg_pool2d(x, (7, 7))  # [N, 3, 7, 7]
        return torch.einsum("nchw,cd->ndhw", p, torch.from_numpy(_W))


def _fake_spatial_call(self, x, pool=True, **kw):
    # [N, H, W, 3] -> [N, 7, 7, DIM] (or pooled [N, DIM])
    n, h, w, _ = x.shape
    p = x.reshape(n, 7, h // 7, 7, w // 7, 3).mean(axis=(2, 4))  # [N, 7, 7, 3]
    feats = p.astype(jnp.float32) @ jnp.asarray(_W)
    return feats.mean(axis=(1, 2)) if pool else feats


def test_cnn_molo_parity(monkeypatch):
    """CNN_BiMHM_MoLo (reference :2390-2654): appearance + motion streams
    with class tokens, global<->local s2q/q2s contrastive logits, frame
    Bi-MHM fused with LOGIT_BALANCE_COFF, class logits."""
    from clip_fsar_tpu.models.heads.molo import MoLoHead
    from clip_fsar_tpu.models.resnet import TorchResNet

    monkeypatch.setattr(TorchResNet, "__call__", _fake_spatial_call)

    res = 224  # the reference MoLo forward hardcodes 224x224 inputs (:2541-2547)
    ref = _build_ref(
        "CNN_BiMHM_MoLo",
        NUM_CLASS=11, HEAD=8, POSITION_A=10.0, POSITION_B=1.0,
        USE_CONTRASTIVE=True, USE_CLASSIFICATION=True, LOGIT_BALANCE_COFF=0.4,
    )
    ref.backbone = _TorchSpatialBackbone()
    torch.nn.init.normal_(ref.scale, mean=1.3, std=0.0)
    torch.nn.init.normal_(ref.scale_motion, mean=0.8, std=0.0)

    rng = np.random.RandomState(26)
    s, q = WAY * SHOT, WAY * QPC
    perm_s, perm_q = rng.permutation(s), rng.permutation(q)
    sl = np.repeat(np.arange(WAY), SHOT)[perm_s]
    ql = np.repeat(np.arange(WAY), QPC)[perm_q]
    sup = rng.randn(s, T, res, res, 3).astype(np.float32)
    tgt = rng.randn(q, T, res, res, 3).astype(np.float32)
    ep = Episode(
        support_images=jnp.asarray(sup), support_labels=jnp.asarray(sl.astype(np.int32)),
        real_support_labels=jnp.asarray(sl.astype(np.int32)), target_images=jnp.asarray(tgt),
        target_labels=jnp.asarray(ql.astype(np.int32)), real_target_labels=jnp.asarray(ql.astype(np.int32)),
        batch_class_list=jnp.asarray(np.arange(WAY, dtype=np.int32)),
    )
    task = {
        "support_set": torch.from_numpy(sup.transpose(0, 1, 4, 2, 3).reshape(s * T, 3, res, res)),
        "support_labels": torch.from_numpy(sl.astype(np.int64)),
        "target_set": torch.from_numpy(tgt.transpose(0, 1, 4, 2, 3).reshape(q * T, 3, res, res)),
        "target_labels": torch.from_numpy(ql.astype(np.int64)),
    }
    with torch.no_grad():
        want = ref(task)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    def tv2(prefix):
        return {
            "attn": {
                "norm": {"scale": sd[f"{prefix}.layers.0.0.norm.weight"], "bias": sd[f"{prefix}.layers.0.0.norm.bias"]},
                "to_qkv": {"kernel": sd[f"{prefix}.layers.0.0.fn.to_qkv.weight"].T},
                "to_out": {"kernel": sd[f"{prefix}.layers.0.0.fn.to_out.0.weight"].T, "bias": sd[f"{prefix}.layers.0.0.fn.to_out.0.bias"]},
            },
            "ff_fc1": {"kernel": sd[f"{prefix}.layers.0.1.net.0.weight"].T, "bias": sd[f"{prefix}.layers.0.1.net.0.bias"]},
            "ff_fc2": {"kernel": sd[f"{prefix}.layers.0.1.net.3.weight"].T, "bias": sd[f"{prefix}.layers.0.1.net.3.bias"]},
        }

    def up(prefix):
        return {"conv": {"kernel": sd[f"{prefix}.conv.double_conv.0.weight"].transpose(2, 3, 1, 0)},
                "bn": {"BatchNorm_0": {"scale": sd[f"{prefix}.conv.double_conv.1.weight"], "bias": sd[f"{prefix}.conv.double_conv.1.bias"]}}}

    def up_stats(prefix):
        return {"bn": {"BatchNorm_0": {"mean": sd[f"{prefix}.conv.double_conv.1.running_mean"], "var": sd[f"{prefix}.conv.double_conv.1.running_var"]}}}

    params = {
        "class_token": sd["class_token"],
        "class_token_motion": sd["class_token_motion"],
        "temporal_atte_before": tv2("temporal_atte_before"),
        "temporal_atte_before_motion": tv2("temporal_atte_before_motion"),
        "motion_reduce": {"kernel": sd["motion_reduce.weight"].transpose(2, 3, 4, 1, 0), "bias": sd["motion_reduce.bias"]},
        "motion_conv": {"kernel": sd["motion_conv.weight"].transpose(2, 3, 1, 0), "bias": sd["motion_conv.bias"]},
        "motion_up": {"kernel": sd["motion_up.weight"].transpose(2, 3, 1, 0), "bias": sd["motion_up.bias"]},
        "up1": up("up1"), "up2": up("up2"), "up3": up("up3"),
        "outc": {"kernel": sd["outc.conv.weight"].transpose(2, 3, 1, 0), "bias": sd["outc.conv.bias"]},
        "classification_layer": {"kernel": sd["classification_layer.weight"].T, "bias": sd["classification_layer.bias"]},
        "scale": sd["scale"], "scale_motion": sd["scale_motion"],
    }
    stats = {"up1": up_stats("up1"), "up2": up_stats("up2"), "up3": up_stats("up3")}

    ours = MoLoHead(
        backbone_name="resnet50", way=WAY, num_frames=T, num_class=11, heads=8,
        use_contrastive=True, use_classification=True, logit_balance_coff=0.4,
    )
    got = ours.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params), "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
        ep, train=False,
    )
    for key in ("logits", "class_logits", "logits_s2q", "logits_q2s", "logits_s2q_motion", "logits_q2s_motion"):
        np.testing.assert_allclose(
            np.asarray(got[key]), want[key].numpy(), rtol=1e-3, atol=1e-3, err_msg=key
        )


@pytest.mark.parametrize("threshold", [0.0, 0.345, 1.1])
def test_cnn_hyrsm_plusplus_semi_parity(fake_encode, threshold):
    """CNN_HyRSM_plusplus_semi (reference :2193-2390): the pseudo-label
    branch appends confidently-classified unlabeled clips to the support
    set before the prototype update.  Our static-shape weighted-mean
    formulation must match the reference's dynamic concat at every
    acceptance regime: all clips (threshold 0), a confidence-gated 2-of-4 subset (0.345 splits the ~0.337-0.356 confidences),
    and none (threshold > 1)."""
    U = 4
    ref = _build_ref(
        "CNN_HyRSM_plusplus_semi",
        NUM_CLASS=11, HEAD=8, POSITION_A=10.0, POSITION_B=1.0, WINDOW_SIZE=2,
        TEMPORAL_BALANCE=1.5, BALANCE_COEFFICIENT=0.7, USE_CLASSIFICATION=True,
        SEMI_TEMPORAL=2.0, SEMI_THRESHOLD=threshold,
    )
    ep, task = _episode(26, shot=2)
    rng = np.random.RandomState(260)
    unl = rng.randn(U, T, RES, RES, 3).astype(np.float32)
    task["target_set_weakly"] = torch.from_numpy(unl.transpose(0, 1, 4, 2, 3).reshape(U * T, 3, RES, RES))
    ep = ep.replace(unlabeled_images=jnp.asarray(unl))
    with torch.no_grad():
        out = ref(task)
        want, want_cls = out["logits"].numpy(), out["class_logits"].numpy()
        want_reg = float(out["loss_temporal_regular"])

    ours = fsheads_mod.CNNHyRSMPlusPlusSemiHead(
        backbone_name="resnet50", way=WAY, num_frames=T, num_class=11, heads=8,
        window_size=2, temporal_balance=1.5, balance_coefficient=0.7,
        semi_temporal=2.0, semi_threshold=threshold, use_classification=True,
    )
    got = ours.apply({"params": _hyrsm_params(ref)}, ep, train=False)
    np.testing.assert_allclose(np.asarray(got["logits"]), want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["class_logits"]), want_cls, rtol=1e-4, atol=1e-4)
    assert abs(float(got["loss_temporal_regular"]) - want_reg) < 1e-4
