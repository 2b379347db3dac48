"""Reference-parity harness: identical weights -> identical logits.

The north-star correctness claim (BASELINE.md) is per-episode logits
matching the PyTorch reference to fp32 tolerance.  These tests build a
tiny CLIP with the *reference's own* ``CLIP`` class (random init), run
the reference ``CNN_OTAM_CLIPFSAR`` head on CPU torch, transplant the
same weights into our flax ``CLIPFSARHead`` via ``convert_openai_clip``,
and assert logits agree on identical episodes for every eval variant and
the (dropout-disabled) train path.

Oracles exercised (reference file:line):
  * OTAM_cum_dist_v2 / OTAM_cum_dist  (models/base/few_shot.py:2657-2687, 1371-1401)
  * Transformer_v1 prototype modulation (:979-999)
  * CNN_OTAM_CLIPFSAR train + eval plain/MERGE_BEFORE/COMBINE/EVAL_TEXT/
    SINGLE_DIRECT (:2691-2993)
  * the BPE tokenizer + text tower + converter chain (text features match)
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from reference_oracle import import_reference_few_shot, make_reference_cfg, zero_dropout

from clip_fsar_tpu.data.types import Episode
from clip_fsar_tpu.models.clip.convert import convert_openai_clip
from clip_fsar_tpu.models.clip.model import CLIP
from clip_fsar_tpu.models.clip.tokenizer import tokenize
from clip_fsar_tpu.models.heads.clipfsar import CLIPFSARConfig, CLIPFSARHead
from clip_fsar_tpu.ops.otam import otam_cum_dist, otam_distance

fs = import_reference_few_shot()

WAY, SHOT, QPC, T, RES = 3, 1, 2, 4, 32
TRAIN_CLASSES = ["brush hair", "cartwheel", "catch", "chew", "clap", "climb", "dive"]
TEST_CLASSES = ["drink", "fall floor", "golf", "jump", "kiss"]


# --------------------------------------------------------------------------
# OTAM distance vs the reference recurrences
# --------------------------------------------------------------------------


@pytest.mark.parametrize("lbda,ref_fn", [(0.5, fs.OTAM_cum_dist_v2), (0.1, fs.OTAM_cum_dist)])
def test_otam_matches_reference(lbda, ref_fn):
    rng = np.random.RandomState(0)
    for tq, ts in [(4, 4), (8, 8), (8, 6)]:
        dists = rng.rand(5, 7, tq, ts).astype(np.float32) * 2.0
        ref = ref_fn(torch.from_numpy(dists)).numpy()
        ours = np.asarray(otam_cum_dist(jnp.asarray(dists), lbda=lbda))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_otam_bidirectional_matches_reference():
    rng = np.random.RandomState(1)
    dists = rng.rand(4, 3, 8, 8).astype(np.float32) * 2.0
    td = torch.from_numpy(dists)
    ref = (fs.OTAM_cum_dist_v2(td) + fs.OTAM_cum_dist_v2(td.transpose(-1, -2))).numpy()
    ours = np.asarray(otam_distance(jnp.asarray(dists)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


# --------------------------------------------------------------------------
# weight transplant machinery
# --------------------------------------------------------------------------


def _tiny_ref_clip(vision: str):
    """Reference CLIP with tiny dims. embed_dim mirrors the reference
    head's hardcoded mid_dim per backbone branch (few_shot.py:2699-2713):
    512 for 'ViT-B/16', 1024 for 'RN50'."""
    torch.manual_seed(0)
    if vision == "vit":
        model = fs.CLIP(
            embed_dim=512, image_resolution=RES, vision_layers=2, vision_width=128,
            vision_patch_size=16, context_length=77, vocab_size=49408,
            transformer_width=128, transformer_heads=2, transformer_layers=2,
        )
    else:
        model = fs.CLIP(
            embed_dim=1024, image_resolution=RES, vision_layers=(1, 1, 1, 1), vision_width=16,
            vision_patch_size=None, context_length=77, vocab_size=49408,
            transformer_width=128, transformer_heads=2, transformer_layers=2,
        )
    return model.float().eval()


def _transplant_context2(params, torch_context2, depth=1):
    """Map reference Transformer_v1 state dict onto our TransformerV1 tree."""
    sd = {k: v.detach().numpy() for k, v in torch_context2.state_dict().items()}
    ctx = {}
    for i in range(depth):
        ctx[f"norm_{i}"] = {"scale": sd[f"layers.{i}.0.norm.weight"], "bias": sd[f"layers.{i}.0.norm.bias"]}
        ctx[f"attn_{i}"] = {
            "to_q": {"kernel": sd[f"layers.{i}.0.fn.to_q.weight"].T},
            "to_k": {"kernel": sd[f"layers.{i}.0.fn.to_k.weight"].T},
            "to_v": {"kernel": sd[f"layers.{i}.0.fn.to_v.weight"].T},
            "to_out": {"kernel": sd[f"layers.{i}.0.fn.to_out.0.weight"].T, "bias": sd[f"layers.{i}.0.fn.to_out.0.bias"]},
        }
        ctx[f"ff_{i}"] = {
            "fc1": {"kernel": sd[f"layers.{i}.1.net.0.weight"].T, "bias": sd[f"layers.{i}.1.net.0.bias"]},
            "fc2": {"kernel": sd[f"layers.{i}.1.net.3.weight"].T, "bias": sd[f"layers.{i}.1.net.3.bias"]},
        }
    params["context2"] = jax.tree_util.tree_map(jnp.asarray, ctx)


def _make_episode(seed, shot=SHOT):
    rng = np.random.RandomState(seed)
    s, q = WAY * shot, WAY * QPC
    perm_s, perm_q = rng.permutation(s), rng.permutation(q)
    sl = np.repeat(np.arange(WAY), shot)[perm_s]
    ql = np.repeat(np.arange(WAY), QPC)[perm_q]
    classes = rng.choice(len(TEST_CLASSES), WAY, replace=False)
    sup = rng.randn(s, T, RES, RES, 3).astype(np.float32)
    tgt = rng.randn(q, T, RES, RES, 3).astype(np.float32)
    ep = Episode(
        support_images=jnp.asarray(sup),
        support_labels=jnp.asarray(sl.astype(np.int32)),
        real_support_labels=jnp.asarray(classes[sl].astype(np.int32)),
        target_images=jnp.asarray(tgt),
        target_labels=jnp.asarray(ql.astype(np.int32)),
        real_target_labels=jnp.asarray(classes[ql].astype(np.int32)),
        batch_class_list=jnp.asarray(classes.astype(np.int32)),
    )
    task_dict = {
        "support_set": torch.from_numpy(sup.transpose(0, 1, 4, 2, 3).reshape(s * T, 3, RES, RES)),
        "support_labels": torch.from_numpy(sl.astype(np.int64)),
        "real_support_labels": torch.from_numpy(classes[sl].astype(np.int64)),
        "target_set": torch.from_numpy(tgt.transpose(0, 1, 4, 2, 3).reshape(q * T, 3, RES, RES)),
        "target_labels": torch.from_numpy(ql.astype(np.int64)),
    }
    return ep, task_dict


class _Pair:
    """A reference head and our head sharing identical weights."""

    def __init__(self, vision: str, **train_flags):
        ref_clip = _tiny_ref_clip(vision)
        backbone_name = "ViT-B/16" if vision == "vit" else "RN50"
        cfg = make_reference_cfg(backbone_name, TRAIN_CLASSES, TEST_CLASSES, T, way=WAY, shot=SHOT, **train_flags)

        orig_load = fs.load
        fs.load = lambda *a, **k: (ref_clip, None)
        try:
            torch.manual_seed(1)
            self.ref = fs.CNN_OTAM_CLIPFSAR(cfg).float()
        finally:
            fs.load = orig_load
        zero_dropout(self.ref)
        self.ref.eval()

        arch, variables = convert_openai_clip({k: v for k, v in ref_clip.state_dict().items()})
        self.arch, self.variables = arch, variables
        self.train_bn = vision != "vit"  # reference trains RN BatchNorm
        hc = CLIPFSARConfig(
            way=WAY,
            num_frames=T,
            use_classification=bool(train_flags.get("USE_CLASSIFICATION", False)),
            merge_before=bool(train_flags.get("MERGE_BEFORE", False)),
            combine=bool(train_flags.get("COMBINE", False)),
            eval_text=bool(train_flags.get("EVAL_TEXT", False)),
            single_direct=bool(train_flags.get("SINGLE_DIRECT", False)),
            text_coff=train_flags.get("TEXT_COFF"),
        )
        self.head = CLIPFSARHead(arch=arch, head_cfg=hc, train_backbone_bn=self.train_bn)

        params = dict(variables["params"].pop("visual").items())
        head_params = {"backbone": params, "scale": jnp.asarray(self.ref.scale.detach().numpy())}
        _transplant_context2(head_params, self.ref.context2)
        self.head_vars = {"params": head_params}
        if "batch_stats" in variables:
            self.head_vars["batch_stats"] = {"backbone": variables["batch_stats"]["visual"]}

        self.text_train = jnp.asarray(self.ref.text_features_train.detach().numpy())
        self.text_test = jnp.asarray(self.ref.text_features_test.detach().numpy())

    def run_ref(self, task_dict, train: bool):
        self.ref.train(train)
        with torch.no_grad():
            out = self.ref(task_dict)
        self.ref.eval()
        return {k: (v.detach().numpy() if v is not None else None) for k, v in out.items()}

    def run_ours(self, ep, train: bool):
        kw = {}
        if train and self.head.train_backbone_bn and "batch_stats" in self.head_vars:
            kw["mutable"] = ["batch_stats"]
        out = self.head.apply(self.head_vars, ep, self.text_train, self.text_test, train=train, deterministic=True, **kw)
        if kw:
            out = out[0]
        return {k: (np.asarray(v) if v is not None else None) for k, v in out.items()}


@pytest.fixture(scope="module")
def vit_pair():
    return _Pair("vit", USE_CLASSIFICATION=True)


# --------------------------------------------------------------------------
# text chain: tokenizer + text tower + converter vs reference encode_text
# --------------------------------------------------------------------------


def test_text_features_match_reference(vit_pair):
    prompts = [f"a photo of {c}" for c in TRAIN_CLASSES]
    ref_tokens = fs.tokenize(prompts).numpy()
    our_tokens = tokenize(prompts)
    np.testing.assert_array_equal(our_tokens, ref_tokens)

    clip = CLIP(arch=vit_pair.arch)
    ours = clip.apply(vit_pair.variables, jnp.asarray(our_tokens), method=CLIP.encode_text)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(vit_pair.text_train), rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------------------
# head logits parity
# --------------------------------------------------------------------------


def _assert_logits_match(pair, train: bool, seed: int, shot: int = SHOT, atol=5e-4, check_class_logits=True):
    ep, task_dict = _make_episode(seed, shot=shot)
    ref = pair.run_ref(task_dict, train=train)
    ours = pair.run_ours(ep, train=train)
    np.testing.assert_allclose(ours["logits"], ref["logits"], rtol=1e-4, atol=atol)
    if check_class_logits and ref.get("class_logits") is not None:
        assert ours["class_logits"] is not None
        np.testing.assert_allclose(ours["class_logits"], ref["class_logits"], rtol=1e-4, atol=atol)


def test_vit_train_logits_parity(vit_pair):
    _assert_logits_match(vit_pair, train=True, seed=10)


def test_vit_eval_plain_logits_parity(vit_pair):
    _assert_logits_match(vit_pair, train=False, seed=11)


def test_vit_eval_merge_before_5shot_parity():
    pair = _Pair("vit", USE_CLASSIFICATION=True, MERGE_BEFORE=True)
    _assert_logits_match(pair, train=False, seed=12, shot=5)


def test_vit_eval_combine_parity():
    pair = _Pair("vit", USE_CLASSIFICATION=True, COMBINE=True)
    _assert_logits_match(pair, train=False, seed=13, check_class_logits=False)


def test_vit_eval_text_zero_shot_parity():
    pair = _Pair("vit", USE_CLASSIFICATION=True, EVAL_TEXT=True)
    ep, task_dict = _make_episode(14)
    ref = pair.run_ref(task_dict, train=False)
    ours = pair.run_ours(ep, train=False)
    # reference returns cum_dists = -softmax and logits = -class_dists where
    # class_dists is the class-mean of cum_dists -> logits == mean softmax
    np.testing.assert_allclose(ours["logits"], ref["logits"], rtol=1e-4, atol=5e-4)


def test_vit_single_direct_parity():
    pair = _Pair("vit", USE_CLASSIFICATION=True, SINGLE_DIRECT=True)
    _assert_logits_match(pair, train=False, seed=15)


def test_rn50_eval_logits_parity():
    pair = _Pair("rn", USE_CLASSIFICATION=True)
    _assert_logits_match(pair, train=False, seed=16, atol=1e-3)


def test_rn50_train_logits_parity_batch_stat_bn():
    """Train-mode RN BatchNorm runs on batch statistics in the reference
    (model.train(), no BN.FREEZE); our head must match with
    train_backbone_bn=True."""
    pair = _Pair("rn", USE_CLASSIFICATION=True)
    _assert_logits_match(pair, train=True, seed=17, atol=1e-3)


def test_reference_pyth_checkpoint_loads_and_matches(tmp_path, vit_pair):
    """A reference-format .pyth checkpoint (torch.save of
    {'model_state': head.state_dict()}, utils/checkpoint.py:122-129)
    converts into our head tree and reproduces the reference logits —
    released reference checkpoints evaluate in this framework via
    TEST.CHECKPOINT_FILE_PATH."""
    import os

    from clip_fsar_tpu.train.pretrain import load_checkpoint_file
    from clip_fsar_tpu.config import Config

    path = os.path.join(tmp_path, "ckpt.pyth")
    torch.save({"epoch": 3, "model_state": {f"head.{k}": v for k, v in vit_pair.ref.state_dict().items()}}, path)

    template = jax.tree_util.tree_map(jnp.zeros_like, vit_pair.head_vars)
    cfg = Config({"TRAIN": {}})
    variables, ok = load_checkpoint_file(cfg, path, template)
    assert ok

    ep, task = _make_episode(30)
    with torch.no_grad():
        want = vit_pair.ref(task)["logits"].numpy()
    got = vit_pair.head.apply(variables, ep, vit_pair.text_train, vit_pair.text_test, train=False, deterministic=True)
    np.testing.assert_allclose(np.asarray(got["logits"]), want, rtol=1e-4, atol=5e-4)
