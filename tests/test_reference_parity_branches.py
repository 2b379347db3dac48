"""Video-backbone branch parity: identical weights into the reference
branch modules (models/module_zoo/branches/*) and our flax branches must
give identical outputs in eval mode (frozen BN stats transplanted).

Covers: CSN, SlowFast, R2D3D (simple + bottleneck), R(2+1)D (simple +
bottleneck), NonLocal, and the full TAdaConvBlockAvgPool bottleneck.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from reference_oracle import NS, import_reference_few_shot

import_reference_few_shot()

from clip_fsar_tpu.config import Config
from clip_fsar_tpu.models.video import branches as vb  # noqa: F401 (registers)
from clip_fsar_tpu.models.video.blocks import resolve_block_params
from clip_fsar_tpu.utils.registry import BRANCH_REGISTRY

STAGE, BLOCK = 1, 0
T_FRAMES, RES = 4, 16


def _cfg_pair(depth, branch_name, branch_extra=None):
    bb = {
        "DEPTH": depth,
        "NUM_FILTERS": [8, 16],
        "DOWNSAMPLING": [True, True],
        "DOWNSAMPLING_TEMPORAL": [False, False],
        "KERNEL_SIZE": [[1, 7, 7], [3, 3, 3]],
        "EXPANSION_RATIO": 2,
        "STEM": {"NAME": "Base3DStem"},
        "TEMPORAL_CONV_BOTTLENECK": [True, True],
        "BRANCH": {"NAME": branch_name, **(branch_extra or {})},
    }
    ref = NS(
        VISUALIZATION=NS(ENABLE=False, FEATURE_MAPS=NS(ENABLE=False)),
        VIDEO=NS(BACKBONE=NS(
            DEPTH=depth, NUM_FILTERS=[8, 16], DOWNSAMPLING=[True, True],
            DOWNSAMPLING_TEMPORAL=[False, False], KERNEL_SIZE=[[1, 7, 7], [3, 3, 3]],
            EXPANSION_RATIO=2, STEM=NS(NAME="Base3DStem"),
            BRANCH=NS(NAME=branch_name, **(branch_extra or {})),
            TEMPORAL_CONV_BOTTLENECK=[True, True],
        )),
        BN=NS(MOMENTUM=0.1, EPS=1e-5),
        DATA=NS(TRAIN_CROP_SIZE=RES, NUM_INPUT_FRAMES=T_FRAMES),
    )
    ours = Config({
        "VIDEO": {"BACKBONE": bb},
        "BN": {"MOMENTUM": 0.1, "EPS": 1e-5},
        "DATA": {"TRAIN_CROP_SIZE": RES, "NUM_INPUT_FRAMES": T_FRAMES},
    })
    return ref, ours


def _c3(w):  # torch [O, I(/g), kt, kh, kw] -> flax [kt, kh, kw, I(/g), O]
    return w.transpose(2, 3, 4, 1, 0)


def _transplant(ref):
    """Map a reference branch state dict onto our flax naming: convs keep
    their attribute name; BN 'x_bn' -> x_bn/BatchNorm_0."""
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats = {}, {}
    for key, val in sd.items():
        parts = key.split(".")
        name, leaf = parts[0], parts[-1]
        if name == "b_avgpool_bn":  # our TAda pooled BN is a bare nn.BatchNorm
            node = params.setdefault(name, {})
            snode = stats.setdefault(name, {})
            if leaf == "weight":
                node["scale"] = val
            elif leaf == "bias":
                node["bias"] = val
            elif leaf == "running_mean":
                snode["mean"] = val
            elif leaf == "running_var":
                snode["var"] = val
        elif "bn" in name:
            node = params.setdefault(name, {}).setdefault("BatchNorm_0", {})
            snode = stats.setdefault(name, {}).setdefault("BatchNorm_0", {})
            if leaf == "weight":
                node["scale"] = val
            elif leaf == "bias":
                node["bias"] = val
            elif leaf == "running_mean":
                snode["mean"] = val
            elif leaf == "running_var":
                snode["var"] = val
        elif name == "b_rf":  # TAda routing submodule
            sub = parts[1]
            if sub == "bn":
                tgt = params.setdefault("b_rf", {}).setdefault("bn", {}).setdefault("BatchNorm_0", {})
                stgt = stats.setdefault("b_rf", {}).setdefault("bn", {}).setdefault("BatchNorm_0", {})
                if leaf == "weight":
                    tgt["scale"] = val
                elif leaf == "bias":
                    tgt["bias"] = val
                elif leaf == "running_mean":
                    stgt["mean"] = val
                elif leaf == "running_var":
                    stgt["var"] = val
            else:
                tgt = params.setdefault("b_rf", {}).setdefault(sub, {})
                if leaf == "weight":
                    tgt["kernel"] = _c3(val)
                else:
                    tgt["bias"] = val
        elif leaf == "weight":
            if name == "b" and val.ndim == 6:  # TAdaConv2d base weight [1,1,O,I,kh,kw]
                params.setdefault("b", {}).setdefault("conv", {})["kernel"] = val[0, 0].transpose(2, 3, 1, 0)[None]
            else:
                params.setdefault(name, {})["kernel"] = _c3(val)
        elif leaf == "bias":
            params.setdefault(name, {})["bias"] = val
    return (
        jax.tree_util.tree_map(jnp.asarray, params),
        jax.tree_util.tree_map(jnp.asarray, stats),
    )


def _run_pair(ref_cls_name, depth, branch_extra=None, atol=1e-5, stage=STAGE, block=BLOCK, c_in=8):
    import models.module_zoo.branches.csn_branch  # noqa: F401
    import models.module_zoo.branches.non_local  # noqa: F401
    import models.module_zoo.branches.r2d3d_branch  # noqa: F401
    import models.module_zoo.branches.r2plus1d_branch  # noqa: F401
    import models.module_zoo.branches.slowfast_branch  # noqa: F401
    import models.module_zoo.branches.tada_branch  # noqa: F401
    from models.base.base_blocks import BRANCH_REGISTRY as REF_BRANCHES

    ref_cfg, our_cfg = _cfg_pair(depth, ref_cls_name, branch_extra)
    torch.manual_seed(0)
    ref = REF_BRANCHES.get(ref_cls_name)(ref_cfg, [stage, block]).float().eval()
    # randomize zero-initialized paths so parity is non-trivial
    for name, p_ in ref.named_parameters():
        if p_.abs().sum() == 0:
            torch.nn.init.normal_(p_, std=0.3)

    rng = np.random.RandomState(11)
    x = rng.randn(2, c_in, T_FRAMES, RES // 4, RES // 4).astype(np.float32)  # [B, C, T, H, W]
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    params, stats = _transplant(ref)
    ours_cls = BRANCH_REGISTRY.get(ref_cls_name)
    p = resolve_block_params(our_cfg, stage, block)
    ours = ours_cls(cfg=our_cfg, p=p, train_bn=False)
    variables = {"params": params}
    if jax.tree_util.tree_leaves(stats):
        variables["batch_stats"] = stats
    got = ours.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
    np.testing.assert_allclose(
        np.asarray(got), want.transpose(0, 2, 3, 4, 1), rtol=1e-4, atol=atol
    )


def test_csn_branch_parity():
    _run_pair("CSNBranch", depth=50)


def test_slowfast_branch_parity():
    _run_pair("SlowfastBranch", depth=50, branch_extra=None)


@pytest.mark.parametrize("depth", [18, 50])
def test_r2d3d_branch_parity(depth):
    _run_pair("R2D3DBranch", depth=depth)


@pytest.mark.parametrize("depth", [18, 50])
def test_r2plus1d_branch_parity(depth):
    _run_pair("R2Plus1DBranch", depth=depth)


def test_tada_branch_parity():
    _run_pair("TAdaConvBlockAvgPool", depth=50, branch_extra={"ROUTE_FUNC_R": 2, "ROUTE_FUNC_K": [3, 3], "POOL_K": [3, 1, 1]})


def test_nonlocal_parity():
    # residual add requires dim_in == num_filters: use a non-first block
    _run_pair("NonLocal", depth=50, stage=1, block=1, c_in=16)


def test_s3dg_inception_block_parity():
    """S3DG InceptionBlock3D with STConv3d branches and self-gating
    (reference s3dg_branch.py:13-160, base_blocks.py:217-239)."""
    import models.module_zoo.branches.s3dg_branch as sb

    from clip_fsar_tpu.models.video.meta import InceptionBlock3D as OurBlock

    in_planes, out_planes = 8, [4, 6, 8, 6, 8, 4]
    ref_cfg, our_cfg = _cfg_pair(50, "STConv3d", {"GATING": True})
    torch.manual_seed(1)
    ref = sb.InceptionBlock3D(ref_cfg, in_planes, out_planes).float().eval()
    # conv inits are std=0.01; bump for non-trivial activations
    for name, p_ in ref.named_parameters():
        if "conv" in name:
            torch.nn.init.normal_(p_, std=0.2)

    rng = np.random.RandomState(12)
    x = rng.randn(2, in_planes, T_FRAMES, 8, 8).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    def base_conv(prefix):
        return {
            "conv": {"kernel": _c3(sd[f"{prefix}.conv.weight"])},
            "bn": {"BatchNorm_0": {"scale": sd[f"{prefix}.bn.weight"], "bias": sd[f"{prefix}.bn.bias"]}},
        }

    def base_conv_stats(prefix):
        return {"bn": {"BatchNorm_0": {"mean": sd[f"{prefix}.bn.running_mean"], "var": sd[f"{prefix}.bn.running_var"]}}}

    def st_conv(prefix):
        return {
            "conv1": {"kernel": _c3(sd[f"{prefix}.conv1.weight"])},
            "conv2": {"kernel": _c3(sd[f"{prefix}.conv2.weight"])},
            "bn1": {"BatchNorm_0": {"scale": sd[f"{prefix}.bn1.weight"], "bias": sd[f"{prefix}.bn1.bias"]}},
            "bn2": {"BatchNorm_0": {"scale": sd[f"{prefix}.bn2.weight"], "bias": sd[f"{prefix}.bn2.bias"]}},
        }

    def st_conv_stats(prefix):
        return {
            "bn1": {"BatchNorm_0": {"mean": sd[f"{prefix}.bn1.running_mean"], "var": sd[f"{prefix}.bn1.running_var"]}},
            "bn2": {"BatchNorm_0": {"mean": sd[f"{prefix}.bn2.running_mean"], "var": sd[f"{prefix}.bn2.running_var"]}},
        }

    params = {
        "branch0": base_conv("branch0.0"),
        "branch1_0": base_conv("branch1.0"),
        "branch1_1": st_conv("branch1.1"),
        "branch2_0": base_conv("branch2.0"),
        "branch2_1": st_conv("branch2.1"),
        "branch3": base_conv("branch3.1"),
    }
    stats = {
        "branch0": base_conv_stats("branch0.0"),
        "branch1_0": base_conv_stats("branch1.0"),
        "branch1_1": st_conv_stats("branch1.1"),
        "branch2_0": base_conv_stats("branch2.0"),
        "branch2_1": st_conv_stats("branch2.1"),
        "branch3": base_conv_stats("branch3.1"),
    }
    for i in range(4):
        params[f"gating_b{i}"] = {
            "fc": {"kernel": sd[f"gating_b{i}.fc.weight"].T, "bias": sd[f"gating_b{i}.fc.bias"]}
        }

    ours = OurBlock(cfg=our_cfg, out_planes=out_planes)
    got = ours.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params), "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
        jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
    )
    np.testing.assert_allclose(np.asarray(got), want.transpose(0, 2, 3, 4, 1), rtol=1e-4, atol=1e-5)


def test_vivit_factorized_transformer_parity():
    """ViViT factorized encoder (reference transformer.py:285-398):
    per-frame spatial encoder -> temporal encoder over frame cls tokens,
    PatchEmbedStem + BaseTransformerLayer blocks, full backbone
    transplant."""
    import models.base.transformer as rt

    from clip_fsar_tpu.models.video.transformer import FactorizedTransformer as OurFT

    f, depth, depth_temp, patch, res, t = 16, 2, 1, 4, 8, 2
    bb = {
        "NUM_FEATURES": f, "PATCH_SIZE": patch, "DEPTH": depth, "DEPTH_TEMP": depth_temp,
        "DROP_PATH": 0.0, "NUM_HEADS": 2, "ATTN_DROPOUT": 0.1, "FF_DROPOUT": 0.1, "MLP_MULT": 4,
        "STEM": {"NAME": "PatchEmbedStem"}, "BRANCH": {"NAME": "BaseTransformerLayer"},
    }
    ref_cfg = NS(
        VISUALIZATION=NS(ENABLE=False, FEATURE_MAPS=NS(ENABLE=False)),
        VIDEO=NS(BACKBONE=NS(
            NUM_FEATURES=f, PATCH_SIZE=patch, DEPTH=depth, DEPTH_TEMP=depth_temp, DROP_PATH=0.0,
            NUM_HEADS=2, ATTN_DROPOUT=0.1, FF_DROPOUT=0.1, MLP_MULT=4,
            STEM=NS(NAME="PatchEmbedStem"), BRANCH=NS(NAME="BaseTransformerLayer"),
        )),
        DATA=NS(TRAIN_CROP_SIZE=res, NUM_INPUT_FRAMES=t, NUM_INPUT_CHANNELS=3),
        BN=NS(MOMENTUM=0.1, EPS=1e-5),
    )
    our_cfg = Config({
        "VIDEO": {"BACKBONE": bb},
        "DATA": {"TRAIN_CROP_SIZE": res, "NUM_INPUT_FRAMES": t, "NUM_INPUT_CHANNELS": 3},
        "BN": {"MOMENTUM": 0.1, "EPS": 1e-5},
    })

    torch.manual_seed(2)
    from reference_oracle import zero_dropout

    ref = rt.FactorizedTransformer(ref_cfg).float()
    zero_dropout(ref)
    ref.eval()
    # pos embeddings init to trunc_normal(0.02); bump for signal
    torch.nn.init.normal_(ref.pos_embd, std=0.3)
    torch.nn.init.normal_(ref.temp_embd, std=0.3)

    rng = np.random.RandomState(13)
    x = rng.randn(2, 3, t, res, res).astype(np.float32)  # [B, C, T, H, W]
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    def layer(prefix):
        return {
            "norm": {"scale": sd[f"{prefix}.norm.weight"], "bias": sd[f"{prefix}.norm.bias"]},
            "attn": {
                "to_qkv": {"kernel": sd[f"{prefix}.attn.to_qkv.weight"].T, "bias": sd[f"{prefix}.attn.to_qkv.bias"]},
                "proj": {"kernel": sd[f"{prefix}.attn.proj.weight"].T, "bias": sd[f"{prefix}.attn.proj.bias"]},
            },
            "norm_ffn": {"scale": sd[f"{prefix}.norm_ffn.weight"], "bias": sd[f"{prefix}.norm_ffn.bias"]},
            "ffn": {
                "fc1": {"kernel": sd[f"{prefix}.ffn.net.0.weight"].T, "bias": sd[f"{prefix}.ffn.net.0.bias"]},
                "fc2": {"kernel": sd[f"{prefix}.ffn.net.3.weight"].T, "bias": sd[f"{prefix}.ffn.net.3.bias"]},
            },
        }

    params = {
        "stem": {"conv1": {"kernel": _c3(sd["stem.conv1.weight"]), "bias": sd["stem.conv1.bias"]}},
        "cls_token": sd["cls_token"],
        "cls_token_out": sd["cls_token_out"],
        "pos_embd": sd["pos_embd"],
        "temp_embd": sd["temp_embd"],
        "norm": {"scale": sd["norm.weight"], "bias": sd["norm.bias"]},
        "norm_out": {"scale": sd["norm_out.weight"], "bias": sd["norm_out.bias"]},
    }
    for i in range(depth):
        params[f"layers_{i}"] = layer(f"layers.{i}")
    for i in range(depth_temp):
        params[f"layers_temporal_{i}"] = layer(f"layers_temporal.{i}")

    ours = OurFT(cfg=our_cfg)
    got = ours.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x.transpose(0, 2, 3, 4, 1)), deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_slowfast_fuse_parity():
    """Lateral fast->slow fusion (reference slowfast.py:119-152)."""
    import models.base.slowfast as rs

    from clip_fsar_tpu.models.video.meta import FuseFastToSlow as OurFuse

    fast_cfg = NS(
        VIDEO=NS(BACKBONE=NS(
            NUM_FILTERS=[8, 16],
            SLOWFAST=NS(CONV_CHANNEL_RATIO=2, KERNEL_SIZE=5, ALPHA=4, FUSION_CONV_BIAS=False,
                        FUSION_BN=True, FUSION_RELU=True),
        )),
        BN=NS(EPS=1e-5, MOMENTUM=0.1),
    )
    torch.manual_seed(3)
    ref = rs.FuseFastToSlow((None, fast_cfg), stage_idx=1, mode="slowfast").float().eval()

    rng = np.random.RandomState(14)
    x_slow = rng.randn(2, 32, 2, 4, 4).astype(np.float32)  # [B, C, T/alpha, H, W]
    x_fast = rng.randn(2, 16, 8, 4, 4).astype(np.float32)
    with torch.no_grad():
        want_slow, want_fast = ref(torch.from_numpy(x_slow), torch.from_numpy(x_fast))

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "conv_f2s": {"kernel": _c3(sd["conv_fast_to_slow.weight"])},
        "bn": {"BatchNorm_0": {"scale": sd["bn.weight"], "bias": sd["bn.bias"]}},
    }
    stats = {"bn": {"BatchNorm_0": {"mean": sd["bn.running_mean"], "var": sd["bn.running_var"]}}}

    ours = OurFuse(dim_in=16, fusion_conv_channel_ratio=2, fusion_kernel=5, alpha=4)
    got_slow, got_fast = ours.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params), "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
        jnp.asarray(x_slow.transpose(0, 2, 3, 4, 1)), jnp.asarray(x_fast.transpose(0, 2, 3, 4, 1)),
    )
    np.testing.assert_allclose(np.asarray(got_slow), want_slow.numpy().transpose(0, 2, 3, 4, 1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_fast), want_fast.numpy().transpose(0, 2, 3, 4, 1), rtol=1e-6, atol=1e-7)


def test_transformer_and_slowfast_heads_parity():
    """Classification heads vs reference modules: TransformerHead with
    tanh pre-logits (transformer_head.py:16-75) and SlowFastHead two-
    pathway GAP+concat+FC (slowfast_head.py:14-105)."""
    import models.module_zoo.heads.slowfast_head as sh
    import models.module_zoo.heads.transformer_head as th

    from clip_fsar_tpu.models.video.model import SlowFastHead as OurSF, TransformerHead as OurTH

    dim, ncls = 12, 5
    ref_cfg = NS(
        VISUALIZATION=NS(ENABLE=False, FEATURE_MAPS=NS(ENABLE=False)),
        VIDEO=NS(BACKBONE=NS(NUM_FEATURES=dim, NUM_OUT_FEATURES=dim),
                 HEAD=NS(NUM_CLASSES=ncls, DROPOUT_RATE=0.0, ACTIVATION="softmax", PRE_LOGITS=True)),
    )
    torch.manual_seed(6)
    ref = th.TransformerHead(ref_cfg).float().eval()
    rng = np.random.RandomState(18)
    x = rng.randn(4, dim).astype(np.float32)
    with torch.no_grad():
        want, _ = ref(torch.from_numpy(x))

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    our_cfg = Config({"VIDEO": {"HEAD": {"NUM_CLASSES": ncls, "DROPOUT_RATE": 0.0, "ACTIVATION": "softmax", "PRE_LOGITS": True}}})
    params = {
        "pre_logits": {"kernel": sd["pre_logits.fc.weight"].T, "bias": sd["pre_logits.fc.bias"]},
        "linear": {"kernel": sd["linear.weight"].T, "bias": sd["linear.bias"]},
    }
    got, _ = OurTH(cfg=our_cfg).apply({"params": jax.tree_util.tree_map(jnp.asarray, params)}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-6)

    # SlowFast head: reference input is [slow NCTHW, fast NCTHW];
    # slowfast-mode dim = slow + slow//BETA
    beta = 4
    sf_ref_cfg = NS(
        VISUALIZATION=NS(ENABLE=False, FEATURE_MAPS=NS(ENABLE=False)),
        VIDEO=NS(BACKBONE=NS(NUM_OUT_FEATURES=dim, SLOWFAST=NS(MODE="slowfast", BETA=beta)),
                 HEAD=NS(NUM_CLASSES=ncls, DROPOUT_RATE=0.0, ACTIVATION="softmax")),
    )
    torch.manual_seed(7)
    sf_ref = sh.SlowFastHead(sf_ref_cfg).float().eval()
    slow = rng.randn(3, dim, 2, 4, 4).astype(np.float32)
    fast = rng.randn(3, dim // beta, 8, 4, 4).astype(np.float32)
    with torch.no_grad():
        sf_want, _ = sf_ref([torch.from_numpy(slow), torch.from_numpy(fast)])

    sf_sd = {k: v.detach().numpy() for k, v in sf_ref.state_dict().items()}
    sf_cfg = Config({"VIDEO": {"HEAD": {"NUM_CLASSES": ncls, "DROPOUT_RATE": 0.0, "ACTIVATION": "softmax", "MODE": "slowfast"}}})
    sf_params = {"out": {"kernel": sf_sd["out.weight"].T, "bias": sf_sd["out.bias"]}}
    sf_got, _ = OurSF(cfg=sf_cfg).apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, sf_params)},
        [jnp.asarray(slow.transpose(0, 2, 3, 4, 1)), jnp.asarray(fast.transpose(0, 2, 3, 4, 1))],
        train=False,
    )
    np.testing.assert_allclose(np.asarray(sf_got), sf_want.numpy(), rtol=1e-5, atol=1e-6)


def test_resnet3d_backbone_parity():
    """Full ResNet3D meta-arch (reference backbone.py:30-89): Base3DStem +
    four Base3DResStage stages of R2D3D blocks with shortcut convs —
    validates the stage/stride/shortcut wiring end to end (depth 10:
    one block per stage)."""
    import models.base.backbone as rb

    from clip_fsar_tpu.models.video.meta import ResNet3D as OurRN

    depth = 10
    bb = {
        "DEPTH": depth,
        "NUM_FILTERS": [4, 8, 8, 16, 16],
        "DOWNSAMPLING": [True, False, True, True, True],
        "DOWNSAMPLING_TEMPORAL": [False, False, False, True, False],
        "KERNEL_SIZE": [[1, 3, 3], [1, 3, 3], [1, 3, 3], [3, 3, 3], [3, 3, 3]],
        "EXPANSION_RATIO": 2,
        "INITIALIZATION": "kaiming",
        "STEM": {"NAME": "Base3DStem"},
        "BRANCH": {"NAME": "R2D3DBranch"},
        "NONLOCAL": {"ENABLE": False, "STAGES": []},
    }
    ref_cfg = NS(
        VISUALIZATION=NS(ENABLE=False, FEATURE_MAPS=NS(ENABLE=False)),
        VIDEO=NS(BACKBONE=NS(
            DEPTH=depth, NUM_FILTERS=bb["NUM_FILTERS"], DOWNSAMPLING=bb["DOWNSAMPLING"],
            DOWNSAMPLING_TEMPORAL=bb["DOWNSAMPLING_TEMPORAL"], KERNEL_SIZE=bb["KERNEL_SIZE"],
            EXPANSION_RATIO=2, INITIALIZATION="kaiming", NUM_INPUT_CHANNELS=3,
            STEM=NS(NAME="Base3DStem"), BRANCH=NS(NAME="R2D3DBranch"),
            NONLOCAL=NS(ENABLE=False, STAGES=[]),
        )),
        BN=NS(MOMENTUM=0.1, EPS=1e-5),
        DATA=NS(TRAIN_CROP_SIZE=16, NUM_INPUT_FRAMES=4),
    )
    our_cfg = Config({
        "VIDEO": {"BACKBONE": bb},
        "BN": {"MOMENTUM": 0.1, "EPS": 1e-5},
        "DATA": {"TRAIN_CROP_SIZE": 16, "NUM_INPUT_FRAMES": 4},
    })

    torch.manual_seed(8)
    ref = rb.ResNet3D(ref_cfg).float().eval()
    rng = np.random.RandomState(19)
    x = rng.randn(2, 3, 4, 16, 16).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats = {}, {}

    def put(pfx_ours, pfx_ref):
        """map one conv/bn pair namespace"""
        for key in list(sd):
            if not key.startswith(pfx_ref + "."):
                continue
            rest = key[len(pfx_ref) + 1 :]
            parts = rest.split(".")
            leaf = parts[-1]
            mod = ".".join(parts[:-1])
            if "bn" in mod.split(".")[-1] or mod.endswith("short_cut_bn"):
                tgt = params
                node = tgt.setdefault(pfx_ours, {})
                for p_ in mod.split("."):
                    node = node.setdefault(p_, {})
                node = node.setdefault("BatchNorm_0", {})
                snode = stats.setdefault(pfx_ours, {})
                for p_ in mod.split("."):
                    snode = snode.setdefault(p_, {})
                snode = snode.setdefault("BatchNorm_0", {})
                if leaf == "weight":
                    node["scale"] = sd[key]
                elif leaf == "bias":
                    node["bias"] = sd[key]
                elif leaf == "running_mean":
                    snode["mean"] = sd[key]
                elif leaf == "running_var":
                    snode["var"] = sd[key]
            elif leaf == "weight":
                node = params.setdefault(pfx_ours, {})
                for p_ in mod.split("."):
                    node = node.setdefault(p_, {})
                node["kernel"] = _c3(sd[key])
            elif leaf == "bias":
                node = params.setdefault(pfx_ours, {})
                for p_ in mod.split("."):
                    node = node.setdefault(p_, {})
                node["bias"] = sd[key]

    for name in ("conv1", "conv2", "conv3", "conv4", "conv5"):
        put(name, name)

    got = OurRN(cfg=our_cfg).apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params), "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
        jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
    )
    np.testing.assert_allclose(np.asarray(got), want.transpose(0, 2, 3, 4, 1), rtol=1e-4, atol=1e-4)


def test_inception3d_backbone_parity():
    """Full S3DG Inception3D backbone (reference backbone.py:91-180):
    stem + 2b/2c convs + 9 inception blocks + max-pools, with self-gating,
    validating the channel table and pooling placement end to end."""
    import models.base.backbone as rb

    from clip_fsar_tpu.models.video.meta import Inception3D as OurI3D

    ref_cfg = NS(
        VISUALIZATION=NS(ENABLE=False, FEATURE_MAPS=NS(ENABLE=False)),
        VIDEO=NS(BACKBONE=NS(STEM=NS(NAME="STConv3d"), BRANCH=NS(NAME="STConv3d", GATING=True))),
        DATA=NS(NUM_INPUT_CHANNELS=3),
        BN=NS(MOMENTUM=0.1, EPS=1e-5),
    )
    our_cfg = Config({
        "VIDEO": {"BACKBONE": {"STEM": {"NAME": "STConv3d"}, "BRANCH": {"NAME": "STConv3d", "GATING": True}}},
        "DATA": {"NUM_INPUT_CHANNELS": 3},
        "BN": {"MOMENTUM": 0.1, "EPS": 1e-5},
    })
    torch.manual_seed(10)
    ref = rb.Inception3D(ref_cfg).float().eval()
    # s3d convs init at std=0.01; bump for non-trivial activations
    for name, p_ in ref.named_parameters():
        if "conv" in name.lower() and p_.ndim == 5:
            torch.nn.init.normal_(p_, std=0.08)

    rng = np.random.RandomState(21)
    x = rng.randn(1, 3, 8, 32, 32).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats = {}, {}

    def put_bn(pnode, snode, src):
        pnode["BatchNorm_0"] = {"scale": sd[f"{src}.weight"], "bias": sd[f"{src}.bias"]}
        snode["BatchNorm_0"] = {"mean": sd[f"{src}.running_mean"], "var": sd[f"{src}.running_var"]}

    def put_base(name, src):
        params[name] = {"conv": {"kernel": _c3(sd[f"{src}.conv.weight"])}, "bn": {}}
        stats[name] = {"bn": {}}
        put_bn(params[name]["bn"], stats[name]["bn"], f"{src}.bn")

    def put_st(name, src):
        params[name] = {
            "conv1": {"kernel": _c3(sd[f"{src}.conv1.weight"])},
            "conv2": {"kernel": _c3(sd[f"{src}.conv2.weight"])},
            "bn1": {}, "bn2": {},
        }
        stats[name] = {"bn1": {}, "bn2": {}}
        put_bn(params[name]["bn1"], stats[name]["bn1"], f"{src}.bn1")
        put_bn(params[name]["bn2"], stats[name]["bn2"], f"{src}.bn2")
        if f"{src}.conv1.bias" in sd:
            params[name]["conv1"]["bias"] = sd[f"{src}.conv1.bias"]
        if f"{src}.conv2.bias" in sd:
            params[name]["conv2"]["bias"] = sd[f"{src}.conv2.bias"]

    def put_mixed(name):
        p, s = {}, {}
        for ours_b, ref_b, kind in (
            ("branch0", f"{name}.branch0.0", "base"),
            ("branch1_0", f"{name}.branch1.0", "base"),
            ("branch1_1", f"{name}.branch1.1", "st"),
            ("branch2_0", f"{name}.branch2.0", "base"),
            ("branch2_1", f"{name}.branch2.1", "st"),
            ("branch3", f"{name}.branch3.1", "base"),
        ):
            if kind == "base":
                p[ours_b] = {"conv": {"kernel": _c3(sd[f"{ref_b}.conv.weight"])}, "bn": {}}
                s[ours_b] = {"bn": {}}
                put_bn(p[ours_b]["bn"], s[ours_b]["bn"], f"{ref_b}.bn")
            else:
                p[ours_b] = {
                    "conv1": {"kernel": _c3(sd[f"{ref_b}.conv1.weight"])},
                    "conv2": {"kernel": _c3(sd[f"{ref_b}.conv2.weight"])},
                    "bn1": {}, "bn2": {},
                }
                if f"{ref_b}.conv1.bias" in sd:
                    p[ours_b]["conv1"]["bias"] = sd[f"{ref_b}.conv1.bias"]
                if f"{ref_b}.conv2.bias" in sd:
                    p[ours_b]["conv2"]["bias"] = sd[f"{ref_b}.conv2.bias"]
                s[ours_b] = {"bn1": {}, "bn2": {}}
                put_bn(p[ours_b]["bn1"], s[ours_b]["bn1"], f"{ref_b}.bn1")
                put_bn(p[ours_b]["bn2"], s[ours_b]["bn2"], f"{ref_b}.bn2")
        for i in range(4):
            p[f"gating_b{i}"] = {"fc": {"kernel": sd[f"{name}.gating_b{i}.fc.weight"].T, "bias": sd[f"{name}.gating_b{i}.fc.bias"]}}
        params[name] = p
        stats[name] = s

    put_st("Conv_1a", "Conv_1a")
    put_base("Conv_2b", "Conv_2b")
    put_st("Conv_2c", "Conv_2c")
    for m in ("Mixed_3b", "Mixed_3c", "Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f", "Mixed_5b", "Mixed_5c"):
        put_mixed(m)

    got = OurI3D(cfg=our_cfg).apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params), "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
        jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
    )
    np.testing.assert_allclose(np.asarray(got), want.transpose(0, 2, 3, 4, 1), rtol=1e-3, atol=1e-3)


def test_simple_localization_conv_parity():
    """TAL feature backbone: grouped temporal convs + relu stack
    (reference backbone.py:182-218)."""
    import models.base.backbone as rb

    from clip_fsar_tpu.models.video.meta import SimpleLocalizationConv as OurSLC

    dim1d, layers, groups, cin, t = 12, 3, 4, 8, 10
    ref_cfg = NS(
        VISUALIZATION=NS(ENABLE=False, FEATURE_MAPS=NS(ENABLE=False)),
        DATA=NS(NUM_INPUT_CHANNELS=cin),
        VIDEO=NS(DIM1D=dim1d, BACKBONE_LAYER=layers, BACKBONE_GROUPS_NUM=groups),
    )
    torch.manual_seed(11)
    ref = rb.SimpleLocalizationConv(ref_cfg).float().eval()
    rng = np.random.RandomState(22)
    x = rng.randn(2, cin, t).astype(np.float32)
    with torch.no_grad():
        want = ref({"video": torch.from_numpy(x)})["video"].numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {}
    for i in range(layers):
        w = sd[f"conv_layer.{2 * i}.weight"]  # [O, I/g, k]
        params[f"conv_{i}"] = {"kernel": w.transpose(2, 1, 0), "bias": sd[f"conv_layer.{2 * i}.bias"]}

    our_cfg = Config({"VIDEO": {"DIM1D": dim1d, "BACKBONE_LAYER": layers, "BACKBONE_GROUPS_NUM": groups}})
    got = OurSLC(cfg=our_cfg).apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)}, jnp.asarray(x.transpose(0, 2, 1))
    )
    np.testing.assert_allclose(np.asarray(got), want.transpose(0, 2, 1), rtol=1e-5, atol=1e-5)
