"""Backbone meta-architectures (capability of reference
models/base/backbone.py + slowfast.py).

Registered: ResNet3D, Inception3D (S3D/S3DG), SimpleLocalizationConv,
Identity, Slowfast.  All operate on NDHWC video tensors.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from clip_fsar_tpu.models.video.blocks import Base3DResStage, bn, conv3d
from clip_fsar_tpu.models.video.branches import SelfGating, STConv3d
from clip_fsar_tpu.utils.registry import BACKBONE_REGISTRY, BRANCH_REGISTRY, STEM_REGISTRY

_N_CONV_RESNET = {
    10: (1, 1, 1, 1),
    16: (2, 2, 2, 1),
    18: (2, 2, 2, 2),
    26: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


@BACKBONE_REGISTRY.register(name="ResNet3D")
class ResNet3D(nn.Module):
    """Stem + four res-stages (reference backbone.py:30-89)."""

    cfg: Any
    train_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        x = STEM_REGISTRY.get(cfg.VIDEO.BACKBONE.STEM.NAME)(cfg=cfg, train_bn=self.train_bn, dtype=self.dtype, name="conv1")(x)
        blocks = _N_CONV_RESNET[int(cfg.VIDEO.BACKBONE.DEPTH)]
        for stage, n in enumerate(blocks, start=1):
            x = Base3DResStage(cfg, n, stage, train_bn=self.train_bn, dtype=self.dtype, name=f"conv{stage + 1}")(x)
        return x


class InceptionBaseConv3D(nn.Module):
    """conv + bn + relu (reference s3dg_branch.py InceptionBaseConv3D)."""

    out_planes: int
    kernel_size: int
    stride: int = 1
    train_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel_size, self.stride
        x = conv3d(self.out_planes, (k, k, k), (s, s, s), dtype=self.dtype, name="conv")(x)
        return nn.relu(bn(self.train_bn, "bn")(x))


class InceptionBlock3D(nn.Module):
    """Four-branch inception block with optional self-gating
    (reference s3dg_branch.py InceptionBlock3D)."""

    cfg: Any
    out_planes: Sequence[int]
    train_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        o = list(self.out_planes)
        gating = bool(self.cfg.VIDEO.BACKBONE.get("BRANCH", {}).get("GATING", False)) if self.cfg.VIDEO.BACKBONE.get("BRANCH") else False
        branch_name = self.cfg.VIDEO.BACKBONE.BRANCH.NAME
        b0 = InceptionBaseConv3D(o[0], 1, 1, self.train_bn, self.dtype, name="branch0")(x)
        b1 = InceptionBaseConv3D(o[1], 1, 1, self.train_bn, self.dtype, name="branch1_0")(x)
        b1 = BRANCH_REGISTRY.get(branch_name)(
            cfg=self.cfg, in_planes=o[1], out_planes=o[2], kernel_size=3, stride=1, padding=1,
            train_bn=self.train_bn, dtype=self.dtype, name="branch1_1",
        )(b1)
        b2 = InceptionBaseConv3D(o[3], 1, 1, self.train_bn, self.dtype, name="branch2_0")(x)
        b2 = BRANCH_REGISTRY.get(branch_name)(
            cfg=self.cfg, in_planes=o[3], out_planes=o[4], kernel_size=3, stride=1, padding=1,
            train_bn=self.train_bn, dtype=self.dtype, name="branch2_1",
        )(b2)
        b3 = nn.max_pool(x, (3, 3, 3), strides=(1, 1, 1), padding=[(1, 1)] * 3)
        b3 = InceptionBaseConv3D(o[5], 1, 1, self.train_bn, self.dtype, name="branch3")(b3)
        if gating:
            b0 = SelfGating(o[0], self.dtype, name="gating_b0")(b0)
            b1 = SelfGating(o[2], self.dtype, name="gating_b1")(b1)
            b2 = SelfGating(o[4], self.dtype, name="gating_b2")(b2)
            b3 = SelfGating(o[5], self.dtype, name="gating_b3")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


@BACKBONE_REGISTRY.register(name="Inception3D")
class Inception3D(nn.Module):
    """S3D/S3DG backbone (reference backbone.py:91-180)."""

    cfg: Any
    train_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        mp = lambda k, s, p: lambda y: nn.max_pool(y, k, strides=s, padding=p)
        x = BRANCH_REGISTRY.get(cfg.VIDEO.BACKBONE.STEM.NAME)(
            cfg=cfg, in_planes=int(cfg.DATA.NUM_INPUT_CHANNELS), out_planes=64, kernel_size=7, stride=2, padding=3,
            train_bn=self.train_bn, dtype=self.dtype, name="Conv_1a",
        )(x)
        x = mp((1, 3, 3), (1, 2, 2), [(0, 0), (1, 1), (1, 1)])(x)
        x = InceptionBaseConv3D(64, 1, 1, self.train_bn, self.dtype, name="Conv_2b")(x)
        x = BRANCH_REGISTRY.get(cfg.VIDEO.BACKBONE.BRANCH.NAME)(
            cfg=cfg, in_planes=64, out_planes=192, kernel_size=3, stride=1, padding=1,
            train_bn=self.train_bn, dtype=self.dtype, name="Conv_2c",
        )(x)
        x = mp((1, 3, 3), (1, 2, 2), [(0, 0), (1, 1), (1, 1)])(x)
        x = InceptionBlock3D(cfg, [64, 96, 128, 16, 32, 32], self.train_bn, self.dtype, name="Mixed_3b")(x)
        x = InceptionBlock3D(cfg, [128, 128, 192, 32, 96, 64], self.train_bn, self.dtype, name="Mixed_3c")(x)
        x = mp((3, 3, 3), (2, 2, 2), [(1, 1)] * 3)(x)
        x = InceptionBlock3D(cfg, [192, 96, 208, 16, 48, 64], self.train_bn, self.dtype, name="Mixed_4b")(x)
        x = InceptionBlock3D(cfg, [160, 112, 224, 24, 64, 64], self.train_bn, self.dtype, name="Mixed_4c")(x)
        x = InceptionBlock3D(cfg, [128, 128, 256, 24, 64, 64], self.train_bn, self.dtype, name="Mixed_4d")(x)
        x = InceptionBlock3D(cfg, [112, 144, 288, 32, 64, 64], self.train_bn, self.dtype, name="Mixed_4e")(x)
        x = InceptionBlock3D(cfg, [256, 160, 320, 32, 128, 128], self.train_bn, self.dtype, name="Mixed_4f")(x)
        x = mp((2, 2, 2), (2, 2, 2), [(0, 0)] * 3)(x)
        x = InceptionBlock3D(cfg, [256, 160, 320, 32, 128, 128], self.train_bn, self.dtype, name="Mixed_5b")(x)
        x = InceptionBlock3D(cfg, [384, 192, 384, 48, 128, 128], self.train_bn, self.dtype, name="Mixed_5c")(x)
        return x


@BACKBONE_REGISTRY.register(name="SimpleLocalizationConv")
class SimpleLocalizationConv(nn.Module):
    """Three grouped temporal convs over feature sequences
    (reference backbone.py:182-218).  Input [B, T, C]."""

    cfg: Any
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        hidden = int(self.cfg.VIDEO.DIM1D)
        layers = int(self.cfg.VIDEO.BACKBONE_LAYER)
        groups = int(self.cfg.VIDEO.BACKBONE_GROUPS_NUM)
        for i in range(layers):
            x = nn.Conv(
                hidden, (3,), padding=[(1, 1)], feature_group_count=groups,
                dtype=self.dtype, param_dtype=jnp.float32, name=f"conv_{i}",
            )(x)
            x = nn.relu(x)
        return x


@BACKBONE_REGISTRY.register(name="Identity")
class Identity(nn.Module):
    cfg: Any = None
    train_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return x


class FuseFastToSlow(nn.Module):
    """Lateral fast->slow fusion (reference slowfast.py:119-152)."""

    dim_in: int
    fusion_conv_channel_ratio: int
    fusion_kernel: int
    alpha: int
    train_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_s, x_f):
        fuse = conv3d(
            self.dim_in * self.fusion_conv_channel_ratio, (self.fusion_kernel, 1, 1),
            (self.alpha, 1, 1), dtype=self.dtype, name="conv_f2s",
        )(x_f)
        fuse = nn.relu(bn(self.train_bn, "bn")(fuse))
        return jnp.concatenate([x_s, fuse], axis=-1), x_f


@BACKBONE_REGISTRY.register(name="Slowfast")
class Slowfast(nn.Module):
    """Two-pathway SlowFast (reference slowfast.py): input is a pair
    [slow NDHWC, fast NDHWC]; returns a pair of feature maps."""

    cfg: Any
    train_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        sf = cfg.VIDEO.BACKBONE.SLOWFAST
        alpha = int(sf.ALPHA)
        beta = int(sf.BETA)
        ratio = int(sf.get("CONV_CHANNEL_RATIO", 2))
        kernel = int(sf.get("KERNEL_SIZE", 5))
        if isinstance(x, (list, tuple)):
            x_slow, x_fast = x[0], x[1]
        else:
            # the reference builds [slow, fast] inputs in the dataset
            # (base_dataset.py:413-417: linspace stride-alpha subsample ==
            # x[:, ::alpha] for divisible T); here the split is a static
            # in-graph slice so the host pipeline ships ONE tensor
            x_slow, x_fast = x[:, ::alpha], x

        # per-pathway configs (reference _construct_slowfast_cfg,
        # slowfast.py:37-50): KERNEL_SIZE and TEMPORAL_CONV_BOTTLENECK in
        # SlowFast presets carry a leading [slow, fast] pathway axis; slow
        # gets index 0 + fused input channels, fast gets index 1 + NUM_FILTERS/beta
        def pathway_cfg(idx):
            p = cfg.deep_copy()
            bb = p.VIDEO.BACKBONE
            ks = bb.get("KERNEL_SIZE", None)
            if ks is not None and len(ks) == 2 and ks[0] and isinstance(ks[0][0], (list, tuple)):
                bb.KERNEL_SIZE = ks[idx]
            tcb = bb.get("TEMPORAL_CONV_BOTTLENECK", None)
            if tcb is not None and len(tcb) == 2 and isinstance(tcb[0], (list, tuple)):
                bb.TEMPORAL_CONV_BOTTLENECK = tcb[idx]
            if idx == 1:
                bb.ADD_FUSION_CHANNEL = False
                bb.NUM_FILTERS = [max(f // beta, 1) for f in bb.NUM_FILTERS]
            else:
                bb.ADD_FUSION_CHANNEL = True
            return p

        slow_cfg = pathway_cfg(0)
        fast_cfg = pathway_cfg(1)

        s = STEM_REGISTRY.get(cfg.VIDEO.BACKBONE.STEM.NAME)(cfg=slow_cfg, train_bn=self.train_bn, dtype=self.dtype, name="slow_stem")(x_slow)
        f = STEM_REGISTRY.get(cfg.VIDEO.BACKBONE.STEM.NAME)(cfg=fast_cfg, train_bn=self.train_bn, dtype=self.dtype, name="fast_stem")(x_fast)
        blocks = _N_CONV_RESNET[int(cfg.VIDEO.BACKBONE.DEPTH)]
        for stage, n in enumerate(blocks, start=1):
            s, f = FuseFastToSlow(
                int(fast_cfg.VIDEO.BACKBONE.NUM_FILTERS[stage - 1]), ratio, kernel, alpha,
                self.train_bn, self.dtype, name=f"fuse_{stage}",
            )(s, f)
            # slow pathway consumes the fused channels
            s = Base3DResStage(slow_cfg, n, stage, train_bn=self.train_bn, dtype=self.dtype, name=f"slow_conv{stage + 1}")(s)
            f = Base3DResStage(fast_cfg, n, stage, train_bn=self.train_bn, dtype=self.dtype, name=f"fast_conv{stage + 1}")(f)
        return [s, f]
