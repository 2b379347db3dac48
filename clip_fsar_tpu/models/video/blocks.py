"""Video-backbone building blocks (capability of reference
models/base/base_blocks.py + models/utils/params.py).

Layout: videos are NDHWC — [B, T, H, W, C] (XLA-native 3D conv layout on
TPU; the reference uses NCTHW).  BatchNorm over the trailing channel axis
is exactly BatchNorm3d semantics.

Block hyperparameters (dims, strides, kernel, transformation) are resolved
from the config per [stage, block] index exactly like the reference
``update_3d_conv_params`` (models/utils/params.py:6-63).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from clip_fsar_tpu.models.clip.model import BatchNorm
from clip_fsar_tpu.utils.registry import BRANCH_REGISTRY, HEAD_REGISTRY, STEM_REGISTRY


@dataclasses.dataclass(frozen=True)
class BlockParams:
    """Resolved per-block conv hyperparameters."""

    stage_id: int
    block_id: int
    dim_in: int
    num_filters: int
    kernel_size: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    downsampling: bool
    transformation: str  # simple_block | bottleneck
    expansion_ratio: Optional[int]
    bn_eps: float
    bn_mmt: float
    branch_cfg: Any  # cfg.VIDEO.BACKBONE.BRANCH
    num_frames: int


def resolve_block_params(cfg, stage_id: int, block_id: int) -> BlockParams:
    bb = cfg.VIDEO.BACKBONE
    if block_id == 0:
        dim_in = int(bb.NUM_FILTERS[stage_id - 1])
        downsampling = bool(bb.DOWNSAMPLING[stage_id])
        down_t = bool(bb.DOWNSAMPLING_TEMPORAL[stage_id])
    else:
        dim_in = int(bb.NUM_FILTERS[stage_id])
        downsampling = False
        down_t = False
    if downsampling:
        stride = (2, 2, 2) if down_t else (1, 2, 2)
    else:
        stride = (1, 1, 1)
    depth = bb.DEPTH
    if isinstance(depth, str):
        transformation = "bottleneck"
    else:
        transformation = "simple_block" if int(depth) <= 34 else "bottleneck"
    return BlockParams(
        stage_id=stage_id,
        block_id=block_id,
        dim_in=dim_in,
        num_filters=int(bb.NUM_FILTERS[stage_id]),
        kernel_size=tuple(bb.KERNEL_SIZE[stage_id]),
        stride=stride,
        downsampling=downsampling,
        transformation=transformation,
        expansion_ratio=int(bb.get("EXPANSION_RATIO", 2) or 2),
        bn_eps=float(cfg.BN.get("EPS", 1e-5)),
        bn_mmt=float(cfg.BN.get("MOMENTUM", 0.1)),
        branch_cfg=bb.get("BRANCH", None),
        num_frames=int(cfg.DATA.NUM_INPUT_FRAMES),
    )


def conv3d(features: int, kernel: Sequence[int], stride: Sequence[int] = (1, 1, 1), bias: bool = False,
           groups: int = 1, dtype=jnp.float32, name: Optional[str] = None) -> nn.Conv:
    from clip_fsar_tpu.models.init import msra_fill

    pad = [(k // 2, k // 2) for k in kernel]
    return nn.Conv(
        features, tuple(kernel), strides=tuple(stride), padding=pad, use_bias=bias,
        feature_group_count=groups, dtype=dtype, param_dtype=jnp.float32, name=name,
        kernel_init=msra_fill,  # c2_msra_fill parity (init_helper.py:112-144)
    )


def bn(train: bool, name: str) -> BatchNorm:
    return BatchNorm(use_running_average=not train, name=name)


class Base3DBlock(nn.Module):
    """Residual block: shortcut (optionally 1x1x1 conv+bn) + registered
    branch, relu (reference base_blocks.py:104-156)."""

    cfg: Any
    p: BlockParams
    train_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.p
        short_cut = x
        if p.dim_in != p.num_filters or p.downsampling:
            short_cut = conv3d(p.num_filters, (1, 1, 1), p.stride, dtype=self.dtype, name="short_cut")(x)
            short_cut = bn(self.train_bn, "short_cut_bn")(short_cut)
        branch = BRANCH_REGISTRY.get(self.cfg.VIDEO.BACKBONE.BRANCH.NAME)(
            cfg=self.cfg, p=p, train_bn=self.train_bn, dtype=self.dtype, name="conv_branch"
        )
        return nn.relu(short_cut + branch(x))


class Base3DResStage(nn.Module):
    """Stage of blocks + optional trailing NonLocal
    (reference base_blocks.py:158-215)."""

    cfg: Any
    num_blocks: int
    stage_idx: int
    train_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_blocks):
            p = resolve_block_params(self.cfg, self.stage_idx, i)
            x = Base3DBlock(self.cfg, p, train_bn=self.train_bn, dtype=self.dtype, name=f"res_{i + 1}")(x)
        nl = self.cfg.VIDEO.BACKBONE.get("NONLOCAL", None)
        if nl and nl.get("ENABLE", False) and (self.stage_idx + 1) in list(nl.get("STAGES", [])):
            p = resolve_block_params(self.cfg, self.stage_idx, self.num_blocks - 1)
            x = BRANCH_REGISTRY.get("NonLocal")(cfg=self.cfg, p=p, train_bn=self.train_bn, dtype=self.dtype, name="nonlocal")(x)
        return x


# ---------------------------------------------------------------------------
# stems
# ---------------------------------------------------------------------------


@STEM_REGISTRY.register(name="Base2DStem")
class Base2DStem(nn.Module):
    """Per-frame 2D conv stem (reference base_blocks.py:242-300)."""

    cfg: Any
    train_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        bb = self.cfg.VIDEO.BACKBONE
        k = bb.KERNEL_SIZE[0]
        f = int(bb.NUM_FILTERS[0])
        stride = (1, 2, 2) if bb.DOWNSAMPLING[0] else (1, 1, 1)
        x = conv3d(f, (1, k[1], k[2]), stride, dtype=self.dtype, name="a")(x)
        x = bn(self.train_bn, "a_bn")(x)
        return nn.relu(x)


@STEM_REGISTRY.register(name="Base3DStem")
class Base3DStem(nn.Module):
    """Full 3D conv stem (reference base_blocks.py:302-366)."""

    cfg: Any
    train_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        bb = self.cfg.VIDEO.BACKBONE
        k = bb.KERNEL_SIZE[0]
        f = int(bb.NUM_FILTERS[0])
        down_t = bool(bb.DOWNSAMPLING_TEMPORAL[0])
        if bb.DOWNSAMPLING[0]:
            stride = (2, 2, 2) if down_t else (1, 2, 2)
        else:
            stride = (1, 1, 1)
        x = conv3d(f, tuple(k), stride, dtype=self.dtype, name="a")(x)
        x = bn(self.train_bn, "a_bn")(x)
        return nn.relu(x)


@STEM_REGISTRY.register(name="R2Plus1DStem")
class R2Plus1DStem(nn.Module):
    """(2+1)D factorized stem (reference module_zoo/stems/r2plus1d_stem.py):
    spatial 1xkxk then temporal kx1x1, mid-dim matching 3D param count."""

    cfg: Any
    train_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        bb = self.cfg.VIDEO.BACKBONE
        k = bb.KERNEL_SIZE[0]
        f = int(bb.NUM_FILTERS[0])
        dim_in = int(bb.get("NUM_INPUT_CHANNELS", 3))
        down_t = bool(bb.DOWNSAMPLING_TEMPORAL[0])
        if bb.DOWNSAMPLING[0]:
            stride = (2, 2, 2) if down_t else (1, 2, 2)
        else:
            stride = (1, 1, 1)
        mid = int((k[0] * k[1] * k[2] * dim_in * f) / (k[1] * k[2] * dim_in + k[0] * f))
        x = conv3d(mid, (1, k[1], k[2]), (1, stride[1], stride[2]), dtype=self.dtype, name="a1")(x)
        x = nn.relu(bn(self.train_bn, "a1_bn")(x))
        x = conv3d(f, (k[0], 1, 1), (stride[0], 1, 1), dtype=self.dtype, name="a2")(x)
        return nn.relu(bn(self.train_bn, "a2_bn")(x))


@STEM_REGISTRY.register(name="DownSampleStem")
class DownSampleStem(nn.Module):
    """Base3DStem + max-pool (reference module_zoo/stems/downsample_stem.py)."""

    cfg: Any
    train_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Base3DStem(self.cfg, self.train_bn, self.dtype, name="stem")(x)
        return nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding=[(0, 0), (1, 1), (1, 1)])


# ---------------------------------------------------------------------------
# heads
# ---------------------------------------------------------------------------


@HEAD_REGISTRY.register(name="BaseHead")
class BaseHead(nn.Module):
    """GAP -> dropout -> FC (+activation at eval)
    (reference base_blocks.py:368-438)."""

    cfg: Any
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = self.cfg.VIDEO.HEAD
        num_classes = int(h.NUM_CLASSES)
        x = x.mean(axis=(1, 2, 3))  # [B, C]
        x = nn.Dropout(float(h.get("DROPOUT_RATE", 0) or 0), deterministic=not train)(x)
        from clip_fsar_tpu.models.init import fc_init

        logits = nn.Dense(num_classes, dtype=jnp.float32, param_dtype=jnp.float32, kernel_init=fc_init(), name="out")(x.astype(jnp.float32))
        if not train:
            act = h.get("ACTIVATION", "softmax")
            if act == "softmax":
                return nn.softmax(logits, axis=-1), x
            if act == "sigmoid":
                return nn.sigmoid(logits), x
        return logits, x


@HEAD_REGISTRY.register(name="BaseHeadx2")
class BaseHeadx2(nn.Module):
    """Two FC heads over shared features (EPIC verb+noun,
    reference base_blocks.py:440-527)."""

    cfg: Any
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = self.cfg.VIDEO.HEAD
        n1, n2 = (int(n) for n in h.NUM_CLASSES)
        x = x.mean(axis=(1, 2, 3))
        x = nn.Dropout(float(h.get("DROPOUT_RATE", 0) or 0), deterministic=not train)(x)
        x32 = x.astype(jnp.float32)
        from clip_fsar_tpu.models.init import fc_init

        a = nn.Dense(n1, dtype=jnp.float32, param_dtype=jnp.float32, kernel_init=fc_init(), name="out1")(x32)
        b = nn.Dense(n2, dtype=jnp.float32, param_dtype=jnp.float32, kernel_init=fc_init(), name="out2")(x32)
        if not train and h.get("ACTIVATION", "softmax") == "softmax":
            a, b = nn.softmax(a, -1), nn.softmax(b, -1)
        return (a, b), x
