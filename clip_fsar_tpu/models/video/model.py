"""BaseVideoModel = BACKBONE ∘ HEAD (reference models/base/models.py:26-67)
plus the transformer and slowfast heads
(module_zoo/heads/{transformer_head,slowfast_head}.py).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from clip_fsar_tpu.utils.registry import BACKBONE_REGISTRY, HEAD_REGISTRY, MODEL_REGISTRY

# side effects: register stems/branches/backbones/heads
from clip_fsar_tpu.models.video import blocks as _blocks  # noqa: F401
from clip_fsar_tpu.models.video import branches as _branches  # noqa: F401
from clip_fsar_tpu.models.video import meta as _meta  # noqa: F401
from clip_fsar_tpu.models.video import transformer as _transformer  # noqa: F401


@HEAD_REGISTRY.register(name="TransformerHead")
class TransformerHead(nn.Module):
    """Linear head over the cls feature, optional tanh pre-logits
    (reference transformer_head.py:16-75)."""

    cfg: Any
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = self.cfg.VIDEO.HEAD
        out = nn.Dropout(float(h.get("DROPOUT_RATE", 0) or 0), deterministic=not train)(x)
        if h.get("PRE_LOGITS", False):
            out = nn.tanh(nn.Dense(x.shape[-1], param_dtype=jnp.float32, name="pre_logits")(out))
        logits = nn.Dense(int(h.NUM_CLASSES), dtype=jnp.float32, param_dtype=jnp.float32, name="linear")(
            out.astype(jnp.float32)
        )
        if not train and h.get("ACTIVATION", "softmax") == "softmax":
            logits = nn.softmax(logits, axis=-1)
        return logits, x


@HEAD_REGISTRY.register(name="SlowFastHead")
class SlowFastHead(nn.Module):
    """GAP both pathways, concat, FC (reference slowfast_head.py)."""

    cfg: Any
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = self.cfg.VIDEO.HEAD
        mode = h.get("MODE", "slowfast")
        gap = lambda y: y.mean(axis=(1, 2, 3))
        if mode == "slowfast":
            feats = jnp.concatenate([gap(x[0]), gap(x[1])], axis=-1)
        elif mode == "slowonly":
            feats = gap(x[0])
        else:
            feats = gap(x[1])
        feats = nn.Dropout(float(h.get("DROPOUT_RATE", 0) or 0), deterministic=not train)(feats)
        logits = nn.Dense(int(h.NUM_CLASSES), dtype=jnp.float32, param_dtype=jnp.float32, name="out")(
            feats.astype(jnp.float32)
        )
        if not train and h.get("ACTIVATION", "softmax") == "softmax":
            logits = nn.softmax(logits, axis=-1)
        return logits, feats


class _MoSIHeadBase(nn.Module):
    """GAP + dropout + per-axis linear heads (reference
    module_zoo/heads/mosi_head.py).  num classes per axis =
    (NUM_CLASSES - 1) + 1*(not ZERO_OUT)."""

    cfg: Any
    axes: tuple = ("move_joint",)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = self.cfg.VIDEO.HEAD
        if self.axes == ("move_joint",):
            from clip_fsar_tpu.data.mosi import build_speed_set

            n = len(build_speed_set(
                int(h.NUM_CLASSES), bool(self.cfg.PRETRAIN.get("DECOUPLE", True)),
                str(self.cfg.PRETRAIN.get("DATA_MODE", "xy")), bool(self.cfg.PRETRAIN.get("ZERO_OUT", False)),
            ))
        else:
            n = int(h.NUM_CLASSES) - 1 + int(not bool(self.cfg.PRETRAIN.get("ZERO_OUT", False)))
        feats = x.mean(axis=(1, 2, 3)) if x.ndim == 5 else x
        feats = nn.Dropout(float(h.get("DROPOUT_RATE", 0) or 0), deterministic=not train)(feats)
        out = {}
        for axis in self.axes:
            out[axis] = nn.Dense(n, dtype=jnp.float32, param_dtype=jnp.float32, name=f"out_{axis}")(feats.astype(jnp.float32))
        return out, feats


@HEAD_REGISTRY.register(name="MoSIHeadJoint")
class MoSIHeadJoint(_MoSIHeadBase):
    axes: tuple = ("move_joint",)


@HEAD_REGISTRY.register(name="MoSIHeadOnlyX")
class MoSIHeadOnlyX(_MoSIHeadBase):
    axes: tuple = ("move_x",)


@HEAD_REGISTRY.register(name="MoSIHeadOnlyY")
class MoSIHeadOnlyY(_MoSIHeadBase):
    axes: tuple = ("move_y",)


@HEAD_REGISTRY.register(name="MoSIHeadXY")
class MoSIHeadXY(_MoSIHeadBase):
    axes: tuple = ("move_x", "move_y")


@MODEL_REGISTRY.register(name="MoSINet")
class MoSINet(nn.Module):
    """BaseVideoModel over flattened pseudo-motion clips
    (reference models.py:69-88): input [B, S, T, H, W, C] -> predictions
    over B*S clips."""

    cfg: Any
    train_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        b, s = x.shape[:2]
        x = x.reshape((b * s,) + x.shape[2:])
        res, logits = BaseVideoModel(cfg=self.cfg, train_bn=self.train_bn, dtype=self.dtype, name="net")(x, train=train)
        if not isinstance(res, dict):
            res = {"move_joint": res}
        return res, logits


@MODEL_REGISTRY.register(name="BaseVideoModel")
class BaseVideoModel(nn.Module):
    """backbone ∘ head over NDHWC video (reference models.py:26-45)."""

    cfg: Any
    train_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        backbone = BACKBONE_REGISTRY.get(self.cfg.VIDEO.BACKBONE.META_ARCH)(
            cfg=self.cfg, train_bn=self.train_bn, dtype=self.dtype, name="backbone"
        )
        head = HEAD_REGISTRY.get(self.cfg.VIDEO.HEAD.NAME)(cfg=self.cfg, dtype=self.dtype, name="head")
        feats = backbone(x, deterministic=not train)
        return head(feats, train=train)


def build_video_model(cfg, dtype=jnp.float32) -> nn.Module:
    name = cfg.MODEL.get("NAME", None) or "BaseVideoModel"
    if name in MODEL_REGISTRY:
        return MODEL_REGISTRY.get(name)(cfg=cfg, dtype=dtype)
    return BaseVideoModel(cfg=cfg, dtype=dtype)
