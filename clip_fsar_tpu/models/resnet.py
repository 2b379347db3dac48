"""Torchvision-style 2D ResNet (flax) + state-dict converter.

The non-CLIP few-shot heads use ImageNet ResNet-18/34/50 frame features
(reference CNN_FSHead, models/base/few_shot.py:1140-1176: torchvision
model truncated before the final FC, output global-average-pooled to
[B, D]).  NHWC layout, bf16-capable, fp32 BatchNorm; running stats are
frozen constants during episodic fine-tuning (see heads/fsheads.py).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from clip_fsar_tpu.models.clip.model import BatchNorm


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    EXPANSION = 1

    @nn.compact
    def __call__(self, x):
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2, use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        bn = lambda name: BatchNorm(use_running_average=not self.train, name=name)
        out = nn.relu(bn("bn1")(conv(self.planes, 3, self.stride, "conv1")(x)))
        out = bn("bn2")(conv(self.planes, 3, 1, "conv2")(out))
        identity = x
        if self.downsample:
            identity = bn("downsample_bn")(conv(self.planes, 1, self.stride, "downsample_conv")(x))
        return nn.relu(out + identity)


class TorchBottleneck(nn.Module):
    """torchvision v1.5 bottleneck: stride on the 3x3 conv."""

    planes: int
    stride: int = 1
    downsample: bool = False
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    EXPANSION = 4

    @nn.compact
    def __call__(self, x):
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2, use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        bn = lambda name: BatchNorm(use_running_average=not self.train, name=name)
        out = nn.relu(bn("bn1")(conv(self.planes, 1, 1, "conv1")(x)))
        out = nn.relu(bn("bn2")(conv(self.planes, 3, self.stride, "conv2")(out)))
        out = bn("bn3")(conv(self.planes * 4, 1, 1, "conv3")(out))
        identity = x
        if self.downsample:
            identity = bn("downsample_bn")(conv(self.planes * 4, 1, self.stride, "downsample_conv")(x))
        return nn.relu(out + identity)


_RESNET_SPECS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2), 512),
    "resnet34": (BasicBlock, (3, 4, 6, 3), 512),
    "resnet50": (TorchBottleneck, (3, 4, 6, 3), 2048),
}


class TorchResNet(nn.Module):
    """ResNet trunk ending in global average pooling -> [B, D]."""

    depth: str = "resnet50"
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def feature_dim(self) -> int:
        return _RESNET_SPECS[self.depth][2]

    @nn.compact
    def __call__(self, x, pool: bool = True):
        block_cls, layers, _ = _RESNET_SPECS[self.depth]
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(x)
        x = BatchNorm(use_running_average=not self.train, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        inplanes = 64
        for stage, (blocks, planes, stride) in enumerate(zip(layers, (64, 128, 256, 512), (1, 2, 2, 2)), start=1):
            for i in range(blocks):
                s = stride if i == 0 else 1
                need_ds = i == 0 and (s != 1 or inplanes != planes * block_cls.EXPANSION)
                x = block_cls(planes, stride=s, downsample=need_ds, train=self.train, dtype=self.dtype,
                              name=f"layer{stage}_{i}")(x)
                inplanes = planes * block_cls.EXPANSION
        if pool:
            return x.mean(axis=(1, 2))  # GAP -> [B, D]
        return x


def convert_torchvision_resnet(sd: Dict[str, Any], depth: str = "resnet50") -> Dict[str, Any]:
    """torchvision state dict -> flax variables for TorchResNet."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def npx(t):
        return t.detach().cpu().numpy().astype(np.float32) if hasattr(t, "detach") else np.asarray(t, np.float32)

    def conv(dst, src):
        node = params
        for p in dst.split("/")[:-1]:
            node = node.setdefault(p, {})
        node[dst.split("/")[-1]] = {"kernel": npx(sd[src]).transpose(2, 3, 1, 0)}

    def bn(dst, src):
        pnode, snode = params, stats
        for p in dst.split("/"):
            pnode = pnode.setdefault(p, {})
            snode = snode.setdefault(p, {})
        pnode["BatchNorm_0"] = {"scale": npx(sd[f"{src}.weight"]), "bias": npx(sd[f"{src}.bias"])}
        snode["BatchNorm_0"] = {"mean": npx(sd[f"{src}.running_mean"]), "var": npx(sd[f"{src}.running_var"])}

    conv("conv1", "conv1.weight")
    bn("bn1", "bn1")
    _, layers, _ = _RESNET_SPECS[depth]
    for stage, blocks in enumerate(layers, start=1):
        for i in range(blocks):
            src = f"layer{stage}.{i}"
            dst = f"layer{stage}_{i}"
            n_convs = 3 if depth == "resnet50" else 2
            for j in range(1, n_convs + 1):
                conv(f"{dst}/conv{j}", f"{src}.conv{j}.weight")
                bn(f"{dst}/bn{j}", f"{src}.bn{j}")
            if f"{src}.downsample.0.weight" in sd:
                conv(f"{dst}/downsample_conv", f"{src}.downsample.0.weight")
                bn(f"{dst}/downsample_bn", f"{src}.downsample.1")
    return {"params": params, "batch_stats": stats}
