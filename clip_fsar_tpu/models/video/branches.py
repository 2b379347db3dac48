"""Registered conv branches (capability of models/module_zoo/branches/*).

Every branch takes NDHWC video features and the resolved BlockParams.
TPU notes:
  * TAdaConv2d's per-(batch,frame) weight calibration W_t = alpha_t * W is
    algebraically moved onto the activations (conv(x * alpha, W) ==
    conv(x, alpha * W) for per-input-channel alpha), turning the
    reference's B*T-grouped conv2d trick (tada_branch.py:120-145) into one
    large dense conv the MXU likes;
  * channel-separated (CSN) convs map to feature_group_count;
  * NonLocal's attention runs through plain einsum+softmax (fp32).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from clip_fsar_tpu.models.video.blocks import BlockParams, bn, conv3d
from clip_fsar_tpu.utils.registry import BRANCH_REGISTRY


class _Branch(nn.Module):
    cfg: Any
    p: BlockParams
    train_bn: bool = False
    dtype: jnp.dtype = jnp.float32


@BRANCH_REGISTRY.register(name="R2D3DBranch")
class R2D3DBranch(_Branch):
    """2D/3D residual branch (reference r2d3d_branch.py): two (simple) or
    three (bottleneck) convs with the stage kernel size."""

    @nn.compact
    def __call__(self, x):
        p = self.p
        if p.transformation == "simple_block":
            x = conv3d(p.num_filters, p.kernel_size, p.stride, dtype=self.dtype, name="a")(x)
            x = nn.relu(bn(self.train_bn, "a_bn")(x))
            x = conv3d(p.num_filters, p.kernel_size, (1, 1, 1), dtype=self.dtype, name="b")(x)
            return bn(self.train_bn, "b_bn")(x)
        mid = p.num_filters // p.expansion_ratio
        x = conv3d(mid, (1, 1, 1), (1, 1, 1), dtype=self.dtype, name="a")(x)
        x = nn.relu(bn(self.train_bn, "a_bn")(x))
        x = conv3d(mid, p.kernel_size, p.stride, dtype=self.dtype, name="b")(x)
        x = nn.relu(bn(self.train_bn, "b_bn")(x))
        x = conv3d(p.num_filters, (1, 1, 1), (1, 1, 1), dtype=self.dtype, name="c")(x)
        return bn(self.train_bn, "c_bn")(x)


def _r2plus1d_mid(kt, kh, kw, cin, cout) -> int:
    return int((kt * kh * kw * cin * cout) / (kh * kw * cin + kt * cout))


@BRANCH_REGISTRY.register(name="R2Plus1DBranch")
class R2Plus1DBranch(_Branch):
    """(2+1)D factorized convs (reference r2plus1d_branch.py): spatial
    1xkxk then temporal kx1x1, mid-dim chosen to match 3D param count."""

    @nn.compact
    def __call__(self, x):
        p = self.p
        kt, kh, kw = p.kernel_size

        def factorized(y, mid, cout, stride, tag):
            """spatial (1,kh,kw) to ``mid`` channels + bn/relu, then
            temporal (kt,1,1) to ``cout``."""
            y = conv3d(mid, (1, kh, kw), (1, stride[1], stride[2]), dtype=self.dtype, name=f"{tag}1")(y)
            y = nn.relu(bn(self.train_bn, f"{tag}1_bn")(y))
            return conv3d(cout, (kt, 1, 1), (stride[0], 1, 1), dtype=self.dtype, name=f"{tag}2")(y)

        if p.transformation == "simple_block":
            # simple block picks mid by the (2+1)D param-matching formula
            # (reference r2plus1d_branch.py:29-60)
            y = factorized(x, _r2plus1d_mid(kt, kh, kw, p.dim_in, p.num_filters), p.num_filters, p.stride, "a")
            y = nn.relu(bn(self.train_bn, "a2_bn")(y))
            y = factorized(y, _r2plus1d_mid(kt, kh, kw, p.num_filters, p.num_filters), p.num_filters, (1, 1, 1), "b")
            return bn(self.train_bn, "b2_bn")(y)
        # bottleneck keeps constant channels num_filters//expansion on both
        # factorized convs — NO mid formula (reference :82-123)
        mid_f = p.num_filters // p.expansion_ratio
        y = conv3d(mid_f, (1, 1, 1), (1, 1, 1), dtype=self.dtype, name="a")(x)
        y = nn.relu(bn(self.train_bn, "a_bn")(y))
        y = factorized(y, mid_f, mid_f, p.stride, "b")
        y = nn.relu(bn(self.train_bn, "b2_bn")(y))
        y = conv3d(p.num_filters, (1, 1, 1), (1, 1, 1), dtype=self.dtype, name="c")(y)
        return bn(self.train_bn, "c_bn")(y)


class RouteFuncMLP(nn.Module):
    """Calibration-weight routing (reference tada_branch.py:15-63):
    per-frame + global pooled features -> two temporal 1D convs -> +1.
    Output [B, T, C] (the temporal-conv path keeps [B,T,1,1,C])."""

    c_in: int
    ratio: int
    kernels: tuple
    train_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, T, H, W, C]
        g = x.mean(axis=(1, 2, 3), keepdims=True)  # [B,1,1,1,C] global
        f = x.mean(axis=(2, 3), keepdims=True)  # [B,T,1,1,C] per-frame
        g = conv3d(self.c_in, (1, 1, 1), bias=True, dtype=self.dtype, name="g")(g)
        y = conv3d(self.c_in // self.ratio, (self.kernels[0], 1, 1), bias=True, dtype=self.dtype, name="a")(f + g)
        y = nn.relu(bn(self.train_bn, "bn")(y))
        # zero-init final conv so the initial calibration is exactly 1
        y = nn.Conv(
            self.c_in, (self.kernels[1], 1, 1), padding=[(self.kernels[1] // 2,) * 2, (0, 0), (0, 0)],
            use_bias=False, kernel_init=nn.initializers.zeros, dtype=self.dtype, param_dtype=jnp.float32, name="b",
        )(y)
        return y[:, :, 0, 0, :] + 1.0  # [B, T, C]


class TAdaConv2d(nn.Module):
    """Temporally-adaptive 2D conv (reference tada_branch.py:66-145).

    alpha calibrates the *input channels* of the base weight; we fold it
    into the activations so a single [B*T]-batched conv runs on the MXU.
    """

    out_channels: int
    kernel: tuple  # (kh, kw)
    stride: tuple = (1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, alpha):
        # x: [B, T, H, W, C]; alpha: [B, T, C]
        x = x * alpha[:, :, None, None, :].astype(x.dtype)
        kh, kw = self.kernel
        return nn.Conv(
            self.out_channels, (1, kh, kw), strides=(1,) + tuple(self.stride),
            padding=[(0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)], use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name="conv",
        )(x)


@BRANCH_REGISTRY.register(name="TAdaConvBlockAvgPool")
class TAdaConvBlockAvgPool(_Branch):
    """TAda bottleneck with avg-pool aggregation (tada_branch.py:147-230)."""

    @nn.compact
    def __call__(self, x):
        p = self.p
        mid = p.num_filters // p.expansion_ratio
        br = p.branch_cfg
        route_r = int(br.get("ROUTE_FUNC_R", 4))
        route_k = tuple(br.get("ROUTE_FUNC_K", [3, 3]))
        pool_k = tuple(br.get("POOL_K", [3, 1, 1]))

        y = conv3d(mid, (1, 1, 1), dtype=self.dtype, name="a")(x)
        y = nn.relu(bn(self.train_bn, "a_bn")(y))

        alpha = RouteFuncMLP(mid, route_r, route_k, self.train_bn, self.dtype, name="b_rf")(y)
        y = TAdaConv2d(mid, (p.kernel_size[1], p.kernel_size[2]), (p.stride[1], p.stride[2]), self.dtype, name="b")(y, alpha)

        pooled = nn.avg_pool(y, pool_k, strides=(1, 1, 1), padding=[(k // 2, k // 2) for k in pool_k])
        # zero-init BN scale on the pooled path (reference b_avgpool_bn)
        pooled32 = pooled.astype(jnp.float32)
        pooled_bn = nn.BatchNorm(
            use_running_average=not self.train_bn, momentum=0.9, epsilon=1e-5, dtype=jnp.float32,
            param_dtype=jnp.float32, scale_init=nn.initializers.zeros, name="b_avgpool_bn",
        )(pooled32).astype(y.dtype)
        y = nn.relu(bn(self.train_bn, "b_bn")(y) + pooled_bn)

        y = conv3d(p.num_filters, (1, 1, 1), dtype=self.dtype, name="c")(y)
        return bn(self.train_bn, "c_bn")(y)


@BRANCH_REGISTRY.register(name="CSNBranch")
class CSNBranch(_Branch):
    """ir-CSN bottleneck: depthwise kxkxk between 1x1x1 convs
    (reference csn_branch.py)."""

    @nn.compact
    def __call__(self, x):
        p = self.p
        mid = p.num_filters // p.expansion_ratio
        x = conv3d(mid, (1, 1, 1), dtype=self.dtype, name="a")(x)
        x = nn.relu(bn(self.train_bn, "a_bn")(x))
        x = conv3d(mid, p.kernel_size, p.stride, groups=mid, dtype=self.dtype, name="b")(x)
        x = nn.relu(bn(self.train_bn, "b_bn")(x))
        x = conv3d(p.num_filters, (1, 1, 1), dtype=self.dtype, name="c")(x)
        return bn(self.train_bn, "c_bn")(x)


@BRANCH_REGISTRY.register(name="SlowfastBranch")
class SlowfastBranch(_Branch):
    """SlowFast branch (reference slowfast_branch.py:20-80).

    Bottleneck: a is (3,1,1) when TEMPORAL_CONV_BOTTLENECK[stage] else
    1x1x1 (stride 1); b carries the full stage kernel and the stride;
    c is 1x1x1.  Simple block: two full-kernel convs."""

    @nn.compact
    def __call__(self, x):
        p = self.p
        if p.transformation == "simple_block":
            x = conv3d(p.num_filters, p.kernel_size, p.stride, dtype=self.dtype, name="a")(x)
            x = nn.relu(bn(self.train_bn, "a_bn")(x))
            x = conv3d(p.num_filters, p.kernel_size, (1, 1, 1), dtype=self.dtype, name="b")(x)
            return bn(self.train_bn, "b_bn")(x)
        mid = p.num_filters // p.expansion_ratio
        bb = self.cfg.VIDEO.BACKBONE
        tconv = list(bb.get("TEMPORAL_CONV_BOTTLENECK", []) or [])
        temporal_a = bool(tconv[p.stage_id]) if p.stage_id < len(tconv) else False
        a_kernel = (3, 1, 1) if temporal_a else (1, 1, 1)
        x = conv3d(mid, a_kernel, (1, 1, 1), dtype=self.dtype, name="a")(x)
        x = nn.relu(bn(self.train_bn, "a_bn")(x))
        x = conv3d(mid, p.kernel_size, p.stride, dtype=self.dtype, name="b")(x)
        x = nn.relu(bn(self.train_bn, "b_bn")(x))
        x = conv3d(p.num_filters, (1, 1, 1), dtype=self.dtype, name="c")(x)
        return bn(self.train_bn, "c_bn")(x)


@BRANCH_REGISTRY.register(name="NonLocal")
class NonLocal(_Branch):
    """Non-local attention block (reference non_local.py:11-75)."""

    @nn.compact
    def __call__(self, x):
        p = self.p
        b, t, h, w, c = x.shape
        mid = p.dim_in // 2
        q = conv3d(mid, (1, 1, 1), bias=True, dtype=self.dtype, name="qconv")(x).reshape(b, -1, mid)
        k = conv3d(mid, (1, 1, 1), bias=True, dtype=self.dtype, name="kconv")(x).reshape(b, -1, mid)
        v = conv3d(mid, (1, 1, 1), bias=True, dtype=self.dtype, name="vconv")(x).reshape(b, -1, mid)
        attn = jnp.einsum("bqc,bkc->bqk", q, k).astype(jnp.float32) * (mid**-0.5)
        attn = nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, t, h, w, mid)
        out = conv3d(p.num_filters, (1, 1, 1), bias=True, dtype=self.dtype, name="out_conv")(out)
        out = bn(self.train_bn, "out_bn")(out)
        return x + out


class SelfGating(nn.Module):
    """S3D-G feature gating (reference s3dg_branch.py SelfGating)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc")(x.mean(axis=(1, 2, 3)))
        return nn.sigmoid(w)[:, None, None, None, :] * x


@BRANCH_REGISTRY.register(name="STConv3d")
class STConv3d(nn.Module):
    """Separable spatial+temporal conv (reference s3dg_branch.py STConv3d;
    element of S3D/S3DG — different calling convention: explicit dims)."""

    cfg: Any
    in_planes: int
    out_planes: int
    kernel_size: int
    stride: int
    padding: int = 0
    train_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel_size, self.stride
        t_stride = s[0] if isinstance(s, (tuple, list)) else s
        s_spatial = s[-1] if isinstance(s, (tuple, list)) else s
        x = conv3d(self.out_planes, (1, k, k), (1, s_spatial, s_spatial), dtype=self.dtype, name="conv1")(x)
        x = nn.relu(bn(self.train_bn, "bn1")(x))
        x = conv3d(self.out_planes, (k, 1, 1), (t_stride, 1, 1), dtype=self.dtype, name="conv2")(x)
        return nn.relu(bn(self.train_bn, "bn2")(x))
