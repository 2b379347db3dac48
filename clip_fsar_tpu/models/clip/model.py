"""CLIP image/text towers in flax.linen, TPU-first.

Capability parity with the vendored OpenAI CLIP in the reference
(models/base/few_shot.py:430-886): VisionTransformer, ModifiedResNet with
anti-aliased strides + AttentionPool2d, causal text Transformer with EOT
pooling, QuickGELU, fp32-safe LayerNorm.

TPU-first design choices (not a port):
  * NHWC image layout (XLA-native conv layout on TPU);
  * compute dtype is configurable (bfloat16 by default) with parameters
    kept in float32; LayerNorm/BatchNorm/softmax always compute in fp32
    (mirrors the reference's fp16-safe LayerNorm, few_shot.py:605-611);
  * attention goes through one shared op (clip_fsar_tpu.ops.attention.mha)
    with an optional Pallas fused kernel backend;
  * optional jax.checkpoint (remat) per transformer block to trade FLOPs
    for HBM when training with large episode batches.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from clip_fsar_tpu.ops.attention import causal_mask, merge_heads, mha, split_heads


# --------------------------------------------------------------------------
# configs
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CLIPArch:
    """Architecture hyperparameters (reference build_model infers these from
    state-dict shapes, few_shot.py:849-886; conversion does the same)."""

    embed_dim: int
    image_resolution: int
    vision_layers: Union[int, Tuple[int, int, int, int]]  # int -> ViT, tuple -> ModifiedResNet
    vision_width: int
    vision_patch_size: Optional[int]
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12
    # None -> the OpenAI rule (width/64 for ViT, width*32/64 for ResNet)
    vision_heads_override: Optional[int] = None

    @property
    def is_vit(self) -> bool:
        return isinstance(self.vision_layers, int)

    @property
    def vision_heads(self) -> int:
        if self.vision_heads_override is not None:
            return self.vision_heads_override
        return self.vision_width // 64 if self.is_vit else self.vision_width * 32 // 64

    @property
    def feature_dim(self) -> int:
        """Output dim of the visual tower == CLIP joint-embedding dim."""
        return self.embed_dim


ARCHS = {
    "RN50": CLIPArch(1024, 224, (3, 4, 6, 3), 64, None),
    "RN101": CLIPArch(512, 224, (3, 4, 23, 3), 64, None),
    "RN50x4": CLIPArch(640, 288, (4, 6, 10, 6), 80, None, transformer_width=640, transformer_heads=10),
    "RN50x16": CLIPArch(768, 384, (6, 8, 18, 8), 96, None, transformer_width=768, transformer_heads=12),
    "RN50x64": CLIPArch(1024, 448, (3, 15, 36, 10), 128, None, transformer_width=1024, transformer_heads=16),
    "ViT-B/32": CLIPArch(512, 224, 12, 768, 32, transformer_width=512, transformer_heads=8),
    "ViT-B/16": CLIPArch(512, 224, 12, 768, 16, transformer_width=512, transformer_heads=8),
    "ViT-L/14": CLIPArch(768, 224, 24, 1024, 14, transformer_width=768, transformer_heads=12),
    "ViT-L/14@336px": CLIPArch(768, 336, 24, 1024, 14, transformer_width=768, transformer_heads=12),
    # tiny configs for tests / CI — not part of the reference zoo
    "ViT-Tiny-Test": CLIPArch(
        32, 64, 2, 64, 16, context_length=77, vocab_size=49408, transformer_width=64, transformer_heads=2,
        transformer_layers=2, vision_heads_override=2,
    ),
    "RN-Tiny-Test": CLIPArch(
        32, 64, (1, 1, 1, 1), 8, None, context_length=77, vocab_size=49408, transformer_width=64, transformer_heads=2, transformer_layers=2
    ),
}


# --------------------------------------------------------------------------
# building blocks
# --------------------------------------------------------------------------


class _LNParams(nn.Module):
    """Owns LayerNorm's {scale, bias} under the same child-scope name
    flax's nn.LayerNorm would have used."""

    @nn.compact
    def __call__(self, n: int):
        g = self.param("scale", nn.initializers.ones, (n,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (n,), jnp.float32)
        return g, b


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics regardless of activation dtype.

    Matches the reference's fp16-safe LayerNorm (few_shot.py:605-611) but
    written so no fp32 copy of the activation is ever materialized: the
    bf16->fp32 converts feed straight into the mean/mean-of-squares
    reductions (fp32 accumulation) and one elementwise normalize chain,
    each a single XLA fusion.  flax's nn.LayerNorm(dtype=fp32) on a cast
    input left ~27 ms/step of standalone convert_element_type copies in
    the ViT-B/16 train profile.  Same math as nn.LayerNorm's default
    use_fast_variance=True (E[x^2] - E[x]^2, clamped at 0)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig = x.dtype
        n = x.shape[-1]
        # params live under a "LayerNorm_0" child scope — the exact tree
        # path flax's nn.LayerNorm used here before, so checkpoints and
        # the OpenAI converter are untouched
        g, b = _LNParams(name="LayerNorm_0")(n)
        # NOTE: a standalone Pallas LayerNorm (ops/fused_layernorm.py) was
        # measured HERE and lost 26% of train throughput (PERFORMANCE.md
        # "LayerNorm"): XLA fuses this formulation's forward into the
        # consumer matmul's pipeline and overlaps the backward fusions;
        # an opaque custom-VJP kernel forfeits both.  Keep the XLA chain.
        mu = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
        m2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        var = jnp.maximum(m2 - jnp.square(mu), 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)
        y = (x.astype(jnp.float32) - mu) * inv * g + b
        return y.astype(orig)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * nn.sigmoid(1.702 * x)


class _ProjParams(nn.Module):
    """Parameter-only Dense: owns a {kernel, bias} pair with nn.Dense's
    exact init/param layout but leaves the matmul to the caller, so
    self-attention can run ONE fused [D, 3D] projection while the param
    tree keeps the q_proj/k_proj/v_proj names the checkpoint converter and
    parity tests rely on."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        return kernel, bias


class _PatchEmbed(nn.Module):
    """Non-overlapping patch embedding as space-to-depth + ONE matmul.

    Numerically the same contraction as the stride-p conv the reference
    uses (few_shot.py:664 conv1), but XLA lowers a kernel==stride conv
    through the convolution emitter at <5% MXU — as a [B*g*g, p*p*3] x
    [p*p*3, width] GEMM it runs at matmul speed (the conv fusion was 77 ms
    of a 548 ms ViT-B/16 train step).  The param keeps nn.Conv's exact
    name/shape/init ((p, p, in, width) "kernel" under this module's
    scope), so checkpoints and the OpenAI converter are untouched."""

    width: int
    patch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, hh, ww, c = x.shape
        p = self.patch
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (p, p, c, self.width), jnp.float32)
        g_h, g_w = hh // p, ww // p
        # contract (p, p, c) straight off the 6-D view instead of
        # materializing the [B, g*g, p*p*c] transpose: XLA folds the patch
        # gather into the GEMM's input pipeline (10.3 -> 7.7 ms for 1920
        # frames at 224 px, tools/_patchify_bench.py); the (kh, kw, in)
        # contraction order matches the conv kernel's pixel order exactly
        x6 = x.astype(self.dtype).reshape(b, g_h, p, g_w, p, c)
        out = jax.lax.dot_general(
            x6,
            kernel.astype(self.dtype),
            (((2, 4, 5), (0, 1, 2)), ((), ())),
        )  # [B, g_h, g_w, width]
        return out.reshape(b, g_h * g_w, self.width)


class MultiheadAttention(nn.Module):
    """q/k/v/out projections + shared attention core.

    Converted from torch nn.MultiheadAttention by splitting in_proj into
    q_proj/k_proj/v_proj.  For self-attention (k and v not given) the three
    projections run as one fused [D, 3D] matmul — the activation is read
    from HBM once instead of three times, and the wider N dimension tiles
    the MXU better.
    """

    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    attention_backend: str = "xla"

    @nn.compact
    def __call__(self, q, k=None, v=None, mask=None, causal: bool = False):
        self_attention = k is None and v is None
        k = q if k is None else k
        v = k if v is None else v
        wq, bq = _ProjParams(self.dim, name="q_proj")(q.shape[-1])
        wk, bk = _ProjParams(self.dim, name="k_proj")(k.shape[-1])
        wv, bv = _ProjParams(self.dim, name="v_proj")(v.shape[-1])

        def apply(x, w, b):
            return jnp.dot(x.astype(self.dtype), w.astype(self.dtype)) + b.astype(self.dtype)

        if self_attention:
            # one fused [D, 3D] projection: the activation is read from HBM
            # once instead of three times and the wide N dim tiles the MXU
            # better.  (Projecting straight into the head-split [B,H,N,Dh]
            # layout via einsum was measured SLOWER — the 64-lane output
            # tiling costs the matmul more than the relayout copies save.)
            qkv = apply(q, jnp.concatenate([wq, wk, wv], axis=1), jnp.concatenate([bq, bk, bv]))
            if self.attention_backend == "fused" and not causal and mask is None:
                # whole-sequence Pallas kernel on the unsplit layout
                # (ops/fused_attention.py): no head transposes, probability
                # matrix never leaves VMEM
                from clip_fsar_tpu.ops.fused_attention import clip_mha

                out = clip_mha(qkv, self.heads)
                return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="out_proj")(out)
            if "unsplit" in self.attention_backend:
                # keep the [B, N, 3, H, Dh] view — no head transposes; the
                # attention einsums carry the head axis directly
                # (ops/attention.mha_nhd)
                from clip_fsar_tpu.ops.attention import mha_nhd

                b, n, _ = qkv.shape
                dh = self.dim // self.heads
                qkvh = qkv.reshape(b, n, 3, self.heads, dh)
                out = mha_nhd(
                    qkvh[:, :, 0], qkvh[:, :, 1], qkvh[:, :, 2],
                    mask=mask, causal=causal, bf16_softmax="bf16" in self.attention_backend,
                ).reshape(b, n, self.dim)
                return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="out_proj")(out)
            qp, kp, vp = jnp.split(qkv, 3, axis=-1)
        else:
            qp, kp, vp = apply(q, wq, bq), apply(k, wk, bk), apply(v, wv, bv)
        qh, kh, vh = (split_heads(t, self.heads) for t in (qp, kp, vp))
        backend = self.attention_backend.replace(":unsplit", "")
        out = merge_heads(mha(qh, kh, vh, mask=mask, backend=backend, causal=causal))
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="out_proj")(out)


class ResidualAttentionBlock(nn.Module):
    d_model: int
    n_head: int
    causal: bool = False
    dtype: jnp.dtype = jnp.float32
    attention_backend: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = LayerNorm(name="ln_1")(x)
        x = x + MultiheadAttention(
            self.d_model, self.n_head, dtype=self.dtype, attention_backend=self.attention_backend, name="attn"
        )(y, causal=self.causal)
        y = LayerNorm(name="ln_2")(x)
        h = nn.Dense(self.d_model * 4, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_c_fc")(y)
        h = quick_gelu(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_c_proj")(h)
        return x + h


class Transformer(nn.Module):
    """Stack of residual attention blocks.

    ``scan_layers`` switches execution to one ``lax.scan`` over the depth
    axis: the per-layer params keep their ``resblocks_i`` names (checkpoint
    and converter contracts unchanged) and are stacked at trace time, so
    XLA compiles ONE block body instead of ``layers`` copies — much faster
    compiles for deep towers and a uniform remat schedule."""

    width: int
    layers: int
    heads: int
    causal: bool = False
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    remat_policy: str = "nothing"  # nothing | dots (save matmul outputs)
    attention_backend: str = "xla"
    scan_layers: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        policy = (
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            if self.remat_policy == "dots"
            else jax.checkpoint_policies.nothing_saveable
        )
        if not self.scan_layers or self.is_initializing():
            # loop mode (also the init path for scan mode, so the params
            # materialize under their per-layer resblocks_i names)
            block_cls = ResidualAttentionBlock
            if self.remat and not self.is_initializing():
                block_cls = nn.remat(ResidualAttentionBlock, policy=policy)
            for i in range(self.layers):
                x = block_cls(
                    self.width,
                    self.heads,
                    causal=self.causal,
                    dtype=self.dtype,
                    attention_backend=self.attention_backend,
                    name=f"resblocks_{i}",
                )(x)
            return x

        # scan mode: read the per-layer param trees (identical structure),
        # stack to a [L, ...] pytree and lax.scan one shared block body over
        # the depth axis.  Params keep their resblocks_i names; only the
        # execution strategy changes, so checkpoints/converters are
        # unaffected while XLA compiles the block once instead of L times.
        stacked = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves),
            *[self.scope.get_variable("params", f"resblocks_{i}") for i in range(self.layers)],
        )
        body_mod = ResidualAttentionBlock(
            self.width,
            self.heads,
            causal=self.causal,
            dtype=self.dtype,
            attention_backend=self.attention_backend,
        )

        def body(carry, p):
            return body_mod.apply({"params": p}, carry), None

        if self.remat:
            body = jax.checkpoint(body, policy=policy)
        x, _ = jax.lax.scan(body, x, stacked)
        return x


# --------------------------------------------------------------------------
# vision towers
# --------------------------------------------------------------------------


class VisionTransformer(nn.Module):
    """CLIP ViT (reference few_shot.py:654-688). Input NHWC."""

    input_resolution: int
    patch_size: int
    width: int
    layers: int
    heads: int
    output_dim: int
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    remat_policy: str = "nothing"
    attention_backend: str = "xla"
    scan_layers: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_tokens: bool = False):
        p = self.patch_size
        x = x.astype(self.dtype)
        x = _PatchEmbed(width=self.width, patch=p, dtype=self.dtype, name="conv1")(x)  # [B, g*g, width]
        b = x.shape[0]

        cls = self.param("class_embedding", nn.initializers.normal(self.width**-0.5), (self.width,), jnp.float32)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(self.width**-0.5),
            ((self.input_resolution // p) ** 2 + 1, self.width),
            jnp.float32,
        )
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype), (b, 1, self.width)), x], axis=1)
        x = x + pos.astype(self.dtype)
        x = LayerNorm(name="ln_pre")(x)
        x = Transformer(
            self.width,
            self.layers,
            self.heads,
            dtype=self.dtype,
            remat=self.remat,
            remat_policy=self.remat_policy,
            attention_backend=self.attention_backend,
            scan_layers=self.scan_layers,
            name="transformer",
        )(x)
        proj = self.param("proj", nn.initializers.normal(self.width**-0.5), (self.width, self.output_dim), jnp.float32)
        if return_tokens:
            tokens = LayerNorm(name="ln_post")(x) @ proj.astype(self.dtype)
            return tokens[:, 0, :], tokens[:, 1:, :]
        x = LayerNorm(name="ln_post")(x[:, 0, :])
        return x @ proj.astype(self.dtype)


class _BNState(nn.Module):
    """Owns BatchNorm's {scale, bias} params and {mean, var} batch_stats
    under the same child-scope name flax's nn.BatchNorm would have used,
    so checkpoints and the OpenAI converter are untouched."""

    @nn.compact
    def __call__(self, c: int):
        g = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        return g, b, mean, var


class BatchNorm(nn.Module):
    """BatchNorm with fp32 statistics and running stats, applied as one
    folded per-channel affine in the activation dtype.

    Same fused-stat rationale as LayerNorm above: the previous
    ``nn.BatchNorm(dtype=fp32)`` on a cast input materialized an fp32 copy
    of every activation map (shared by the stats reduction and the
    normalize) plus a cast-back — pure HBM traffic on the ~53 BNs of an
    RN50 tower.  Here the bf16->fp32 converts fuse into the fp32-accumulated
    reductions, and the apply is ``x * a + b`` with per-channel fp32
    ``a = g*rsqrt(var+eps)``, ``b = beta - mean*a`` — one elementwise
    fusion that XLA folds into the neighboring relu/conv pipeline.
    Matches flax nn.BatchNorm semantics (momentum 0.9 i.e. torch 0.1,
    eps 1e-5, biased batch var in both the normalize and the running
    update, use_fast_variance math).  Reference BN usage:
    few_shot.py:542-602 (ModifiedResNet, fp32 throughout).

    The attribute sets the default mode; the call-time argument overrides
    it (train/eval share one module instance, so BN mode must be decidable
    per call)."""

    use_running_average: bool = True
    epsilon: float = 1e-5
    momentum: float = 0.9

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: Optional[bool] = None) -> jnp.ndarray:
        ura = self.use_running_average if use_running_average is None else use_running_average
        c = x.shape[-1]
        g, b, ra_mean, ra_var = _BNState(name="BatchNorm_0")(c)
        if ura:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=axes, dtype=jnp.float32)
            m2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=axes)
            var = jnp.maximum(m2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1.0 - self.momentum) * var
        scale = g * jax.lax.rsqrt(var + self.epsilon)
        shift = b - mean * scale
        # fp32 math inside one elementwise fusion (converts fuse; no fp32
        # copy of x is materialized), output back in the activation dtype
        return (x.astype(jnp.float32) * scale + shift).astype(x.dtype)


class Bottleneck(nn.Module):
    """CLIP anti-aliased bottleneck (reference few_shot.py:182-228): all
    convs stride 1; avgpool after conv2 when stride > 1; downsample path is
    avgpool + 1x1 conv."""

    inplanes: int
    planes: int
    stride: int = 1
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    EXPANSION = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: Optional[bool] = None) -> jnp.ndarray:
        bn_train = self.train if train is None else train
        conv = lambda f, k, name: nn.Conv(
            f, (k, k), padding=[(k // 2, k // 2)] * 2, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        bn = lambda name: BatchNorm(use_running_average=not bn_train, name=name)

        out = nn.relu(bn("bn1")(conv(self.planes, 1, "conv1")(x)))
        out = nn.relu(bn("bn2")(conv(self.planes, 3, "conv2")(out)))
        if self.stride > 1:
            out = nn.avg_pool(out, (self.stride, self.stride), strides=(self.stride, self.stride))
        out = bn("bn3")(conv(self.planes * self.EXPANSION, 1, "conv3")(out))

        identity = x
        if self.stride > 1 or self.inplanes != self.planes * self.EXPANSION:
            if self.stride > 1:
                identity = nn.avg_pool(identity, (self.stride, self.stride), strides=(self.stride, self.stride))
            identity = conv(self.planes * self.EXPANSION, 1, "downsample_conv")(identity)
            identity = bn("downsample_bn")(identity)
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """QKV attention pooling (reference few_shot.py:430-539, default
    spatial=False path: the mean token attends over all positions)."""

    spacial_dim: int
    embed_dim: int
    num_heads: int
    output_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_tokens: bool = False):
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)  # [B, HW+1, C]
        pos = self.param(
            "positional_embedding", nn.initializers.normal(c**-0.5), (self.spacial_dim**2 + 1, self.embed_dim), jnp.float32
        )
        x = x + pos.astype(x.dtype)

        out_dim = self.output_dim or self.embed_dim
        dense = lambda f, name: nn.Dense(f, dtype=self.dtype, param_dtype=jnp.float32, name=name)
        q = dense(self.embed_dim, "q_proj")(x[:, :1])
        k = dense(self.embed_dim, "k_proj")(x)
        v = dense(self.embed_dim, "v_proj")(x)
        att = mha(split_heads(q, self.num_heads), split_heads(k, self.num_heads), split_heads(v, self.num_heads))
        pooled = dense(out_dim, "c_proj")(merge_heads(att))[:, 0]
        if return_tokens:
            tokens = dense(out_dim, "c_proj_tokens")(v[:, 1:])  # spatial="v2" variant
            return pooled, tokens
        return pooled


class ModifiedResNet(nn.Module):
    """CLIP ResNet (reference few_shot.py:542-602): 3-conv stem with
    avgpool, anti-aliased bottleneck stages, attention pooling."""

    layers: Tuple[int, int, int, int]
    output_dim: int
    heads: int
    input_resolution: int = 224
    width: int = 64
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_tokens: bool = False, train: Optional[bool] = None):
        bn_train = self.train if train is None else train
        x = x.astype(self.dtype)
        conv = lambda f, s, name: nn.Conv(
            f, (3, 3), strides=(s, s), padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        bn = lambda name: BatchNorm(use_running_average=not bn_train, name=name)
        x = nn.relu(bn("bn1")(conv(self.width // 2, 2, "conv1")(x)))
        x = nn.relu(bn("bn2")(conv(self.width // 2, 1, "conv2")(x)))
        x = nn.relu(bn("bn3")(conv(self.width, 1, "conv3")(x)))
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))

        inplanes = self.width
        for stage, (blocks, planes, stride) in enumerate(
            zip(self.layers, (self.width, self.width * 2, self.width * 4, self.width * 8), (1, 2, 2, 2)), start=1
        ):
            for i in range(blocks):
                x = Bottleneck(
                    inplanes,
                    planes,
                    stride=stride if i == 0 else 1,
                    train=self.train,
                    dtype=self.dtype,
                    name=f"layer{stage}_{i}",
                )(x, train=bn_train)
                inplanes = planes * Bottleneck.EXPANSION

        return AttentionPool2d(
            self.input_resolution // 32, self.width * 32, self.heads, self.output_dim, dtype=self.dtype, name="attnpool"
        )(x, return_tokens=return_tokens)


# --------------------------------------------------------------------------
# text tower & full CLIP
# --------------------------------------------------------------------------


class TextTransformer(nn.Module):
    """Causal text encoder with EOT-token pooling (few_shot.py:793-806)."""

    arch: CLIPArch
    dtype: jnp.dtype = jnp.float32
    attention_backend: str = "xla"

    @nn.compact
    def __call__(self, text: jnp.ndarray) -> jnp.ndarray:
        a = self.arch
        x = nn.Embed(a.vocab_size, a.transformer_width, dtype=self.dtype, param_dtype=jnp.float32, name="token_embedding")(text)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01), (a.context_length, a.transformer_width), jnp.float32
        )
        x = x + pos.astype(x.dtype)
        x = Transformer(
            a.transformer_width,
            a.transformer_layers,
            a.transformer_heads,
            causal=True,
            dtype=self.dtype,
            attention_backend=self.attention_backend,
            name="transformer",
        )(x)
        x = LayerNorm(name="ln_final")(x)
        proj = self.param(
            "text_projection", nn.initializers.normal(a.transformer_width**-0.5), (a.transformer_width, a.embed_dim), jnp.float32
        )
        eot = jnp.argmax(text, axis=-1)  # EOT has the largest token id in each row
        pooled = x[jnp.arange(x.shape[0]), eot]
        return pooled @ proj.astype(x.dtype)


class CLIP(nn.Module):
    """Joint image/text model.  ``method``-dispatch via flax apply:

      variables = clip.init(rng, images, text)
      img = clip.apply(variables, images, method=CLIP.encode_image)
      txt = clip.apply(variables, text, method=CLIP.encode_text)
    """

    arch: CLIPArch
    dtype: jnp.dtype = jnp.float32
    train_backbone: bool = False  # BatchNorm mode for ModifiedResNet
    remat: bool = False
    remat_policy: str = "nothing"
    attention_backend: str = "xla"
    scan_layers: bool = False

    def setup(self):
        a = self.arch
        if a.is_vit:
            self.visual = VisionTransformer(
                input_resolution=a.image_resolution,
                patch_size=a.vision_patch_size,
                width=a.vision_width,
                layers=a.vision_layers,
                heads=a.vision_heads,
                output_dim=a.embed_dim,
                dtype=self.dtype,
                remat=self.remat,
                remat_policy=self.remat_policy,
                attention_backend=self.attention_backend,
                scan_layers=self.scan_layers,
            )
        else:
            self.visual = ModifiedResNet(
                layers=a.vision_layers,
                output_dim=a.embed_dim,
                heads=a.vision_heads,
                input_resolution=a.image_resolution,
                width=a.vision_width,
                train=self.train_backbone,
                dtype=self.dtype,
            )
        self.text = TextTransformer(a, dtype=self.dtype, attention_backend=self.attention_backend)
        self.logit_scale = self.param("logit_scale", nn.initializers.constant(jnp.log(1 / 0.07)), (), jnp.float32)

    def encode_image(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: [B, H, W, 3] normalized; returns [B, embed_dim]."""
        return self.visual(images)

    def encode_text(self, text: jnp.ndarray) -> jnp.ndarray:
        """text: [B, context_length] int tokens; returns [B, embed_dim]."""
        return self.text(text)

    def __call__(self, images: jnp.ndarray, text: jnp.ndarray):
        img = self.encode_image(images)
        txt = self.encode_text(text)
        img = img / jnp.linalg.norm(img.astype(jnp.float32), axis=-1, keepdims=True).astype(img.dtype)
        txt = txt / jnp.linalg.norm(txt.astype(jnp.float32), axis=-1, keepdims=True).astype(txt.dtype)
        scale = jnp.exp(self.logit_scale).astype(img.dtype)
        logits_per_image = scale * img @ txt.T
        return logits_per_image, logits_per_image.T


def build_clip(name: str, dtype=jnp.float32, **kwargs) -> CLIP:
    if name not in ARCHS:
        raise KeyError(f"Unknown CLIP arch {name!r}. Known: {sorted(ARCHS)}")
    return CLIP(arch=ARCHS[name], dtype=dtype, **kwargs)
