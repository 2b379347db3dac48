"""Video transformers (capability of reference models/base/transformer.py):
BaseTransformerLayer, TimesformerLayer (divided space-time attention),
Transformer and FactorizedTransformer (ViViT factorized-encoder) backbones,
plus the patch/tubelet embedding stems
(module_zoo/stems/embedding_stem.py).

Tokens: [B, 1 + T*N, C] with the cls token first.  DropPath implements
stochastic depth per sample.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from clip_fsar_tpu.ops.attention import merge_heads, mha, split_heads
from clip_fsar_tpu.utils.registry import BACKBONE_REGISTRY, BRANCH_REGISTRY, STEM_REGISTRY


class DropPath(nn.Module):
    """Stochastic depth (reference base_blocks.py:529-539)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return x / keep * mask


class VideoAttention(nn.Module):
    """qkv attention with an optional divided space-time ("partial") mode
    (reference transformer.py:37-144)."""

    dim: int
    num_heads: int = 12
    attn_dropout: float = 0.1
    ff_dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def _attn_rng(self, deterministic: bool):
        if deterministic or self.attn_dropout <= 0.0:
            return None
        return self.make_rng("dropout")

    @nn.compact
    def __call__(self, x, deterministic: bool = True, divide: Optional[str] = None, frames: int = 0, patches: int = 0):
        h = self.num_heads
        qkv = nn.Dense(self.dim * 3, use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        if divide is None:
            out = merge_heads(
                mha(
                    split_heads(q, h), split_heads(k, h), split_heads(v, h),
                    prob_dropout_rate=self.attn_dropout, prob_dropout_rng=self._attn_rng(deterministic),
                )
            )
        else:
            out = self._divided(q, k, v, divide, frames, patches, deterministic)
        out = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)
        return nn.Dropout(self.ff_dropout, deterministic=deterministic)(out)

    def _divided(self, q, k, v, mode: str, t: int, n: int, deterministic: bool):
        """mode: 'time' -> attend across frames per patch; 'space' ->
        across patches per frame.  cls token attends everything; its k/v
        join every group."""
        h = self.num_heads
        b = q.shape[0]
        d = q.shape[-1] // h
        sh = lambda x_: split_heads(x_, h)  # [B, H, N, d]

        qh, kh, vh = sh(q), sh(k), sh(v)
        cls_q, q_ = qh[:, :, :1], qh[:, :, 1:]
        cls_k, k_ = kh[:, :, :1], kh[:, :, 1:]
        cls_v, v_ = vh[:, :, :1], vh[:, :, 1:]

        # cls attends over the full sequence
        cls_out = mha(cls_q, kh, vh, prob_dropout_rate=self.attn_dropout, prob_dropout_rng=self._attn_rng(deterministic))  # [B, H, 1, d]

        if mode == "time":
            # groups: one per patch; seq axis = frames
            regroup = lambda x_: x_.reshape(b, h, t, n, d).transpose(0, 3, 1, 2, 4).reshape(b * n, h, t, d)
            r = n
        else:
            regroup = lambda x_: x_.reshape(b, h, t, n, d).transpose(0, 2, 1, 3, 4).reshape(b * t, h, n, d)
            r = t
        qg, kg, vg = regroup(q_), regroup(k_), regroup(v_)
        cls_kg = jnp.repeat(cls_k.transpose(0, 2, 1, 3), r, axis=0).transpose(0, 2, 1, 3)
        cls_vg = jnp.repeat(cls_v.transpose(0, 2, 1, 3), r, axis=0).transpose(0, 2, 1, 3)
        kg = jnp.concatenate([cls_kg, kg], axis=2)
        vg = jnp.concatenate([cls_vg, vg], axis=2)
        out = mha(qg, kg, vg, prob_dropout_rate=self.attn_dropout, prob_dropout_rng=self._attn_rng(deterministic))  # [B*r, h, seq, d]

        if mode == "time":
            out = out.reshape(b, n, h, t, d).transpose(0, 2, 3, 1, 4).reshape(b, h, t * n, d)
        else:
            out = out.reshape(b, t, h, n, d).transpose(0, 2, 1, 3, 4).reshape(b, h, t * n, d)
        return merge_heads(jnp.concatenate([cls_out, out], axis=2))


class TransformerFeedForward(nn.Module):
    dim: int
    mult: int = 4
    ff_dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.dim * self.mult, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.ff_dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(h)
        return nn.Dropout(self.ff_dropout, deterministic=deterministic)(h)


@BRANCH_REGISTRY.register(name="BaseTransformerLayer")
class BaseTransformerLayer(nn.Module):
    cfg: Any
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        bb = self.cfg.VIDEO.BACKBONE
        dim = int(bb.NUM_FEATURES)
        # LN computes in fp32 (stats stability) but returns the compute
        # dtype; Dense layers run in the tower's compute dtype
        ln = lambda name: nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, param_dtype=jnp.float32, name=name)
        attn = VideoAttention(
            dim, int(bb.NUM_HEADS), float(bb.get("ATTN_DROPOUT", 0.1)), float(bb.get("FF_DROPOUT", 0.1)),
            dtype=self.dtype, name="attn"
        )
        dp = DropPath(self.drop_path_rate, name="drop_path")
        x = x + dp(attn(ln("norm")(x).astype(self.dtype), deterministic), deterministic)
        ffn = TransformerFeedForward(dim, int(bb.get("MLP_MULT", 4)), float(bb.get("FF_DROPOUT", 0.1)), dtype=self.dtype, name="ffn")
        return x + dp(ffn(ln("norm_ffn")(x).astype(self.dtype), deterministic), deterministic)


@BRANCH_REGISTRY.register(name="TimesformerLayer")
class TimesformerLayer(nn.Module):
    cfg: Any
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        bb = cfg.VIDEO.BACKBONE
        dim = int(bb.NUM_FEATURES)
        t = int(cfg.DATA.NUM_INPUT_FRAMES)
        n = (int(cfg.DATA.TRAIN_CROP_SIZE) // int(bb.PATCH_SIZE)) ** 2
        ln = lambda name: nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, param_dtype=jnp.float32, name=name)
        heads, ad, fd = int(bb.NUM_HEADS), float(bb.get("ATTN_DROPOUT", 0.1)), float(bb.get("FF_DROPOUT", 0.1))
        dp = DropPath(self.drop_path_rate, name="drop_path")
        at = VideoAttention(dim, heads, ad, fd, dtype=self.dtype, name="attn_temporal")
        x = x + dp(at(ln("norm_temporal")(x).astype(self.dtype), deterministic, divide="time", frames=t, patches=n), deterministic)
        asp = VideoAttention(dim, heads, ad, fd, dtype=self.dtype, name="attn")
        x = x + dp(asp(ln("norm")(x).astype(self.dtype), deterministic, divide="space", frames=t, patches=n), deterministic)
        ffn = TransformerFeedForward(dim, 4, fd, dtype=self.dtype, name="ffn")
        return x + dp(ffn(ln("norm_ffn")(x).astype(self.dtype), deterministic), deterministic)


@STEM_REGISTRY.register(name="PatchEmbedStem")
class PatchEmbedStem(nn.Module):
    """Per-frame patch embedding -> [B, T*N, C]
    (reference embedding_stem.py:17-56)."""

    cfg: Any
    train_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        bb = self.cfg.VIDEO.BACKBONE
        p, f = int(bb.PATCH_SIZE), int(bb.NUM_FEATURES)
        b, t = x.shape[:2]
        x = nn.Conv(f, (1, p, p), strides=(1, p, p), dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(x)
        return x.reshape(b, -1, f)  # [B, T*N, C], frame-major


@STEM_REGISTRY.register(name="TubeletEmbeddingStem")
class TubeletEmbeddingStem(nn.Module):
    """3D tubelet embedding (reference embedding_stem.py:59-98)."""

    cfg: Any
    train_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        bb = self.cfg.VIDEO.BACKBONE
        p, f = int(bb.PATCH_SIZE), int(bb.NUM_FEATURES)
        ts = int(bb.get("TUBELET_SIZE", 2))
        b = x.shape[0]
        x = nn.Conv(f, (ts, p, p), strides=(ts, p, p), dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(x)
        return x.reshape(b, -1, f)


@BACKBONE_REGISTRY.register(name="Transformer")
class VideoTransformer(nn.Module):
    """TimeSformer-style joint transformer over all tokens
    (reference transformer.py:221-283).  Returns the cls feature [B, C]."""

    cfg: Any
    train_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        bb = cfg.VIDEO.BACKBONE
        f = int(bb.NUM_FEATURES)
        depth = int(bb.DEPTH)
        drop_path = float(bb.get("DROP_PATH", 0.0) or 0.0)
        tubelet = int(bb.get("TUBELET_SIZE", 1) or 1)
        num_patches = int(cfg.DATA.NUM_INPUT_FRAMES) * (int(cfg.DATA.TRAIN_CROP_SIZE) // int(bb.PATCH_SIZE)) ** 2 // tubelet

        x = STEM_REGISTRY.get(bb.STEM.NAME)(cfg=cfg, dtype=self.dtype, name="stem")(x)
        cls = self.param("cls_token", nn.initializers.truncated_normal(0.02), (1, 1, f), jnp.float32)
        pos = self.param("pos_embd", nn.initializers.truncated_normal(0.02), (1, num_patches + 1, f), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(x.dtype), (x.shape[0], 1, f)), x], axis=1)
        x = x + pos.astype(x.dtype)
        dpr = [drop_path * i / max(depth - 1, 1) for i in range(depth)]
        for i in range(depth):
            x = BRANCH_REGISTRY.get(bb.BRANCH.NAME)(cfg=cfg, drop_path_rate=dpr[i], dtype=self.dtype, name=f"layers_{i}")(x, deterministic)
        x = nn.LayerNorm(epsilon=1e-6, param_dtype=jnp.float32, name="norm")(x)
        return x[:, 0]


@BACKBONE_REGISTRY.register(name="FactorizedTransformer")
class FactorizedTransformer(nn.Module):
    """ViViT factorized encoder (reference transformer.py:285-398):
    per-frame spatial transformer -> temporal transformer over frame cls
    features.  Returns the output cls feature [B, C]."""

    cfg: Any
    train_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        bb = cfg.VIDEO.BACKBONE
        f = int(bb.NUM_FEATURES)
        depth = int(bb.DEPTH)
        depth_temp = int(bb.get("DEPTH_TEMP", 4))
        drop_path = float(bb.get("DROP_PATH", 0.0) or 0.0)
        tubelet = int(bb.get("TUBELET_SIZE", 1) or 1)
        n_per_frame = (int(cfg.DATA.TRAIN_CROP_SIZE) // int(bb.PATCH_SIZE)) ** 2
        t_frames = int(cfg.DATA.NUM_INPUT_FRAMES) // tubelet

        x = STEM_REGISTRY.get(bb.STEM.NAME)(cfg=cfg, dtype=self.dtype, name="stem")(x)  # [B, T*N, C]
        b = x.shape[0]
        # token geometry from the ACTUAL input (eval may use a different
        # crop size than TRAIN_CROP_SIZE): the pos table is sized for the
        # train grid and bilinearly interpolated when the grid differs
        # (reference transformer.py:360-385 variable-resolution path)
        n_actual = x.shape[1] // t_frames
        x = x.reshape(b * t_frames, n_actual, f)

        cls = self.param("cls_token", nn.initializers.truncated_normal(0.02), (1, 1, f), jnp.float32)
        pos = self.param("pos_embd", nn.initializers.truncated_normal(0.02), (1, n_per_frame + 1, f), jnp.float32)
        if n_actual != n_per_frame:
            side_t = int(round(n_per_frame ** 0.5))
            side_a = int(round(n_actual ** 0.5))
            grid = pos[:, 1:].reshape(side_t, side_t, f)
            grid = jax.image.resize(grid, (side_a, side_a, f), method="bilinear")
            pos = jnp.concatenate([pos[:, :1], grid.reshape(1, n_actual, f)], axis=1)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(x.dtype), (x.shape[0], 1, f)), x], axis=1)
        x = x + pos.astype(x.dtype)

        total = depth + depth_temp
        dpr = [drop_path * i / max(total - 1, 1) for i in range(total)]
        for i in range(depth):
            x = BRANCH_REGISTRY.get(bb.BRANCH.NAME)(cfg=cfg, drop_path_rate=dpr[i], dtype=self.dtype, name=f"layers_{i}")(x, deterministic)
        x = nn.LayerNorm(epsilon=1e-6, param_dtype=jnp.float32, name="norm")(x)[:, 0]

        x = x.reshape(b, t_frames, f)
        cls_out = self.param("cls_token_out", nn.initializers.truncated_normal(0.02), (1, 1, f), jnp.float32)
        temp = self.param("temp_embd", nn.initializers.truncated_normal(0.02), (1, t_frames + 1, f), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls_out.astype(x.dtype), (b, 1, f)), x], axis=1)
        x = x + temp.astype(x.dtype)
        for i in range(depth_temp):
            x = BRANCH_REGISTRY.get(bb.BRANCH.NAME)(cfg=cfg, drop_path_rate=dpr[depth + i], dtype=self.dtype, name=f"layers_temporal_{i}")(x, deterministic)
        x = nn.LayerNorm(epsilon=1e-6, param_dtype=jnp.float32, name="norm_out")(x)
        return x[:, 0]
