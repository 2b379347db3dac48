"""MoLo head (CNN_BiMHM_MoLo, reference models/base/few_shot.py:2390-2654):
motion-augmented long-short contrastive few-shot matching.

Streams:
  * appearance: GAP frame features + class token -> temporal transformer;
  * motion: 3D-conv reduced spatial features, frame-difference of a
    3x3-conv'd copy, 1x1 up-projection, GAP, class token, its own
    temporal transformer;
  * a U-Net-ish decoder reconstructs raw frame differences from the
    motion features (MSE loss at train, few_shot.py:2643-2647);
  * logits: frame-level Bi-MHM (min-sum) distances of both streams
    (appearance + LOGIT_BALANCE_COFF * motion) plus global<->local
    s2q/q2s contrastive logits scaled by learnable temperatures.

Decoder BatchNorms train on per-episode batch statistics like the
reference (running stats updated via the step's mutable batch_stats,
averaged across the episode vmap); eval uses running averages.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from clip_fsar_tpu.data.types import Episode
from clip_fsar_tpu.models.clip.model import BatchNorm
from clip_fsar_tpu.models.heads.common import PreNormSelfAttention, class_mean, cos_sim, hyrsm_positional_table
from clip_fsar_tpu.models.heads.fsheads import make_backbone
from clip_fsar_tpu.utils.registry import HEAD_REGISTRY


class TransformerV2Block(nn.Module):
    """Transformer_v2 at depth 1 (reference few_shot.py:1001-1022):
    pre-norm self-attention + residual FeedForward."""

    dim: int
    heads: int = 8
    dropout_atte: float = 0.2
    mlp_dim: int = 2048
    dropout_ffn: float = 0.05
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = PreNormSelfAttention(self.dim, heads=self.heads, dim_head=self.dim // self.heads,
                                 dropout=self.dropout_atte, dtype=self.dtype, name="attn")(x, deterministic)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, param_dtype=jnp.float32, name="ff_fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout_ffn, deterministic=deterministic)(h)
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="ff_fc2")(h)
        h = nn.Dropout(self.dropout_ffn, deterministic=deterministic)(h)
        return x + h


class UpBlock(nn.Module):
    """Bilinear upsample + conv3x3 + BN + ReLU (reference Up2/DoubleConv2,
    few_shot.py:889-962).  The default scales (2, 4, 4) map a 7x7 grid to
    224; ``scale`` may be overridden per call for other grid/resolution
    ratios."""

    out_channels: int
    scale: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale: int = 0, use_running_average: bool = True):
        s = scale or self.scale
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * s, w * s, c), method="bilinear")
        x = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        x = BatchNorm(use_running_average=use_running_average, name="bn")(x)
        return nn.relu(x)


def _bi_mhm_flat(tgt: jnp.ndarray, sup: jnp.ndarray) -> jnp.ndarray:
    """Frame-level min-sum distance from flattened cos_sim
    (reference :2607-2621): tgt [Q, T, D], sup [S, T, D] -> [Q, S]."""
    q, t, d = tgt.shape
    s = sup.shape[0]
    sim = cos_sim(tgt.reshape(q * t, d), sup.reshape(s * sup.shape[1], d))
    dists = (1.0 - sim).reshape(q, t, s, sup.shape[1]).transpose(0, 2, 1, 3)  # [Q, S, Tq, Ts]
    return dists.min(axis=3).sum(axis=2) + dists.min(axis=2).sum(axis=2)


class MoLoHead(nn.Module):
    backbone_name: str
    way: int
    num_frames: int
    num_class: int = 64
    heads: int = 8
    use_contrastive: bool = True
    use_classification: bool = True
    use_local: bool = False
    single_direct: bool = False
    logit_balance_coff: float = 0.3
    temp_coff: float = 0.0  # 0 -> learnable scales
    position_a: float = 10.0
    position_b: float = 1.0
    dtype: jnp.dtype = jnp.float32
    # the decoder BNs train on batch statistics -> the train step must
    # open mutable batch_stats (train/step.py keys on this attribute)
    train_backbone_bn: bool = True

    FACTOR = 8

    def setup(self):
        self.backbone, self.dim = make_backbone(self.backbone_name, self.dtype)
        d = self.dim
        self.class_token = self.param("class_token", nn.initializers.normal(1.0), (1, 1, d), jnp.float32)
        self.class_token_motion = self.param("class_token_motion", nn.initializers.normal(1.0), (1, 1, d), jnp.float32)
        self.temporal_atte_before = TransformerV2Block(d, heads=self.heads, dtype=self.dtype)
        self.temporal_atte_before_motion = TransformerV2Block(d, heads=self.heads, dtype=self.dtype)
        self.motion_reduce = nn.Conv(d // self.FACTOR, (3, 3, 3), padding=[(1, 1)] * 3, dtype=self.dtype, param_dtype=jnp.float32)
        self.motion_conv = nn.Conv(d // self.FACTOR, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype, param_dtype=jnp.float32)
        self.motion_up = nn.Conv(d, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)
        self.up1 = UpBlock(128, scale=2, dtype=self.dtype)
        self.up2 = UpBlock(32, scale=4, dtype=self.dtype)
        self.up3 = UpBlock(16, scale=4, dtype=self.dtype)
        self.outc = nn.Conv(3, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)
        if self.use_classification:
            self.classification_layer = nn.Dense(self.num_class, dtype=self.dtype, param_dtype=jnp.float32)
        # temperature params exist ONLY under USE_CONTRASTIVE (reference
        # few_shot.py:2400-2409) — param-tree parity with its checkpoints
        if self.use_contrastive and not self.temp_coff:
            self.scale = self.param("scale", nn.initializers.ones, (1,), jnp.float32)
            self.scale_motion = self.param("scale_motion", nn.initializers.ones, (1,), jnp.float32)
        self.pe_drop = nn.Dropout(0.1)

    def _pe(self, x, deterministic):
        table = jnp.asarray(hyrsm_positional_table(20, self.dim))
        x = x * jnp.sqrt(jnp.float32(self.dim) / self.position_a).astype(x.dtype)
        x = x + self.position_b * table[: x.shape[1]]
        return self.pe_drop(x, deterministic=deterministic)

    def _streams(self, images: jnp.ndarray, cls_token, cls_token_motion, deterministic):
        """images [N, T, H, W, 3] -> (appearance [N, T+1, D], motion
        [N, T, D], recon [N*(T-1), H, W, 3])."""
        n, t = images.shape[:2]
        flat = images.reshape((n * t,) + images.shape[2:])
        from clip_fsar_tpu.models.resnet import TorchResNet as _TRN

        if isinstance(self.backbone, _TRN):
            spatial = self.backbone(flat, pool=False)  # [N*T, h, w, D]
        else:
            # CLIP towers: spatial token grid as the feature map
            _, tokens = self.backbone(flat, return_tokens=True)
            g = int(tokens.shape[1] ** 0.5)
            spatial = tokens.reshape(tokens.shape[0], g, g, tokens.shape[-1])
        h, w, d = spatial.shape[1:]

        # motion: 3D conv over (T, h, w)
        vid = spatial.reshape(n, t, h, w, d)
        red = self.motion_reduce(vid)  # [N, T, h, w, D/8]
        red_flat = red.reshape(n * t, h, w, d // self.FACTOR)
        conv = self.motion_conv(red_flat).reshape(n, t, h, w, d // self.FACTOR)
        motion = (conv[:, 1:] - red[:, :-1]).reshape(n * (t - 1), h, w, d // self.FACTOR)

        # decoder scales: total upscale = image resolution / grid size
        ratio = images.shape[2] // h
        s3 = max(ratio // 8, 1)
        # the reference trains the decoder's fresh BatchNorms on batch
        # statistics (few_shot.py:889-962 DoubleConv2); running stats are
        # used only at eval
        rec = self.up1(motion, scale=2, use_running_average=deterministic)
        rec = self.up2(rec, scale=4, use_running_average=deterministic)
        rec = self.up3(rec, scale=s3, use_running_average=deterministic)
        rec = self.outc(rec)  # [N*(T-1), H', W', 3]
        if rec.shape[1] != images.shape[2]:  # non-divisible ratios
            rec = jax.image.resize(rec, (rec.shape[0], images.shape[2], images.shape[3], 3), method="bilinear")

        motion_feat = nn.relu(self.motion_up(motion)).mean(axis=(1, 2)).reshape(n, t - 1, d).astype(jnp.float32)
        motion_feat = jnp.concatenate([jnp.broadcast_to(cls_token_motion, (n, 1, d)), motion_feat], axis=1)
        motion_feat = nn.relu(self.temporal_atte_before_motion(self._pe(motion_feat, deterministic), deterministic))

        app = spatial.mean(axis=(1, 2)).reshape(n, t, d).astype(jnp.float32)
        app = jnp.concatenate([jnp.broadcast_to(cls_token, (n, 1, d)), app], axis=1)
        app = nn.relu(self.temporal_atte_before(self._pe(app, deterministic), deterministic))
        return app, motion_feat, rec

    def __call__(self, episode: Episode, *unused, train: bool = True) -> Dict[str, Any]:
        det = not train
        way, t = self.way, self.num_frames
        cls_tok = self.class_token.astype(jnp.float32)
        cls_tok_m = self.class_token_motion.astype(jnp.float32)
        sup_app, sup_mot, sup_rec = self._streams(episode.support_images, cls_tok, cls_tok_m, det)
        tgt_app, tgt_mot, tgt_rec = self._streams(episode.target_images, cls_tok, cls_tok_m, det)

        # classification logits (reference :2519-2531)
        class_logits = None
        if self.use_classification:
            if self.use_local:
                class_logits = self.classification_layer(jnp.concatenate([sup_app, tgt_app], 0)).reshape(-1, self.num_class)
            else:
                feats = jnp.concatenate(
                    [sup_app.mean(1) + sup_mot.mean(1), tgt_app.mean(1) + tgt_mot.mean(1)], axis=0
                )
                class_logits = self.classification_layer(feats)

        labels = episode.support_labels
        sup_app = class_mean(sup_app, labels, way)  # [WAY, T+1, D]
        sup_mot = class_mean(sup_mot, labels, way)

        # the scale multiply is gated like its params (reference applies it
        # only under USE_CONTRASTIVE, :2571-2603); without the gate the
        # s2q/q2s outputs are unscaled (and unused by the loss)
        if self.use_contrastive:
            scale = self.scale.astype(jnp.float32) if not self.temp_coff else jnp.float32(self.temp_coff)
            scale_m = self.scale_motion.astype(jnp.float32) if not self.temp_coff else jnp.float32(self.temp_coff)
        else:
            scale = scale_m = jnp.float32(1.0)

        def token_logits(sup, tgt, sc):
            sup_g, tgt_g = sup[:, 0, :], tgt[:, 0, :]
            sup_l, tgt_l = sup[:, 1:, :], tgt[:, 1:, :]
            s2q = (1.0 - cos_sim(sup_l, tgt_g)).sum(axis=1) * sc  # [WAY, Q]
            q2s = (1.0 - cos_sim(tgt_l, sup_g)).sum(axis=1) * sc  # [Q, WAY]
            return sup_l, tgt_l, -s2q.T, -q2s

        sup_l, tgt_l, logits_s2q, logits_q2s = token_logits(sup_app, tgt_app, scale)
        sup_lm, tgt_lm, logits_s2q_m, logits_q2s_m = token_logits(sup_mot, tgt_mot, scale_m)

        if self.single_direct:
            def one_dir(tgt_, sup_):
                q, tt, d = tgt_.shape
                s = sup_.shape[0]
                sim = cos_sim(tgt_.reshape(q * tt, d), sup_.reshape(s * sup_.shape[1], d))
                dd = (1.0 - sim).reshape(q, tt, s, sup_.shape[1]).transpose(0, 2, 1, 3)
                return dd.min(axis=3).sum(axis=2)

            dists = one_dir(tgt_l, sup_l)
            dists_m = one_dir(tgt_lm, sup_lm)
        else:
            dists = _bi_mhm_flat(tgt_l, sup_l)  # [Q, WAY]
            dists_m = _bi_mhm_flat(tgt_lm, sup_lm)
        class_dists = dists + self.logit_balance_coff * dists_m

        # reconstruction target: raw frame differences (reference :2536-2546)
        def diffs(images):
            return (images[:, 1:] - images[:, :-1]).reshape((-1,) + images.shape[2:])

        recons = jnp.concatenate([sup_rec, tgt_rec], axis=0).astype(jnp.float32)
        target_recons = jnp.concatenate([diffs(episode.support_images), diffs(episode.target_images)], axis=0)
        loss_recons = jnp.mean((recons - target_recons.astype(jnp.float32)) ** 2) if train else jnp.float32(0.0)

        return {
            "logits": -class_dists,
            "class_logits": class_logits,
            "logits_s2q": logits_s2q,
            "logits_q2s": logits_q2s,
            "logits_s2q_motion": logits_s2q_m,
            "logits_q2s_motion": logits_q2s_m,
            "loss_recons": loss_recons,
        }


@HEAD_REGISTRY.register(name="CNN_BiMHM_MoLo")
def build_molo(cfg, dtype=jnp.float32, **kw):
    t = cfg.TRAIN
    return MoLoHead(
        backbone_name=cfg.VIDEO.HEAD.BACKBONE_NAME,
        way=int(t.WAY),
        num_frames=int(cfg.DATA.NUM_INPUT_FRAMES),
        num_class=int(t.get("NUM_CLASS", 64) or 64),
        heads=int(t.get("HEAD", 8) or 8),
        use_contrastive=bool(t.get("USE_CONTRASTIVE", False)),
        use_classification=bool(t.get("USE_CLASSIFICATION", False)),
        use_local=bool(t.get("USE_LOCAL", False)),
        single_direct=bool(t.get("SINGLE_DIRECT", False)),
        logit_balance_coff=float(t.get("LOGIT_BALANCE_COFF", 0.3) or 0.3),
        temp_coff=float(t.get("TEMP_COFF", 0.0) or 0.0),
        position_a=float(t.get("POSITION_A", 10.0) or 10.0),
        position_b=float(t.get("POSITION_B", 1.0) or 1.0),
        dtype=dtype,
    )
