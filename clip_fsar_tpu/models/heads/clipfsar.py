"""CLIP-FSAR head: CLIP visual features + text-prototype modulation + OTAM.

Behavioral parity with the reference ``CNN_OTAM_CLIPFSAR``
(models/base/few_shot.py:2691-2993), redesigned for XLA:

  * pure function of (params, episode, text banks) — the text features are
    precomputed constants (the reference computes them once at __init__
    under no_grad, few_shot.py:2714-2728), carried as inputs, not params;
  * class prototypes via static one-hot segment means (labels are always
    0..WAY-1) instead of torch.unique + index_select — identical result,
    no dynamic shapes;
  * OTAM unrolled at trace time (clip_fsar_tpu.ops.otam);
  * episodes batch: vmap this module over a leading [E] axis and the CLIP
    tower sees E*(S+Q)*T frames per step — the MXU-utilization lever the
    per-GPU-single-episode reference lacks.

Eval-mode variants (all reference-gated by hasattr on cfg.TRAIN):
  plain OTAM, ``EVAL_TEXT`` (zero-shot text matching), ``COMBINE``
  (text^a * visual_softmax^(1-a) fusion), ``MERGE_BEFORE`` (class-mean
  before modulation; the published 5-shot test protocol).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from clip_fsar_tpu.data.types import Episode
from clip_fsar_tpu.models.clip.model import CLIPArch, ModifiedResNet, VisionTransformer
from clip_fsar_tpu.models.heads.common import TransformerV1, class_mean, cos_sim
from clip_fsar_tpu.ops.otam import otam_distance


@dataclasses.dataclass(frozen=True)
class CLIPFSARConfig:
    """Static head hyperparameters extracted from the YAML config."""

    way: int = 5
    num_frames: int = 8
    transformer_depth: int = 1
    use_classification: bool = True
    merge_before: bool = False
    combine: bool = False
    eval_text: bool = False
    single_direct: bool = False
    text_coff: Optional[float] = None  # None -> 0.9 (reference default)

    @classmethod
    def from_cfg(cls, cfg) -> "CLIPFSARConfig":
        t = cfg.TRAIN
        depth = t.get("TRANSFORMER_DEPTH", None)
        return cls(
            way=int(t.WAY),
            num_frames=int(cfg.DATA.NUM_INPUT_FRAMES),
            transformer_depth=int(depth) if depth else 1,
            use_classification=bool(t.get("USE_CLASSIFICATION", False)),
            merge_before=bool(t.get("MERGE_BEFORE", False)),
            combine=bool(t.get("COMBINE", False)),
            eval_text=bool(t.get("EVAL_TEXT", False)),
            single_direct=bool(t.get("SINGLE_DIRECT", False)),
            # the reference gate is `hasattr(...) and cfg.TRAIN.TEXT_COFF`
            # (few_shot.py:2926) — an explicit 0.0 falls back to 0.9 there
            # too, so `or None` is exact truthiness parity, not a bug
            text_coff=t.get("TEXT_COFF", None) or None,
        )


class CLIPFSARHead(nn.Module):
    arch: CLIPArch
    head_cfg: CLIPFSARConfig
    dtype: jnp.dtype = jnp.float32
    train_backbone_bn: bool = False  # BatchNorm batch-stats mode (RN towers)
    remat: bool = False
    remat_policy: str = "nothing"
    attention_backend: str = "xla"
    scan_layers: bool = False
    # >1: run the frame batch through the ViT tower in this many sequential
    # chunks, each rematted as a whole (TPU.FRAME_CHUNKS).  Bounds the
    # live layer-boundary activations to ONE chunk — ViT-L/14@336px with
    # 16 frames needs 24 x [480,577,1024] bf16 saves (~13.6 GB) and OOMs
    # a 16 GB v5e without it.  Costs one extra tower forward in backward
    # (~+33% tower FLOPs).  Per-frame math is independent, so results are
    # bitwise identical to the unchunked tower.
    frame_chunks: int = 1

    def setup(self):
        a = self.arch
        if a.is_vit:
            self.backbone = VisionTransformer(
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
            self.backbone = ModifiedResNet(
                layers=a.vision_layers,
                output_dim=a.embed_dim,
                heads=a.vision_heads,
                input_resolution=a.image_resolution,
                width=a.vision_width,
                train=self.train_backbone_bn,
                dtype=self.dtype,
            )
        mid = a.embed_dim  # 1024 for RN50, 512 for ViT-B/16 (few_shot.py:2699-2713)
        self.context2 = TransformerV1(
            dim=mid,
            heads=8,
            dim_head_k=mid // 8,
            dropout_atte=0.2,
            depth=self.head_cfg.transformer_depth,
            dtype=self.dtype,
        )
        self.scale = self.param("scale", nn.initializers.ones, (1,), jnp.float32)

    def encode_frames(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """[N, T, H, W, 3] -> [N, T, D] through the CLIP visual tower.

        For the RN towers, train mode runs BatchNorm on batch statistics
        (the reference trains the whole model, so RN50 BN sees per-episode
        batch stats — few_shot.py:2744-2770 under model.train()); gate with
        ``train_backbone_bn`` (wired from BN.FREEZE)."""
        n, t = images.shape[:2]
        flat = images.reshape((n * t,) + images.shape[2:])
        if self.arch.is_vit:
            chunks = self.frame_chunks
            if chunks > 1 and flat.shape[0] % chunks == 0 and not self.is_initializing():
                # sequential rematted chunks via nn.scan: params broadcast,
                # only one chunk's tower activations live at a time
                def body(mdl, carry, xs):
                    return carry, mdl.backbone(xs)

                scanned = nn.scan(
                    nn.remat(body, prevent_cse=False),
                    variable_broadcast="params",
                    split_rngs={"params": False, "dropout": False},
                    in_axes=0,
                    out_axes=0,
                )
                _, feats = scanned(self, (), flat.reshape((chunks, flat.shape[0] // chunks) + flat.shape[1:]))
                feats = feats.reshape((flat.shape[0],) + feats.shape[2:])
            else:
                feats = self.backbone(flat)
        else:
            feats = self.backbone(flat, train=train and self.train_backbone_bn)
        return feats.reshape(n, t, -1)

    def __call__(
        self,
        episode: Episode,
        text_train: jnp.ndarray,
        text_test: Optional[jnp.ndarray] = None,
        train: bool = True,
        deterministic: Optional[bool] = None,
    ) -> Dict[str, Any]:
        """Returns {"logits": [Q, WAY], "class_logits": [S+Q, C_train] | None}.

        ``deterministic`` overrides dropout behavior independently of the
        train/eval branch selection (used by the reference-parity tests to
        drive the train code path without stochastic dropout).
        """
        hc = self.head_cfg
        way, t = hc.way, hc.num_frames
        if episode.support_images.shape[0] % way:
            raise ValueError(
                f"episode has {episode.support_images.shape[0]} support clips, "
                f"not divisible by WAY={way} — episode/head config mismatch"
            )
        if episode.support_images.shape[1] != t:
            raise ValueError(
                f"episode has {episode.support_images.shape[1]} frames, head expects NUM_INPUT_FRAMES={t}"
            )
        if deterministic is None:
            deterministic = not train
        text_eval = text_test if text_test is not None else text_train

        # --- CLIP visual features.  One fused encode over support+target
        # keeps the MXU fed with a single large batch (the reference's two
        # calls, few_shot.py:2744-2770, are a torch ergonomics artifact) —
        # identical math except when RN BatchNorm runs on batch statistics
        # in train mode, where the reference's per-call stats are kept. ---
        s_clips = episode.support_images.shape[0]
        if train and self.train_backbone_bn and not self.arch.is_vit:
            support_features = self.encode_frames(episode.support_images, train=train).astype(jnp.float32)
            target_features = self.encode_frames(episode.target_images, train=train).astype(jnp.float32)
        else:
            both = jnp.concatenate([episode.support_images, episode.target_images], axis=0)
            feats = self.encode_frames(both, train=train).astype(jnp.float32)
            support_features, target_features = feats[:s_clips], feats[s_clips:]
        scale = self.scale.astype(jnp.float32)

        if not train and hc.eval_text:
            # zero-shot: mean target feature vs class-mean support text
            text_feats = text_eval[episode.real_support_labels]
            text_feats = class_mean(text_feats, episode.support_labels, way)
            image_features = target_features.mean(axis=1)
            image_features = image_features / jnp.linalg.norm(image_features, axis=1, keepdims=True)
            text_feats = text_feats / jnp.linalg.norm(text_feats, axis=1, keepdims=True)
            logits_per_image = nn.softmax(scale * image_features @ text_feats.T, axis=1)
            return {"logits": logits_per_image, "class_logits": None}

        # --- video-text classification logits (cls loss; few_shot.py:2782-2787;
        # computed unconditionally in eval, gated by USE_CLASSIFICATION in train) ---
        class_logits = None
        if (train and hc.use_classification) or not train:
            all_feats = jnp.concatenate([support_features, target_features], axis=0).mean(axis=1)
            class_logits = cos_sim(all_feats, text_train) * scale

        # --- prototype modulation (few_shot.py:2791-2811) ---
        bank = text_train if train else text_eval
        context_support = bank[episode.real_support_labels][:, None, :].astype(jnp.float32)

        # COMBINE's text-matching term uses the *raw* (pre-modulation) target
        # features (reference few_shot.py:2894-2900 runs before context2)
        raw_target_mean = target_features.mean(axis=1)
        target_features = self.context2(target_features, target_features, target_features, deterministic=deterministic)

        support_labels = episode.support_labels
        support_feats = support_features
        if hc.merge_before:
            support_feats = class_mean(support_feats, support_labels, way)
            context_support = class_mean(context_support, support_labels, way)
        merged = jnp.concatenate([support_feats, context_support], axis=1)
        support_feats = self.context2(merged, merged, merged, deterministic=deterministic)[:, :t, :]
        if not hc.merge_before:
            support_feats = class_mean(support_feats, support_labels, way)
        # prototypes are now ordered by class id 0..WAY-1 (torch.unique order)

        # --- OTAM frame-alignment distance (few_shot.py:2813-2832) ---
        q = target_features.reshape(-1, target_features.shape[-1])  # [Q*T, D]
        s = support_feats.reshape(-1, support_feats.shape[-1])  # [WAY*T, D]
        frame_dists = 1.0 - cos_sim(q, s)  # [Q*T, WAY*T]
        nq = target_features.shape[0]
        dists = frame_dists.reshape(nq, t, way, t).transpose(0, 2, 1, 3)  # [Q, WAY, Tq, Ts]
        cum_dists = otam_distance(dists, single_direction=hc.single_direct)

        if not train and hc.combine:
            # text-visual fusion (few_shot.py:2924-2928); "8" is the
            # reference's hardcoded constant, not NUM_INPUT_FRAMES
            text_feats = text_eval[episode.real_support_labels]
            text_feats = class_mean(text_feats, episode.support_labels, way)
            image_features = raw_target_mean
            image_features = image_features / jnp.linalg.norm(image_features, axis=1, keepdims=True)
            text_feats = text_feats / jnp.linalg.norm(text_feats, axis=1, keepdims=True)
            logits_per_image = nn.softmax(scale * image_features @ text_feats.T, axis=1)
            soft_visual = nn.softmax((8.0 - cum_dists) / 8.0, axis=1)
            a = hc.text_coff if hc.text_coff is not None else 0.9
            fused = jnp.power(logits_per_image, a) * jnp.power(soft_visual, 1.0 - a)
            return {"logits": fused, "class_logits": None}

        return {"logits": -cum_dists, "class_logits": class_logits}
