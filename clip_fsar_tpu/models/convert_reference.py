"""Convert reference-framework checkpoints (.pyth torch.save dicts,
utils/checkpoint.py:122-129) into our flax variable trees.

The flagship mapping covers CNN_OTAM_CLIPFSAR (few_shot.py:2691-2993):
``{module.}head.backbone.*`` (the CLIP visual tower) maps through the
OpenAI-format converter, ``head.context2.*`` (Transformer_v1) and
``head.scale`` map onto our CLIPFSARHead tree.  A released/trained
reference checkpoint therefore evaluates in this framework via
``TEST.CHECKPOINT_FILE_PATH: /path/to/ckpt.pyth`` — the interop the
reference's CHECKPOINT_TYPE=pytorch option implies.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _np(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v.astype(np.float32)
    return v.detach().cpu().numpy().astype(np.float32)


def strip_prefixes(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Remove DDP ``module.`` and model-level ``head.`` prefixes."""
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v
    return out


def convert_clipfsar_state_dict(sd: Dict[str, Any]) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference CNN_OTAM_CLIPFSAR state dict -> (params, batch_stats)
    for our CLIPFSARHead.  Accepts raw head state dicts or full-model
    dicts with ``head.`` / ``module.head.`` prefixes."""
    from clip_fsar_tpu.models.clip.convert import convert_openai_clip

    sd = strip_prefixes(sd)
    if any(k.startswith("head.") for k in sd):
        sd = {k[len("head."):]: v for k, v in sd.items() if k.startswith("head.")}

    # CLIP visual tower: reuse the OpenAI converter by presenting the
    # backbone keys under the "visual." namespace it expects (plus the
    # text-side keys it requires for architecture inference)
    visual_sd = {f"visual.{k[len('backbone.'):]}": v for k, v in sd.items() if k.startswith("backbone.")}
    if not visual_sd:
        raise ValueError("no backbone.* keys — not a CNN_OTAM_CLIPFSAR checkpoint")
    is_vit = "visual.proj" in visual_sd
    embed_dim = (
        _np(visual_sd["visual.proj"]).shape[1]
        if is_vit
        else _np(visual_sd["visual.attnpool.c_proj.weight"]).shape[0]
    )
    # minimal text-side placeholders for infer_arch (text tower itself is
    # not stored in reference head checkpoints — text features are
    # precomputed constants there)
    visual_sd.setdefault("text_projection", np.zeros((embed_dim, embed_dim), np.float32))
    visual_sd.setdefault("positional_embedding", np.zeros((77, embed_dim), np.float32))
    visual_sd.setdefault("token_embedding.weight", np.zeros((49408, embed_dim), np.float32))
    visual_sd.setdefault("ln_final.weight", np.ones((embed_dim,), np.float32))
    visual_sd.setdefault("ln_final.bias", np.zeros((embed_dim,), np.float32))
    visual_sd.setdefault("logit_scale", np.zeros((), np.float32))
    arch, clip_vars = convert_openai_clip(visual_sd)

    params: Dict[str, Any] = {"backbone": clip_vars["params"]["visual"]}
    stats: Dict[str, Any] = {}
    if "batch_stats" in clip_vars and "visual" in clip_vars["batch_stats"]:
        stats["backbone"] = clip_vars["batch_stats"]["visual"]

    # Transformer_v1 context2 (few_shot.py:979-999)
    depth = len({k.split(".")[1] for k in sd if k.startswith("context2.layers.")})
    ctx: Dict[str, Any] = {}
    for i in range(depth):
        p = f"context2.layers.{i}"
        ctx[f"norm_{i}"] = {"scale": _np(sd[f"{p}.0.norm.weight"]), "bias": _np(sd[f"{p}.0.norm.bias"])}
        ctx[f"attn_{i}"] = {
            "to_q": {"kernel": _np(sd[f"{p}.0.fn.to_q.weight"]).T},
            "to_k": {"kernel": _np(sd[f"{p}.0.fn.to_k.weight"]).T},
            "to_v": {"kernel": _np(sd[f"{p}.0.fn.to_v.weight"]).T},
            "to_out": {"kernel": _np(sd[f"{p}.0.fn.to_out.0.weight"]).T, "bias": _np(sd[f"{p}.0.fn.to_out.0.bias"])},
        }
        ctx[f"ff_{i}"] = {
            "fc1": {"kernel": _np(sd[f"{p}.1.net.0.weight"]).T, "bias": _np(sd[f"{p}.1.net.0.bias"])},
            "fc2": {"kernel": _np(sd[f"{p}.1.net.3.weight"]).T, "bias": _np(sd[f"{p}.1.net.3.bias"])},
        }
    if ctx:
        params["context2"] = ctx
    if "scale" in sd:
        params["scale"] = _np(sd["scale"]).reshape(1)
    return params, stats


def load_reference_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference ``.pyth`` checkpoint file -> our variables dict."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("model_state", blob) if isinstance(blob, dict) else blob
    params, stats = convert_clipfsar_state_dict(sd)
    variables: Dict[str, Any] = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    return variables
