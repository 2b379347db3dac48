"""Checkpoint conversion: OpenAI CLIP / HF transformers CLIP -> flax params.

The reference loads OpenAI ``.pt`` state dicts and infers the architecture
from tensor shapes (models/base/few_shot.py:849-886); ``infer_arch`` does
the same inference here.  ``convert_openai_clip`` maps the torch key space
onto the flax module tree of clip_fsar_tpu.models.clip.model;
``convert_hf_clip`` does the same for HuggingFace ``CLIPModel`` weights
(useful both as a checkpoint source and as a parity-test oracle).

All outputs are numpy float32 pytrees: ``{"params": ..., "batch_stats": ...}``.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from clip_fsar_tpu.models.clip.model import ARCHS, CLIPArch


def _np(t: Any) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t.astype(np.float32)
    # torch tensor without importing torch at module scope
    return t.detach().cpu().numpy().astype(np.float32)


def _set(tree: Dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _linear(tree: Dict, path: str, weight, bias=None) -> None:
    _set(tree, f"{path}/kernel", _np(weight).T)
    if bias is not None:
        _set(tree, f"{path}/bias", _np(bias))


def _layernorm(tree: Dict, path: str, weight, bias) -> None:
    _set(tree, f"{path}/LayerNorm_0/scale", _np(weight))
    _set(tree, f"{path}/LayerNorm_0/bias", _np(bias))


def _conv(tree: Dict, path: str, weight) -> None:
    # torch OIHW -> flax HWIO
    _set(tree, f"{path}/kernel", _np(weight).transpose(2, 3, 1, 0))


def infer_arch(sd: Dict[str, Any]) -> CLIPArch:
    """Shape-based architecture inference for OpenAI-format state dicts."""
    is_vit = "visual.proj" in sd
    if is_vit:
        vision_width = sd["visual.conv1.weight"].shape[0]
        vision_layers = len([k for k in sd if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")])
        vision_patch_size = sd["visual.conv1.weight"].shape[-1]
        grid = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
        image_resolution = vision_patch_size * grid
    else:
        counts = []
        for stage in (1, 2, 3, 4):
            blocks = {k.split(".")[2] for k in sd if k.startswith(f"visual.layer{stage}")}
            counts.append(len(blocks))
        vision_layers = tuple(counts)
        vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
        vision_patch_size = None
        out_width = round((sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5)
        image_resolution = out_width * 32
    return CLIPArch(
        embed_dim=sd["text_projection"].shape[1],
        image_resolution=image_resolution,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch_size,
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        transformer_width=sd["ln_final.weight"].shape[0],
        transformer_heads=sd["ln_final.weight"].shape[0] // 64,
        transformer_layers=len({k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")}),
    )


def _convert_resblock(tree: Dict, prefix_t: str, prefix_j: str, sd: Dict[str, Any]) -> None:
    _layernorm(tree, f"{prefix_j}/ln_1", sd[f"{prefix_t}.ln_1.weight"], sd[f"{prefix_t}.ln_1.bias"])
    _layernorm(tree, f"{prefix_j}/ln_2", sd[f"{prefix_t}.ln_2.weight"], sd[f"{prefix_t}.ln_2.bias"])
    w = _np(sd[f"{prefix_t}.attn.in_proj_weight"])
    b = _np(sd[f"{prefix_t}.attn.in_proj_bias"])
    d = w.shape[1]
    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
        _linear(tree, f"{prefix_j}/attn/{name}", w[i * d : (i + 1) * d], b[i * d : (i + 1) * d])
    _linear(tree, f"{prefix_j}/attn/out_proj", sd[f"{prefix_t}.attn.out_proj.weight"], sd[f"{prefix_t}.attn.out_proj.bias"])
    _linear(tree, f"{prefix_j}/mlp_c_fc", sd[f"{prefix_t}.mlp.c_fc.weight"], sd[f"{prefix_t}.mlp.c_fc.bias"])
    _linear(tree, f"{prefix_j}/mlp_c_proj", sd[f"{prefix_t}.mlp.c_proj.weight"], sd[f"{prefix_t}.mlp.c_proj.bias"])


def _convert_bn(params: Dict, stats: Dict, prefix_t: str, prefix_j: str, sd: Dict[str, Any]) -> None:
    _set(params, f"{prefix_j}/BatchNorm_0/scale", _np(sd[f"{prefix_t}.weight"]))
    _set(params, f"{prefix_j}/BatchNorm_0/bias", _np(sd[f"{prefix_t}.bias"]))
    _set(stats, f"{prefix_j}/BatchNorm_0/mean", _np(sd[f"{prefix_t}.running_mean"]))
    _set(stats, f"{prefix_j}/BatchNorm_0/var", _np(sd[f"{prefix_t}.running_var"]))


def convert_openai_clip(sd: Dict[str, Any]) -> Tuple[CLIPArch, Dict[str, Any]]:
    arch = infer_arch(sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    if arch.is_vit:
        _conv(params, "visual/conv1", sd["visual.conv1.weight"])
        _set(params, "visual/class_embedding", _np(sd["visual.class_embedding"]))
        _set(params, "visual/positional_embedding", _np(sd["visual.positional_embedding"]))
        _layernorm(params, "visual/ln_pre", sd["visual.ln_pre.weight"], sd["visual.ln_pre.bias"])
        _layernorm(params, "visual/ln_post", sd["visual.ln_post.weight"], sd["visual.ln_post.bias"])
        _set(params, "visual/proj", _np(sd["visual.proj"]))
        for i in range(arch.vision_layers):
            _convert_resblock(params, f"visual.transformer.resblocks.{i}", f"visual/transformer/resblocks_{i}", sd)
    else:
        for j in (1, 2, 3):
            _conv(params, f"visual/conv{j}", sd[f"visual.conv{j}.weight"])
            _convert_bn(params, stats, f"visual.bn{j}", f"visual/bn{j}", sd)
        for stage, blocks in enumerate(arch.vision_layers, start=1):
            for i in range(blocks):
                pt = f"visual.layer{stage}.{i}"
                pj = f"visual/layer{stage}_{i}"
                for j in (1, 2, 3):
                    _conv(params, f"{pj}/conv{j}", sd[f"{pt}.conv{j}.weight"])
                    _convert_bn(params, stats, f"{pt}.bn{j}", f"{pj}/bn{j}", sd)
                if f"{pt}.downsample.0.weight" in sd:
                    _conv(params, f"{pj}/downsample_conv", sd[f"{pt}.downsample.0.weight"])
                    _convert_bn(params, stats, f"{pt}.downsample.1", f"{pj}/downsample_bn", sd)
        _set(params, "visual/attnpool/positional_embedding", _np(sd["visual.attnpool.positional_embedding"]))
        for name in ("q_proj", "k_proj", "v_proj", "c_proj"):
            _linear(params, f"visual/attnpool/{name}", sd[f"visual.attnpool.{name}.weight"], sd[f"visual.attnpool.{name}.bias"])

    # text tower
    _set(params, "text/token_embedding/embedding", _np(sd["token_embedding.weight"]))
    _set(params, "text/positional_embedding", _np(sd["positional_embedding"]))
    _layernorm(params, "text/ln_final", sd["ln_final.weight"], sd["ln_final.bias"])
    _set(params, "text/text_projection", _np(sd["text_projection"]))
    for i in range(arch.transformer_layers):
        _convert_resblock(params, f"transformer.resblocks.{i}", f"text/transformer/resblocks_{i}", sd)

    _set(params, "logit_scale", _np(sd["logit_scale"]))
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    return arch, variables


# ------------------------------------------------------------------------
# HuggingFace transformers CLIPModel
# ------------------------------------------------------------------------


def convert_hf_clip(sd: Dict[str, Any], config) -> Tuple[CLIPArch, Dict[str, Any]]:
    """Convert a transformers.CLIPModel state dict (quick_gelu activation).

    config: transformers.CLIPConfig (needed for shapes not inferable from
    flat keys).
    """
    v, t = config.vision_config, config.text_config
    arch = CLIPArch(
        embed_dim=config.projection_dim,
        image_resolution=v.image_size,
        vision_layers=v.num_hidden_layers,
        vision_width=v.hidden_size,
        vision_patch_size=v.patch_size,
        context_length=t.max_position_embeddings,
        vocab_size=t.vocab_size,
        transformer_width=t.hidden_size,
        transformer_heads=t.num_attention_heads,
        transformer_layers=t.num_hidden_layers,
        vision_heads_override=v.num_attention_heads,
    )
    params: Dict[str, Any] = {}

    def res(prefix_t: str, prefix_j: str) -> None:
        _layernorm(params, f"{prefix_j}/ln_1", sd[f"{prefix_t}.layer_norm1.weight"], sd[f"{prefix_t}.layer_norm1.bias"])
        _layernorm(params, f"{prefix_j}/ln_2", sd[f"{prefix_t}.layer_norm2.weight"], sd[f"{prefix_t}.layer_norm2.bias"])
        for name, hf in (("q_proj", "q_proj"), ("k_proj", "k_proj"), ("v_proj", "v_proj"), ("out_proj", "out_proj")):
            _linear(
                params,
                f"{prefix_j}/attn/{name}",
                sd[f"{prefix_t}.self_attn.{hf}.weight"],
                sd[f"{prefix_t}.self_attn.{hf}.bias"],
            )
        _linear(params, f"{prefix_j}/mlp_c_fc", sd[f"{prefix_t}.mlp.fc1.weight"], sd[f"{prefix_t}.mlp.fc1.bias"])
        _linear(params, f"{prefix_j}/mlp_c_proj", sd[f"{prefix_t}.mlp.fc2.weight"], sd[f"{prefix_t}.mlp.fc2.bias"])

    _conv(params, "visual/conv1", sd["vision_model.embeddings.patch_embedding.weight"])
    _set(params, "visual/class_embedding", _np(sd["vision_model.embeddings.class_embedding"]))
    _set(params, "visual/positional_embedding", _np(sd["vision_model.embeddings.position_embedding.weight"]))
    # HF's pre-LN attribute is spelled "pre_layrnorm"
    _layernorm(params, "visual/ln_pre", sd["vision_model.pre_layrnorm.weight"], sd["vision_model.pre_layrnorm.bias"])
    _layernorm(params, "visual/ln_post", sd["vision_model.post_layernorm.weight"], sd["vision_model.post_layernorm.bias"])
    _set(params, "visual/proj", _np(sd["visual_projection.weight"]).T)
    for i in range(arch.vision_layers):
        res(f"vision_model.encoder.layers.{i}", f"visual/transformer/resblocks_{i}")

    _set(params, "text/token_embedding/embedding", _np(sd["text_model.embeddings.token_embedding.weight"]))
    _set(params, "text/positional_embedding", _np(sd["text_model.embeddings.position_embedding.weight"]))
    _layernorm(params, "text/ln_final", sd["text_model.final_layer_norm.weight"], sd["text_model.final_layer_norm.bias"])
    _set(params, "text/text_projection", _np(sd["text_projection.weight"]).T)
    for i in range(arch.transformer_layers):
        res(f"text_model.encoder.layers.{i}", f"text/transformer/resblocks_{i}")

    _set(params, "logit_scale", _np(sd["logit_scale"]))
    return arch, {"params": params}


def load_openai_checkpoint(path: str) -> Tuple[CLIPArch, Dict[str, Any]]:
    """Load an OpenAI CLIP ``.pt`` file (state dict or JIT archive)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        sd = obj.state_dict()
    else:
        sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    sd = {k: v for k, v in sd.items() if k not in ("input_resolution", "context_length", "vocab_size")}
    return convert_openai_clip(sd)


def resize_vision_pos_embed(variables: Dict[str, Any], arch: CLIPArch) -> Dict[str, Any]:
    """Bilinearly resample the vision positional embedding to ``arch``'s
    (non-native) resolution.

    The CLS row is kept; the grid rows are reshaped to [g, g, width],
    resized with jax.image (bilinear, the standard ViT fine-tune recipe —
    the reference's analogous surgery for its video transformers is
    checkpoint_preprocess, utils/checkpoint.py:184-274), and flattened
    back.  Works for both tower families: ViT stores the table at
    visual/positional_embedding, ModifiedResNet under visual/attnpool."""
    import copy

    import jax
    import jax.numpy as jnp

    stride = arch.vision_patch_size if arch.vision_patch_size else 32
    g_new = arch.image_resolution // stride
    variables = copy.deepcopy(variables)
    vis = variables["params"]["visual"]
    holder, key = (vis, "positional_embedding") if "positional_embedding" in vis else (vis["attnpool"], "positional_embedding")
    pos = jnp.asarray(holder[key])
    g_old = round((pos.shape[0] - 1) ** 0.5)
    if g_old == g_new:
        return variables
    cls_row, grid = pos[:1], pos[1:].reshape(g_old, g_old, -1)
    grid = jax.image.resize(grid, (g_new, g_new, grid.shape[-1]), method="bilinear")
    holder[key] = jnp.concatenate([cls_row, grid.reshape(g_new * g_new, -1)], axis=0)
    return variables
