"""Model builder: config -> (head module, variables, text banks).

Capability of reference models/base/builder.py:19-81 +
CNN_OTAM_CLIPFSAR.__init__ (few_shot.py:2695-2739): build the CLIP
backbone, precompute the train/test class text features once (no_grad),
assemble the head.  No DDP wrap — replication/sharding is a jit concern.
"""

from __future__ import annotations

import os
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from clip_fsar_tpu.models.clip.model import ARCHS, CLIP, CLIPArch, TextTransformer
from clip_fsar_tpu.models.clip.tokenizer import tokenize
from clip_fsar_tpu.models.heads.clipfsar import CLIPFSARConfig, CLIPFSARHead
from clip_fsar_tpu.models.heads.common import TransformerV1
from clip_fsar_tpu.utils.logging import get_logger
from clip_fsar_tpu.utils.registry import HEAD_REGISTRY

logger = get_logger(__name__)


class FewShotModel(NamedTuple):
    head: CLIPFSARHead
    variables: Dict[str, Any]
    text_train: jnp.ndarray
    text_test: jnp.ndarray


def _dtype_from_cfg(cfg):
    name = str(cfg.TPU.get("COMPUTE_DTYPE", "bfloat16")) if "TPU" in cfg else "float32"
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.float16}[name]


def _clip_checkpoint_path(cfg) -> Optional[str]:
    """An OpenAI-format CLIP checkpoint to initialize from, if available."""
    for key in ("CLIP_WEIGHTS",):
        p = cfg.TRAIN.get(key, "") if "TRAIN" in cfg else ""
        if p:
            return p
    # conventional local cache locations (downloads are pinned by the
    # reference _download, few_shot.py:245-274; this image has no egress)
    name = cfg.VIDEO.HEAD.BACKBONE_NAME.replace("/", "-")
    for root in (os.path.expanduser("~/.cache/clip"), "/root/.cache/clip", "./weights"):
        p = os.path.join(root, f"{name}.pt")
        if os.path.exists(p):
            return p
    return None


def load_or_init_clip(cfg, rng) -> tuple:
    """Returns (arch, clip_variables).  Loads OpenAI weights when present,
    otherwise random-initializes (tests / synthetic benchmarking)."""
    backbone_name = cfg.VIDEO.HEAD.BACKBONE_NAME
    ckpt = _clip_checkpoint_path(cfg)
    if ckpt:
        from clip_fsar_tpu.models.clip.convert import load_openai_checkpoint

        logger.info("Loading CLIP weights from %s", ckpt)
        arch, variables = load_openai_checkpoint(ckpt)
        return arch, variables
    if backbone_name not in ARCHS:
        raise KeyError(f"Unknown backbone {backbone_name!r}; known: {sorted(ARCHS)}")
    arch = ARCHS[backbone_name]
    logger.info("No CLIP checkpoint found for %s — random init", backbone_name)
    model = CLIP(arch=arch)
    imgs = jnp.zeros((1, arch.image_resolution, arch.image_resolution, 3), jnp.float32)
    toks = jnp.zeros((1, arch.context_length), jnp.int32).at[:, 1].set(2)
    variables = jax.jit(model.init)(rng, imgs, toks)
    return arch, jax.device_get(variables)


def encode_class_names(cfg, arch: CLIPArch, clip_variables, class_names, prompt: Optional[str] = None) -> jnp.ndarray:
    """Tokenize prompted class names and run the text tower once (fp32)."""
    template = prompt or "a photo of {}"
    texts = [template.format(class_names[i]) for i in range(len(class_names))]
    toks = jnp.asarray(tokenize(texts))
    text_module = TextTransformer(arch)
    text_vars = {"params": clip_variables["params"]["text"]}
    return jax.jit(text_module.apply)(text_vars, toks)


def build_few_shot_model(cfg, rng=None) -> FewShotModel:
    rng = rng if rng is not None else jax.random.PRNGKey(int(cfg.get("RANDOM_SEED", 0)))
    arch, clip_vars = load_or_init_clip(cfg, rng)

    prompt = cfg.TEST.get("PROMPT", None) if "TEST" in cfg else None
    text_train = encode_class_names(cfg, arch, clip_vars, list(cfg.TRAIN.CLASS_NAME), prompt)
    text_test = encode_class_names(cfg, arch, clip_vars, list(cfg.TEST.CLASS_NAME), prompt)

    head_name = cfg.VIDEO.HEAD.NAME
    head_cls = HEAD_REGISTRY.get(head_name)
    head: CLIPFSARHead = head_cls(
        arch=arch,
        head_cfg=CLIPFSARConfig.from_cfg(cfg),
        dtype=_dtype_from_cfg(cfg),
        remat=bool(cfg.TPU.get("REMAT", False)) if "TPU" in cfg else False,
        attention_backend="pallas" if ("TPU" in cfg and cfg.TPU.get("PALLAS_ATTENTION", False)) else "xla",
    )

    # assemble head variables without running the full vision tower:
    # backbone <- CLIP visual; context2/scale <- fresh init
    mid = arch.embed_dim
    t = int(cfg.DATA.NUM_INPUT_FRAMES)
    ctx = TransformerV1(dim=mid, heads=8, dim_head_k=mid // 8, dropout_atte=0.2, depth=head.head_cfg.transformer_depth)
    dummy = jnp.zeros((1, t + 1, mid), jnp.float32)
    ctx_params = ctx.init(rng, dummy, dummy, dummy)["params"]

    params = {
        "backbone": clip_vars["params"]["visual"],
        "context2": ctx_params,
        "scale": jnp.ones((1,), jnp.float32),
    }
    variables: Dict[str, Any] = {"params": params}
    if "batch_stats" in clip_vars:
        variables["batch_stats"] = {"backbone": clip_vars["batch_stats"]["visual"]}
    return FewShotModel(head=head, variables=variables, text_train=text_train, text_test=text_test)


# registry entry matching the reference head name
HEAD_REGISTRY.register(CLIPFSARHead, name="CNN_OTAM_CLIPFSAR")
