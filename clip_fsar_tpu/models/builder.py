"""Model builder: config -> (head module, variables, text banks).

Capability of reference models/base/builder.py:19-81 +
CNN_OTAM_CLIPFSAR.__init__ (few_shot.py:2695-2739): build the CLIP
backbone, precompute the train/test class text features once (no_grad),
assemble the head.  No DDP wrap — replication/sharding is a jit concern.
"""

from __future__ import annotations

import os
from contextlib import nullcontext as _nullcontext
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


def _init_device(cfg):
    """Device for ONE-TIME build work (param init, class text features).

    Defaults to the host CPU: on a tunneled/remote accelerator the init
    compile + full-tree fetch runs minutes (measured 7m45s RN50 build via
    the dev tunnel vs 2m38s on this host's CPU), and the values are
    equivalent — threefry RNG is backend-invariant, and the text features
    are fp32 constants the reference also computes once at __init__
    (few_shot.py:2714-2728).  ``TPU.INIT_BACKEND device`` restores
    on-accelerator init; the knob is a no-op when CPU is already the
    default backend."""
    mode = str(cfg.TPU.get("INIT_BACKEND", "cpu")) if "TPU" in cfg else "cpu"
    if mode == "device":
        return None
    try:
        # local_devices, not devices: in a multi-process run the first
        # GLOBAL cpu device is non-addressable on every rank but 0, and
        # committing the init jit to it makes the computation span all
        # processes (device_get then fails with "spans non-addressable
        # devices" — observed in test_multihost round 5)
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return None


def _dtype_from_cfg(cfg):
    name = str(cfg.TPU.get("COMPUTE_DTYPE", "bfloat16")) if "TPU" in cfg else "float32"
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.float16}[name]


def _attention_backend_from_cfg(cfg) -> str:
    """Attention core selector (ops/attention.mha): "pallas" for the fused
    kernel, else XLA; TPU.SOFTMAX_DTYPE=bfloat16 keeps attention logits in
    the compute dtype ("xla:bf16" — measured +6% ViT-B/16 train throughput,
    PERFORMANCE.md) instead of the fp32-parity default."""
    if "TPU" not in cfg:
        return "xla"
    if cfg.TPU.get("PALLAS_ATTENTION", False):
        return "pallas"
    layout = str(cfg.TPU.get("ATTENTION_LAYOUT", "auto"))
    if layout == "auto":
        layout = "fused" if jax.default_backend() != "cpu" else "split"
    if layout == "fused":
        # whole-sequence Pallas kernel on the unsplit layout (non-causal
        # self-attention; the causal text tower falls back to XLA inside
        # MultiheadAttention)
        return "fused"
    backend = "xla"
    if str(cfg.TPU.get("SOFTMAX_DTYPE", "float32")) == "bfloat16":
        backend = "xla:bf16"
    if layout == "unsplit":
        backend += ":unsplit"
    return backend


def _resolve_tower_execution(cfg, arch) -> tuple:
    """(remat, scan_layers) for the vision tower.  "auto" (the base.yaml
    default) turns both on for deep towers (>= 24 layers, i.e. ViT-L and
    up) where measured v5e behavior requires them: unrolled ViT-L blows
    the remote-compile budget and scan-without-remat saves one attention-
    logit plane per layer and OOMs (PERFORMANCE.md).  Explicit true/false
    is always honored."""

    def resolve(value, deep_default):
        if isinstance(value, str) and value.lower() == "auto":
            return deep_default
        return bool(value)

    layers = getattr(arch, "vision_layers", 0) if arch is not None else 0
    deep = isinstance(layers, int) and layers >= 24  # tuple -> ModifiedResNet (shallow activations)
    if "TPU" not in cfg:
        return False, False
    return (
        resolve(cfg.TPU.get("REMAT", False), deep),
        resolve(cfg.TPU.get("SCAN_LAYERS", False), deep),
    )


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


def _adapt_vision_resolution(cfg, arch, flow: str = "auto"):
    """The tower's spatial resolution follows the configured crop size.

    The reference CLIP towers are fixed at their native resolution (224 /
    336); this framework additionally builds them at any crop that tiles
    the patch (ViT) / stride-32 stem (RN) so small-resolution runs (CPU
    dryruns, ablations) use the REAL architecture.  All shipped CLIP-FSAR
    configs crop at the native resolution, where this is a no-op.

    ``flow`` selects which crop the tower must consume: "train" /
    "test" (passed by the runners, each of which builds its own model),
    or "auto" = train when TRAIN.ENABLE else test."""
    import dataclasses

    if "DATA" not in cfg:
        return arch
    train_crop = int(cfg.DATA.get("TRAIN_CROP_SIZE", 0) or 0)
    test_crop = int(cfg.DATA.get("TEST_CROP_SIZE", 0) or 0)
    if flow == "auto":
        train_enabled = bool(cfg.TRAIN.get("ENABLE", False)) if "TRAIN" in cfg else False
        flow = "train" if train_enabled else "test"
    crop = (train_crop or test_crop) if flow == "train" else (test_crop or train_crop)
    if not crop or crop == arch.image_resolution:
        return arch
    tile = arch.vision_patch_size if arch.vision_patch_size else 32
    if crop % tile:
        logger.warning("crop %d does not tile the %d-px vision stem; keeping native %d", crop, tile, arch.image_resolution)
        return arch
    logger.info("CLIP vision tower at %dpx (native %dpx)", crop, arch.image_resolution)
    return dataclasses.replace(arch, image_resolution=crop)


def _adapt_vision_depth(cfg, arch):
    """TPU.VISION_DEPTH / TPU.TEXT_DEPTH > 0 truncate a random-init CLIP
    tower to that many REAL blocks (width/heads unchanged, per-layer
    numerics identical).  The multi-chip CPU dryrun uses these to bound
    1-core compile time (VERDICT r2 item 1): flax init unrolls every layer
    even in scan mode, so init compile scales with depth."""
    import dataclasses

    if "TPU" not in cfg:
        return arch
    vdepth = int(cfg.TPU.get("VISION_DEPTH", 0) or 0)
    if vdepth and arch.is_vit and vdepth != arch.vision_layers:
        logger.info("CLIP vision tower truncated to %d/%d blocks (TPU.VISION_DEPTH)", vdepth, arch.vision_layers)
        arch = dataclasses.replace(arch, vision_layers=vdepth)
    tdepth = int(cfg.TPU.get("TEXT_DEPTH", 0) or 0)
    if tdepth and tdepth != arch.transformer_layers:
        logger.info("CLIP text tower truncated to %d/%d blocks (TPU.TEXT_DEPTH)", tdepth, arch.transformer_layers)
        arch = dataclasses.replace(arch, transformer_layers=tdepth)
    return arch


def load_or_init_clip(cfg, rng, flow: str = "auto") -> tuple:
    """Returns (arch, clip_variables).  Loads OpenAI weights when present,
    otherwise random-initializes (tests / synthetic benchmarking)."""
    backbone_name = cfg.VIDEO.HEAD.BACKBONE_NAME
    ckpt = _clip_checkpoint_path(cfg)
    if ckpt:
        from clip_fsar_tpu.models.clip.convert import load_openai_checkpoint, resize_vision_pos_embed

        logger.info("Loading CLIP weights from %s", ckpt)
        arch, variables = load_openai_checkpoint(ckpt)
        resized = _adapt_vision_resolution(cfg, arch, flow)
        if resized.image_resolution != arch.image_resolution:
            variables = resize_vision_pos_embed(variables, resized)
        return resized, variables
    if backbone_name not in ARCHS:
        raise KeyError(f"Unknown backbone {backbone_name!r}; known: {sorted(ARCHS)}")
    arch = _adapt_vision_depth(cfg, _adapt_vision_resolution(cfg, ARCHS[backbone_name], flow))
    logger.info("No CLIP checkpoint found for %s — random init", backbone_name)
    model = CLIP(arch=arch)
    dev = _init_device(cfg)
    with jax.default_device(dev) if dev is not None else _nullcontext():
        imgs = jnp.zeros((1, arch.image_resolution, arch.image_resolution, 3), jnp.float32)
        toks = jnp.zeros((1, arch.context_length), jnp.int32).at[:, 1].set(2)
        variables = jax.jit(model.init)(rng, imgs, toks)
    return arch, jax.device_get(variables)


def encode_class_names(cfg, arch: CLIPArch, clip_variables, class_names, prompt: Optional[str] = None) -> jnp.ndarray:
    """Tokenize prompted class names and run the text tower once (fp32)."""
    template = prompt or "a photo of {}"
    texts = [template.format(class_names[i]) for i in range(len(class_names))]
    text_module = TextTransformer(arch)
    text_vars = {"params": clip_variables["params"]["text"]}
    dev = _init_device(cfg)
    with jax.default_device(dev) if dev is not None else _nullcontext():
        toks = jnp.asarray(tokenize(texts))
        return jax.jit(text_module.apply)(text_vars, toks)


def build_few_shot_model(cfg, rng=None, flow: str = "auto") -> FewShotModel:
    rng = rng if rng is not None else jax.random.PRNGKey(int(cfg.get("RANDOM_SEED", 0)))

    needs_clip = cfg.VIDEO.HEAD.NAME == "CNN_OTAM_CLIPFSAR" or cfg.VIDEO.HEAD.BACKBONE_NAME in ARCHS
    if needs_clip:
        arch, clip_vars = load_or_init_clip(cfg, rng, flow)
        prompt = cfg.TEST.get("PROMPT", None) if "TEST" in cfg else None
        names_train = list(cfg.TRAIN.get("CLASS_NAME", []) or [])
        names_test = list(cfg.TEST.get("CLASS_NAME", []) or [])
        dim = arch.embed_dim
        text_train = (
            encode_class_names(cfg, arch, clip_vars, names_train, prompt) if names_train else jnp.zeros((1, dim))
        )
        text_test = encode_class_names(cfg, arch, clip_vars, names_test, prompt) if names_test else jnp.zeros((1, dim))
    else:
        arch, clip_vars = None, None
        text_train = text_test = jnp.zeros((1, 1), jnp.float32)

    head_name = cfg.VIDEO.HEAD.NAME
    head_factory = HEAD_REGISTRY.get(head_name)
    remat, scan_layers = _resolve_tower_execution(cfg, arch)
    head = head_factory(
        cfg,
        arch=arch,
        dtype=_dtype_from_cfg(cfg),
        remat=remat,
        remat_policy=str(cfg.TPU.get("REMAT_POLICY", "nothing")) if "TPU" in cfg else "nothing",
        attention_backend=_attention_backend_from_cfg(cfg),
        scan_layers=scan_layers,
        frame_chunks=int(cfg.TPU.get("FRAME_CHUNKS", 1)) if "TPU" in cfg else 1,
    )

    if not isinstance(head, CLIPFSARHead):
        # classic CNN_FSHead-style heads: init with a dummy episode and
        # splice in pretrained backbone weights when available
        return _assemble_classic_head(cfg, head, rng, text_train, text_test, clip_vars)

    # assemble head variables without running the full vision tower:
    # backbone <- CLIP visual; context2/scale <- fresh init
    mid = arch.embed_dim
    t = int(cfg.DATA.NUM_INPUT_FRAMES)
    ctx = TransformerV1(dim=mid, heads=8, dim_head_k=mid // 8, dropout_atte=0.2, depth=head.head_cfg.transformer_depth)
    dev = _init_device(cfg)
    with jax.default_device(dev) if dev is not None else _nullcontext():
        dummy = jnp.zeros((1, t + 1, mid), jnp.float32)
        ctx_params = jax.device_get(ctx.init(rng, dummy, dummy, dummy))["params"]

    params = {
        "backbone": clip_vars["params"]["visual"],
        "context2": ctx_params,
        "scale": jnp.ones((1,), jnp.float32),
    }
    variables: Dict[str, Any] = {"params": params}
    if "batch_stats" in clip_vars:
        variables["batch_stats"] = {"backbone": clip_vars["batch_stats"]["visual"]}
    return FewShotModel(head=head, variables=variables, text_train=text_train, text_test=text_test)


def _assemble_classic_head(cfg, head, rng, text_train, text_test, clip_vars=None) -> FewShotModel:
    import numpy as np

    from clip_fsar_tpu.data.types import Episode

    t = int(cfg.DATA.NUM_INPUT_FRAMES)
    res = int(cfg.DATA.TRAIN_CROP_SIZE)
    way = int(cfg.TRAIN.WAY)
    dev = _init_device(cfg)
    with jax.default_device(dev) if dev is not None else _nullcontext():
        dummy = Episode(
            support_images=jnp.zeros((way, t, res, res, 3), jnp.float32),
            support_labels=jnp.arange(way, dtype=jnp.int32),
            real_support_labels=jnp.arange(way, dtype=jnp.int32),
            target_images=jnp.zeros((way, t, res, res, 3), jnp.float32),
            target_labels=jnp.arange(way, dtype=jnp.int32),
            real_target_labels=jnp.arange(way, dtype=jnp.int32),
            batch_class_list=jnp.arange(way, dtype=jnp.int32),
        )
        variables = jax.jit(lambda r, ep: head.init(r, ep, train=False))(rng, dummy)
    variables = jax.device_get(variables)
    variables = dict(variables)

    if clip_vars is not None:
        # CLIP-tower backbone under a classic head: splice the CLIP visual
        variables["params"] = dict(variables["params"])
        variables["params"]["backbone"] = clip_vars["params"]["visual"]
        if "batch_stats" in clip_vars:
            bs = dict(variables.get("batch_stats", {}))
            bs["backbone"] = clip_vars["batch_stats"]["visual"]
            variables["batch_stats"] = bs

    # torchvision ImageNet weights for the resnet backbones, if cached
    name = cfg.VIDEO.HEAD.BACKBONE_NAME
    path = cfg.TRAIN.get("BACKBONE_WEIGHTS", "") or ""
    if not path:
        for root in (os.path.expanduser("~/.cache/torch/hub/checkpoints"), "./weights"):
            import glob

            hits = sorted(glob.glob(os.path.join(root, f"{name}*.pth")))
            if hits:
                path = hits[0]
                break
    if path and os.path.exists(path):
        import torch

        from clip_fsar_tpu.models.resnet import convert_torchvision_resnet

        sd = torch.load(path, map_location="cpu", weights_only=False)
        conv = convert_torchvision_resnet(sd, depth=name)
        variables["params"] = dict(variables["params"])
        variables["params"]["backbone"] = conv["params"]
        bs = dict(variables.get("batch_stats", {}))
        bs["backbone"] = conv["batch_stats"]
        variables["batch_stats"] = bs
        logger.info("Loaded torchvision %s weights from %s", name, path)
    return FewShotModel(head=head, variables=variables, text_train=text_train, text_test=text_test)


# registry entry matching the reference head name: a factory so every head
# shares the (cfg, **build options) calling convention
@HEAD_REGISTRY.register(name="CNN_OTAM_CLIPFSAR")
def _build_clipfsar_head(cfg, arch=None, dtype=jnp.float32, remat=False, remat_policy="nothing", attention_backend="xla", scan_layers=False, frame_chunks=1, **kw):
    if arch is None:
        arch = ARCHS[cfg.VIDEO.HEAD.BACKBONE_NAME]
    # reference trains the whole model (model.train()), so RN BatchNorm runs
    # on batch statistics unless BN.FREEZE (base.yaml default: false)
    bn_freeze = bool(cfg.BN.get("FREEZE", False)) if "BN" in cfg else False
    return CLIPFSARHead(
        arch=arch,
        head_cfg=CLIPFSARConfig.from_cfg(cfg),
        dtype=dtype,
        train_backbone_bn=not bn_freeze,
        remat=remat,
        remat_policy=remat_policy,
        attention_backend=attention_backend,
        scan_layers=scan_layers,
        frame_chunks=frame_chunks,
    )


# register the classic heads (import side effect)
from clip_fsar_tpu.models.heads import fsheads as _fsheads  # noqa: E402,F401
from clip_fsar_tpu.models.heads import molo as _molo  # noqa: E402,F401
