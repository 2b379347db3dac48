"""Pretrained-checkpoint surgery + config-pointed checkpoint loading.

Capability parity with reference utils/checkpoint.py:
  * ``inflate_2d_to_3d``   — I3D-style 2D->3D conv inflation (:146-182);
  * ``preprocess_checkpoint`` — ViT pos-embed repeat / super-resolution,
    tubelet central-frame/average init, head popping (:184-274);
  * ``load_checkpoint_file`` — load a config-pointed checkpoint path
    (orbax run dir / .npz weight file) non-strictly into a template;
  * ``load_test_variables``  — the test-time search order
    TEST.CHECKPOINT_FILE_PATH -> last OUTPUT_DIR checkpoint ->
    TRAIN.CHECKPOINT_FILE_PATH -> fresh weights (:452-529);
  * ``load_train_checkpoint_file`` — TRAIN.CHECKPOINT_FILE_PATH finetune
    init (params only, start step 0 when FINE_TUNE; :547-576).

TPU-native format notes: checkpoints are orbax pytrees or flat ``.npz``
files with "/"-joined keys (interchange format); conv kernels are flax
HWIO / DHWIO, so 2D->3D inflation inserts and repeats the leading depth
axis (the reference repeats dim 2 of torch OIDHW).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from clip_fsar_tpu.utils.logging import get_logger

logger = get_logger(__name__)


# ---------------------------------------------------------------------------
# tree utilities
# ---------------------------------------------------------------------------


def flatten_tree(tree, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def merge_non_strict(template, loaded, label: str = "checkpoint") -> Tuple[Any, int]:
    """Copy leaves from ``loaded`` into ``template`` wherever the path
    exists and the shape matches; log mismatches (reference
    load_checkpoint is non-strict, checkpoint.py:329-331)."""
    tflat = flatten_tree(template)
    lflat = flatten_tree(loaded)
    merged = dict(tflat)
    used = 0
    for k, v in lflat.items():
        if k not in tflat:
            logger.info("%s: ignoring unknown key %s", label, k)
            continue
        if tuple(v.shape) != tuple(np.asarray(tflat[k]).shape):
            logger.info("%s: shape mismatch for %s: %s vs %s", label, k, v.shape, np.asarray(tflat[k]).shape)
            continue
        merged[k] = v.astype(np.asarray(tflat[k]).dtype)
        used += 1
    missing = set(tflat) - set(lflat)
    if missing:
        logger.info("%s: %d params kept from init (not in checkpoint)", label, len(missing))
    return unflatten_tree(merged), used


# ---------------------------------------------------------------------------
# 2D -> 3D inflation (reference inflate_weight, checkpoint.py:146-182)
# ---------------------------------------------------------------------------


def inflate_2d_to_3d(src_params, template_params) -> Any:
    """Inflate 2D conv kernels [H, W, I, O] to 3D [D, H, W, I, O] by
    repeating along depth and dividing by D (I3D bootstrapping)."""
    sflat = flatten_tree(src_params)
    tflat = flatten_tree(template_params)
    out = dict(tflat)
    for k, v in sflat.items():
        if k not in tflat:
            continue
        t = np.asarray(tflat[k])
        if v.ndim == 4 and t.ndim == 5 and v.shape == t.shape[1:]:
            d = t.shape[0]
            logger.info("inflate %s: %s -> %s", k, v.shape, t.shape)
            out[k] = np.repeat(v[None], d, axis=0) / float(d)
        elif v.shape == t.shape:
            out[k] = v.astype(t.dtype)
        else:
            logger.info("inflate: unexpected %s: %s -|> %s", k, v.shape, t.shape)
    return unflatten_tree(out)


# ---------------------------------------------------------------------------
# ViT checkpoint preprocessing (reference checkpoint_preprocess, :184-274)
# ---------------------------------------------------------------------------


def preprocess_checkpoint(cfg, params) -> Any:
    """Pos-embed repeat / super-resolution + tubelet init + head popping.

    Operates on a classification-model params tree (``backbone/pos_embd``
    [1, N+1, C], ``backbone/temp_embd``, ``backbone/stem/conv1/kernel``
    [D, H, W, I, O])."""
    pp = cfg.TRAIN.get("CHECKPOINT_PRE_PROCESS", {})
    get = pp.get if hasattr(pp, "get") else (lambda *_: None)
    flat = flatten_tree(params)

    if bool(cfg.TRAIN.get("FINE_TUNE", False)) and bool(get("POP_HEAD", False)):
        popped = [k for k in flat if "head" in k.lower()]
        for k in popped:
            flat.pop(k)
        logger.info("checkpoint_preprocess: popped %d head params", len(popped))

    pos_mode = get("POS_EMBED", None)
    key = "backbone/pos_embd"
    if pos_mode == "repeat" and key in flat:
        # repeat spatial positions once per (tubelet) frame — TimeSformer-
        # style joint space-time position table (reference :205-216)
        pe = flat[key]  # [1, N, C]
        _, n, c = pe.shape
        f = int(cfg.DATA.NUM_INPUT_FRAMES)
        ts = int(cfg.VIDEO.BACKBONE.get("TUBELET_SIZE", 0) or 0)
        if ts:
            f //= ts
        cls_pe, input_pe = pe[:, :1], pe[0, 1:]
        input_pe = np.tile(input_pe[None, None], (1, f, 1, 1)).reshape(1, f * (n - 1), c)
        flat[key] = np.concatenate([cls_pe, input_pe], axis=1)
        logger.info("checkpoint_preprocess: repeated pos_embd %d -> %d tokens", n, flat[key].shape[1])
    elif pos_mode == "super-resolution" and key in flat:
        pe = flat[key]
        _, n, c = pe.shape
        cls_pe, grid_pe = pe[:, :1], pe[0, 1:]
        side = int(cfg.DATA.TRAIN_CROP_SIZE) // int(cfg.VIDEO.BACKBONE.PATCH_SIZE)
        side_ckp = int(round((n - 1) ** 0.5))
        if side != side_ckp:
            grid = grid_pe.reshape(side_ckp, side_ckp, c)
            grid = np.asarray(jax.image.resize(jnp.asarray(grid), (side, side, c), method="bilinear"))
            flat[key] = np.concatenate([cls_pe, grid.reshape(1, side * side, c)], axis=1)
            logger.info("checkpoint_preprocess: pos_embd %dx%d -> %dx%d", side_ckp, side_ckp, side, side)
        tkey = "backbone/temp_embd"
        if tkey in flat:
            te = flat[tkey]
            cls_te, temp = te[:, :1], te[:, 1:]
            ts = int(cfg.VIDEO.BACKBONE.get("TUBELET_SIZE", 1) or 1)
            n_t = int(cfg.DATA.NUM_INPUT_FRAMES) // ts
            if temp.shape[1] != n_t:
                temp = np.asarray(jax.image.resize(jnp.asarray(temp), (1, n_t, te.shape[2]), method="linear"))
                flat[tkey] = np.concatenate([cls_te, temp], axis=1)
                logger.info("checkpoint_preprocess: temp_embd -> %d tokens", n_t)
    elif pos_mode in ("repeat", "super-resolution"):
        # valid mode, but the checkpoint has no backbone/pos_embd to act
        # on — surface the real problem instead of "unknown mode"
        raise KeyError(
            f"POS_EMBED={pos_mode!r} requested but the checkpoint has no {key!r} entry "
            f"(keys look like: {sorted(flat)[:5]}...)"
        )
    elif pos_mode not in (None, "", False):
        raise NotImplementedError(f"Unknown POS_EMBED preprocess {pos_mode!r}")

    patch_mode = get("PATCH_EMBD", None)
    ckey = "backbone/stem/conv1/kernel"
    if patch_mode in ("central_frame", "average") and ckey in flat:
        w = flat[ckey]  # [D, H, W, I, O] (or [1, p, p, I, O] from a 2D source)
        ts = int(cfg.VIDEO.BACKBONE.get("TUBELET_SIZE", 1) or 1)
        if patch_mode == "central_frame":
            new = np.zeros((ts,) + w.shape[1:], w.dtype)
            new[ts // 2] = w.reshape(w.shape[-4:]) if w.ndim == 5 else w
            flat[ckey] = new
        else:
            new = np.repeat(w.reshape((1,) + w.shape[-4:]) if w.ndim == 5 else w[None], ts, axis=0)
            flat[ckey] = new / float(ts)
        logger.info("checkpoint_preprocess: %s tubelet init (size %d)", patch_mode, ts)
    elif patch_mode in ("central_frame", "average"):
        raise KeyError(
            f"PATCH_EMBD={patch_mode!r} requested but the checkpoint has no {ckey!r} entry"
        )
    elif patch_mode not in (None, "", False):
        raise NotImplementedError(f"Unknown PATCH_EMBD preprocess {patch_mode!r}")

    return unflatten_tree(flat)


# ---------------------------------------------------------------------------
# config-pointed checkpoint loading + search orders
# ---------------------------------------------------------------------------


def _load_raw(path: str) -> Optional[Dict[str, Any]]:
    """Load a checkpoint file into a raw variables dict:
       * ``.npz``: flat "/"-keyed weight archive -> {"params": tree}
         (or the full variables dict when keys carry a collection prefix);
       * orbax dir (a run OUTPUT_DIR, its checkpoints/ dir, or a single
         step dir): raw pytree restore."""
    from clip_fsar_tpu.utils.storage import fetch, is_remote

    if is_remote(path):
        # remote checkpoint (reference bucket.py download path): fetch to
        # the local cache first
        path = fetch(path)
    if path.endswith((".pyth", ".pth", ".pt")) and os.path.isfile(path):
        # reference-framework torch checkpoint (utils/checkpoint.py format)
        from clip_fsar_tpu.models.convert_reference import load_reference_checkpoint

        return load_reference_checkpoint(path)
    if path.endswith(".npz") and os.path.isfile(path):
        flat = dict(np.load(path))
        tree = unflatten_tree(flat)
        if "params" in tree or "batch_stats" in tree:
            return tree
        return {"params": tree}
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        cand = path
        if os.path.isdir(os.path.join(path, "checkpoints")):
            cand = os.path.join(path, "checkpoints")
        steps = [d for d in os.listdir(cand) if d.isdigit()]
        if steps:
            cand = os.path.join(cand, str(max(int(s) for s in steps)))
        # Checkpointer.save writes the pytree as the 'default' item under
        # the step dir — StandardCheckpointer must be pointed at it, not
        # at the step dir itself (no _METADATA there)
        if os.path.isdir(os.path.join(cand, "default")):
            cand = os.path.join(cand, "default")
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(os.path.abspath(cand))
        return restored
    logger.info("checkpoint path %s not found or unsupported", path)
    return None


def _as_variables(raw: Dict[str, Any]) -> Dict[str, Any]:
    """Accept either a saved TrainState pytree or a bare variables dict."""
    if "params" in raw:
        v = {"params": raw["params"]}
        if raw.get("batch_stats") is not None:
            v["batch_stats"] = raw["batch_stats"]
        return v
    return {"params": raw}


def load_checkpoint_file(cfg, path: str, template_variables, pre_process: bool = False, inflation: bool = False):
    """Non-strict load of ``path`` into ``template_variables`` with
    optional preprocessing/inflation.  Returns (variables, loaded: bool)."""
    raw = _load_raw(path)
    if raw is None:
        return template_variables, False
    loaded = _as_variables(raw)
    params = loaded.get("params", {})
    if pre_process:
        params = preprocess_checkpoint(cfg, params)
    if inflation:
        params = inflate_2d_to_3d(params, template_variables["params"])
    out = dict(template_variables)
    out["params"], used = merge_non_strict(template_variables["params"], params, label=path)
    if "batch_stats" in loaded and "batch_stats" in template_variables:
        out["batch_stats"], _ = merge_non_strict(template_variables["batch_stats"], loaded["batch_stats"], label=path)
    logger.info("loaded %d params from %s", used, path)
    return out, used > 0


def load_test_variables(cfg, checkpointer, template_state, template_variables):
    """Reference test-time search order (checkpoint.py:452-529):
    TEST.CHECKPOINT_FILE_PATH -> last OUTPUT_DIR checkpoint ->
    TRAIN.CHECKPOINT_FILE_PATH -> fresh weights."""
    test_path = str(cfg.TEST.get("CHECKPOINT_FILE_PATH", "") or "") if "TEST" in cfg else ""
    train_path = str(cfg.TRAIN.get("CHECKPOINT_FILE_PATH", "") or "") if "TRAIN" in cfg else ""
    if test_path:
        variables, ok = load_checkpoint_file(cfg, test_path, template_variables)
        if ok:
            logger.info("testing with TEST.CHECKPOINT_FILE_PATH: %s", test_path)
            return variables
    if checkpointer is not None and checkpointer.latest_step() is not None:
        restored = checkpointer.restore(template_state)
        if restored is not None:
            logger.info("testing with the last OUTPUT_DIR checkpoint (step %d)", int(restored.step))
            return restored.model_variables
    if train_path:
        variables, ok = load_checkpoint_file(cfg, train_path, template_variables)
        if ok:
            logger.info("testing with TRAIN.CHECKPOINT_FILE_PATH: %s", train_path)
            return variables
    logger.info("no checkpoint found — testing with freshly built weights")
    return template_variables


def load_train_checkpoint_file(cfg, template_variables):
    """TRAIN.CHECKPOINT_FILE_PATH finetune/continue init (reference
    load_train_checkpoint:547-576, used when auto-resume found nothing).
    Returns (variables, loaded: bool)."""
    path = str(cfg.TRAIN.get("CHECKPOINT_FILE_PATH", "") or "")
    if not path:
        return template_variables, False
    pp = cfg.TRAIN.get("CHECKPOINT_PRE_PROCESS", {})
    enable_pp = bool(pp.get("ENABLE", False)) if hasattr(pp, "get") else False
    inflate = bool(cfg.TRAIN.get("CHECKPOINT_INFLATE", False))
    return load_checkpoint_file(cfg, path, template_variables, pre_process=enable_pp, inflation=inflate)


def save_weights_npz(path: str, variables) -> None:
    """Write a variables dict as a flat .npz interchange archive."""
    flat = {}
    for coll, tree in variables.items():
        if tree is None:
            continue
        for k, v in flatten_tree(tree).items():
            flat[f"{coll}/{k}"] = v
    np.savez(path, **flat)
