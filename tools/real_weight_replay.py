"""Real-weight contingency replay (VERDICT r1 item 10).

Zero-egress images cannot download the pinned OpenAI CLIP checkpoints
(reference models/base/few_shot.py:232-274), so top-1 parity against the
reference cannot be demonstrated until weights appear.  This tool makes
the demonstration a one-command replay the moment ``ViT-B-16.pt`` /
``RN50.pt`` are dropped into ``weights/`` or ``~/.cache/clip``:

  python tools/real_weight_replay.py generate --backbone ViT-B-16 \
      --out goldens/real_ViT-B-16.npz
      # runs the PyTorch REFERENCE (vendored CLIP + CNN_OTAM_CLIPFSAR,
      # torch.manual_seed(1) head) on the real weights and records its
      # text features, zero-shot logits and eval-mode episode logits.
      # Commit the npz (outputs only, ~100 KB — never the weights).

  python tools/real_weight_replay.py replay --backbone ViT-B-16 \
      --golden goldens/real_ViT-B-16.npz
      # rebuilds the SAME model in this framework (OpenAI .pt converter +
      # flax tower + transplanted head) and asserts every recorded output
      # matches to fp32 tolerance.  Exit code 0 = parity holds.

The episode pixel streams and the reference head init are fully
deterministic (fixed numpy / torch seeds), so generate-then-replay is
reproducible bit-for-bit on any machine holding the same weights.
Tested end-to-end on a synthetic tiny .pt in
tests/test_real_weight_replay.py (no weights needed).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))  # reference_oracle stubs

WEIGHT_ROOTS = (os.path.expanduser("~/.cache/clip"), "/root/.cache/clip", os.path.join(REPO, "weights"))

PROMPTS = ["brush hair", "cartwheel", "catch", "chew", "clap", "climb", "dive", "drink"]
WAY, SHOT, QPC, T = 5, 1, 1, 8
NUM_EPISODES = 3


def find_weights(backbone: str):
    for root in WEIGHT_ROOTS:
        p = os.path.join(root, f"{backbone}.pt")
        if os.path.exists(p):
            return p
    return None


def _episode_arrays(seed: int, res: int):
    """Deterministic synthetic episode pixels, identical for generate and
    replay (mirrors tests/test_reference_parity.py::_make_episode)."""
    rng = np.random.RandomState(seed)
    s, q = WAY * SHOT, WAY * QPC
    perm_s, perm_q = rng.permutation(s), rng.permutation(q)
    sl = np.repeat(np.arange(WAY), SHOT)[perm_s]
    ql = np.repeat(np.arange(WAY), QPC)[perm_q]
    classes = rng.choice(len(PROMPTS), WAY, replace=False)
    sup = rng.randn(s, T, res, res, 3).astype(np.float32)
    tgt = rng.randn(q, T, res, res, 3).astype(np.float32)
    return sup, tgt, sl, ql, classes


def _build_reference(weights_path: str, backbone: str):
    """Reference CNN_OTAM_CLIPFSAR on the real weights, seed-1 head init."""
    import torch

    from reference_oracle import import_reference_few_shot, make_reference_cfg, zero_dropout

    fs = import_reference_few_shot()
    name = {"ViT-B-16": "ViT-B/16", "ViT-B-32": "ViT-B/32", "RN50": "RN50"}.get(backbone, backbone)
    sd = torch.load(weights_path, map_location="cpu")
    if not isinstance(sd, dict):
        sd = sd.state_dict()
    ref_clip = fs.build_model(sd).float().eval()

    cfg = make_reference_cfg(name, PROMPTS, PROMPTS, T, way=WAY, shot=SHOT)
    orig_load = fs.load
    fs.load = lambda *a, **k: (ref_clip, None)
    try:
        torch.manual_seed(1)
        head = fs.CNN_OTAM_CLIPFSAR(cfg).float()
    finally:
        fs.load = orig_load
    zero_dropout(head)
    head.eval()
    return fs, ref_clip, head


def generate(weights_path: str, backbone: str, out: str) -> None:
    import torch

    fs, ref_clip, head = _build_reference(weights_path, backbone)
    res = ref_clip.visual.input_resolution
    golden = {
        "backbone": np.asarray(backbone),
        "resolution": np.asarray(res),
        "text_features_train": head.text_features_train.detach().numpy(),
        "text_features_test": head.text_features_test.detach().numpy(),
    }
    for e in range(NUM_EPISODES):
        sup, tgt, sl, ql, classes = _episode_arrays(100 + e, res)
        task = {
            "support_set": torch.from_numpy(sup.transpose(0, 1, 4, 2, 3).reshape(-1, 3, res, res)),
            "support_labels": torch.from_numpy(sl.astype(np.int64)),
            "real_support_labels": torch.from_numpy(classes[sl].astype(np.int64)),
            "target_set": torch.from_numpy(tgt.transpose(0, 1, 4, 2, 3).reshape(-1, 3, res, res)),
            "target_labels": torch.from_numpy(ql.astype(np.int64)),
        }
        with torch.no_grad():
            out_d = head(task)
        golden[f"episode{e}_logits"] = out_d["logits"].detach().numpy()
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    np.savez(out, **golden)
    print(f"golden written: {out} ({', '.join(sorted(golden))})")


def replay(weights_path: str, backbone: str, golden_path: str, rtol: float = 2e-3, atol: float = 2e-3) -> int:
    """Rebuild in this framework; compare against the committed golden.
    Tolerance is the fp32 tower budget measured by the transplant parity
    suite (tests/test_reference_parity.py)."""
    import jax.numpy as jnp

    from clip_fsar_tpu.data.types import Episode
    from clip_fsar_tpu.models.clip.convert import convert_openai_clip
    from clip_fsar_tpu.models.heads.clipfsar import CLIPFSARConfig, CLIPFSARHead

    golden = dict(np.load(golden_path, allow_pickle=False))
    res = int(golden["resolution"])

    # the head's modulation params come from the SAME seed-1 reference init
    # (transplant — the golden pins reference outputs, the replay must run
    # identical weights end to end)
    _, ref_clip, ref_head = _build_reference(weights_path, backbone)
    arch, variables = convert_openai_clip({k: v for k, v in ref_clip.state_dict().items()})

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_reference_parity import _transplant_context2

    params = dict(variables["params"].pop("visual").items())
    head_params = {"backbone": params, "scale": jnp.asarray(ref_head.scale.detach().numpy())}
    _transplant_context2(head_params, ref_head.context2)
    head_vars = {"params": head_params}
    if "batch_stats" in variables:
        head_vars["batch_stats"] = {"backbone": variables["batch_stats"]["visual"]}

    head = CLIPFSARHead(
        arch=arch,
        head_cfg=CLIPFSARConfig(way=WAY, num_frames=T),
        train_backbone_bn=not arch.is_vit,
    )
    text_train = jnp.asarray(golden["text_features_train"])
    text_test = jnp.asarray(golden["text_features_test"])

    failures = 0
    for e in range(NUM_EPISODES):
        sup, tgt, sl, ql, classes = _episode_arrays(100 + e, res)
        ep = Episode(
            support_images=jnp.asarray(sup),
            support_labels=jnp.asarray(sl.astype(np.int32)),
            real_support_labels=jnp.asarray(classes[sl].astype(np.int32)),
            target_images=jnp.asarray(tgt),
            target_labels=jnp.asarray(ql.astype(np.int32)),
            real_target_labels=jnp.asarray(classes[ql].astype(np.int32)),
            batch_class_list=jnp.asarray(classes.astype(np.int32)),
        )
        out = head.apply(head_vars, ep, text_train, text_test, train=False, deterministic=True)
        got = np.asarray(out["logits"], np.float32)
        want = golden[f"episode{e}_logits"]
        ok = np.allclose(got, want, rtol=rtol, atol=atol)
        top1_match = (got.argmax(-1) == want.argmax(-1)).all()
        print(f"episode {e}: logits {'MATCH' if ok else 'DIVERGE'} "
              f"(max abs diff {np.abs(got - want).max():.2e}), top-1 {'match' if top1_match else 'DIFFER'}")
        failures += int(not (ok and top1_match))
    print("REPLAY " + ("PASS" if failures == 0 else f"FAIL ({failures} episodes diverged)"))
    return failures


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("generate")
    g.add_argument("--backbone", default="ViT-B-16")
    g.add_argument("--weights", default=None, help="path to the .pt (default: search weights/, ~/.cache/clip)")
    g.add_argument("--out", default=None)
    r = sub.add_parser("replay")
    r.add_argument("--backbone", default="ViT-B-16")
    r.add_argument("--weights", default=None)
    r.add_argument("--golden", default=None)
    args = ap.parse_args()

    weights = args.weights or find_weights(args.backbone)
    if weights is None:
        print(f"no {args.backbone}.pt found in {WEIGHT_ROOTS} — drop the checkpoint in and re-run", file=sys.stderr)
        return 2
    if args.cmd == "generate":
        out = args.out or os.path.join(REPO, "goldens", f"real_{args.backbone}.npz")
        generate(weights, args.backbone, out)
        return 0
    golden = args.golden or os.path.join(REPO, "goldens", f"real_{args.backbone}.npz")
    if not os.path.exists(golden):
        print(f"golden {golden} missing — run `generate` first (and commit it)", file=sys.stderr)
        return 2
    return 1 if replay(weights, args.backbone, golden) else 0


if __name__ == "__main__":
    sys.exit(main())
