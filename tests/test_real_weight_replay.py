"""Real-weight replay harness (tools/real_weight_replay.py).

The harness itself is proven END-TO-END here on a synthetic OpenAI-format
.pt (embed_dim 512 so the reference head's hardcoded mid_dim fits,
few_shot.py:2699-2713): generate writes a golden from the PyTorch
reference, replay rebuilds in flax and matches it.  The real-weight test
activates the moment ViT-B-16.pt / RN50.pt are dropped into weights/ or
~/.cache/clip (zero-egress images skip)."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _vit512_state_dict(width=64, layers=2, patch=8, res=32, embed=512, tw=64, tl=2):
    g = torch.Generator().manual_seed(3)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.02

    sd = {
        "visual.class_embedding": r(width),
        "visual.positional_embedding": r((res // patch) ** 2 + 1, width),
        "visual.conv1.weight": r(width, 3, patch, patch),
        "visual.ln_pre.weight": torch.ones(width), "visual.ln_pre.bias": torch.zeros(width),
        "visual.ln_post.weight": torch.ones(width), "visual.ln_post.bias": torch.zeros(width),
        "visual.proj": r(width, embed),
        "positional_embedding": r(77, tw),
        "token_embedding.weight": r(49408, tw),
        "ln_final.weight": torch.ones(tw), "ln_final.bias": torch.zeros(tw),
        "text_projection": r(tw, embed),
        "logit_scale": torch.tensor(2.6592),
    }
    for prefix, w, n in (("visual.transformer", width, layers), ("transformer", tw, tl)):
        for i in range(n):
            b = f"{prefix}.resblocks.{i}"
            sd.update({
                f"{b}.attn.in_proj_weight": r(3 * w, w), f"{b}.attn.in_proj_bias": r(3 * w),
                f"{b}.attn.out_proj.weight": r(w, w), f"{b}.attn.out_proj.bias": r(w),
                f"{b}.ln_1.weight": torch.ones(w), f"{b}.ln_1.bias": torch.zeros(w),
                f"{b}.ln_2.weight": torch.ones(w), f"{b}.ln_2.bias": torch.zeros(w),
                f"{b}.mlp.c_fc.weight": r(4 * w, w), f"{b}.mlp.c_fc.bias": r(4 * w),
                f"{b}.mlp.c_proj.weight": r(w, 4 * w), f"{b}.mlp.c_proj.bias": r(w),
            })
    return sd


def test_generate_then_replay_on_synthetic_pt(tmp_path):
    import real_weight_replay as rwr

    path = tmp_path / "ViT-B-16.pt"
    torch.save(_vit512_state_dict(), str(path))
    golden = tmp_path / "golden.npz"

    rwr.generate(str(path), "ViT-B-16", str(golden))
    blob = dict(np.load(str(golden)))
    assert blob["text_features_train"].shape == (len(rwr.PROMPTS), 512)
    assert blob["episode0_logits"].shape == (rwr.WAY * rwr.QPC, rwr.WAY)

    failures = rwr.replay(str(path), "ViT-B-16", str(golden))
    assert failures == 0


def test_real_weights_replay_if_present():
    import real_weight_replay as rwr

    weights = rwr.find_weights("ViT-B-16")
    if weights is None:
        pytest.skip("no ViT-B-16.pt in weights/ or ~/.cache/clip (zero-egress image)")
    golden = os.path.join(REPO, "goldens", "real_ViT-B-16.npz")
    if not os.path.exists(golden):
        rwr.generate(weights, "ViT-B-16", golden)
    assert rwr.replay(weights, "ViT-B-16", golden) == 0
