"""Real CLIP checkpoint validation (VERDICT item: run the OpenAI-format
converter against actual ViT-B/16 / RN50 weights and check zero-shot
sanity).  Skips cleanly when no checkpoint is present in the image —
drop ``ViT-B-16.pt`` / ``RN50.pt`` into ``weights/`` or ``~/.cache/clip``
to activate (see clip_fsar_tpu/models/builder.py:_clip_checkpoint_path).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

WEIGHT_ROOTS = (os.path.expanduser("~/.cache/clip"), "/root/.cache/clip", "./weights")


def _find(name: str):
    for root in WEIGHT_ROOTS:
        p = os.path.join(root, f"{name}.pt")
        if os.path.exists(p):
            return p
    return None


def _zero_shot_check(path):
    from clip_fsar_tpu.models.clip.convert import load_openai_checkpoint
    from clip_fsar_tpu.models.clip.model import CLIP
    from clip_fsar_tpu.models.clip.tokenizer import tokenize

    arch, variables = load_openai_checkpoint(path)
    clip = CLIP(arch=arch)

    # structured fixture "images": solid color fields after CLIP norm are a
    # weak signal, so use class-text self-agreement instead: text features
    # of distinct prompts must be distinct and L2-normalizable, and image
    # encoding of a synthetic batch must be finite with the right dim
    prompts = ["a photo of a dog", "a photo of a cat", "a photo of a car"]
    toks = jnp.asarray(tokenize(prompts))
    txt = np.asarray(clip.apply(variables, toks, method=CLIP.encode_text))
    assert txt.shape == (3, arch.embed_dim)
    assert np.isfinite(txt).all()
    tn = txt / np.linalg.norm(txt, axis=1, keepdims=True)
    sims = tn @ tn.T
    # off-diagonal similarity of distinct concepts is well below 1
    off = sims[~np.eye(3, dtype=bool)]
    assert off.max() < 0.95
    # dog vs cat (both animals) should be closer than dog vs car
    assert sims[0, 1] > sims[0, 2]

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(2, arch.image_resolution, arch.image_resolution, 3).astype(np.float32))
    img = np.asarray(clip.apply(variables, imgs, method=CLIP.encode_image))
    assert img.shape == (2, arch.embed_dim) and np.isfinite(img).all()


@pytest.mark.parametrize("name", ["ViT-B-16", "RN50"])
def test_real_clip_weights_zero_shot(name):
    path = _find(name)
    if path is None:
        pytest.skip(f"no {name}.pt checkpoint in {WEIGHT_ROOTS} (zero-egress image)")
    _zero_shot_check(path)


def test_hf_full_size_clip_if_cached():
    """Fallback weight source: a locally cached HF CLIPModel."""
    try:
        import transformers

        model = transformers.CLIPModel.from_pretrained(
            "openai/clip-vit-base-patch16", local_files_only=True
        )
    except Exception:
        pytest.skip("no locally cached HF CLIP (zero-egress image)")
    from clip_fsar_tpu.models.clip.convert import convert_hf_clip

    sd = {k: v for k, v in model.state_dict().items()}
    arch, variables = convert_hf_clip(sd, model.config)
    assert arch.embed_dim == 512
