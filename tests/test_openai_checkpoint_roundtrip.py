"""OpenAI-format `.pt` converter, end to end with a SYNTHETIC checkpoint.

The zero-egress image has no real CLIP weights (tests/test_real_weights
skips), so this builds a tiny ViT CLIP state dict in the torch key space
(`visual.conv1.weight`, `transformer.resblocks.N.attn.in_proj_weight`, …),
torch.saves it, and asserts:
  * shape inference recovers the architecture (reference build_model,
    few_shot.py:849-886 infers everything from tensor shapes);
  * `load_openai_checkpoint` -> flax forward runs;
  * image/text embeddings MATCH the reference's own vendored CLIP built
    from the very same state dict — full converter parity, no downloads.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

def _tiny_vit_state_dict(width=64, layers=2, patch=8, res=32, embed=16, ctx=77, vocab=49408, tw=64, tl=2):
    g = torch.Generator().manual_seed(0)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.02

    sd = {
        "visual.class_embedding": r(width),
        "visual.positional_embedding": r((res // patch) ** 2 + 1, width),
        "visual.conv1.weight": r(width, 3, patch, patch),
        "visual.ln_pre.weight": torch.ones(width), "visual.ln_pre.bias": torch.zeros(width),
        "visual.ln_post.weight": torch.ones(width), "visual.ln_post.bias": torch.zeros(width),
        "visual.proj": r(width, embed),
        "positional_embedding": r(ctx, tw),
        "token_embedding.weight": r(vocab, tw),
        "ln_final.weight": torch.ones(tw), "ln_final.bias": torch.zeros(tw),
        "text_projection": r(tw, embed),
        "logit_scale": torch.tensor(2.6592),
    }
    for prefix, w, n in (("visual.transformer", width, layers), ("transformer", tw, tl)):
        for i in range(n):
            b = f"{prefix}.resblocks.{i}"
            sd.update({
                f"{b}.attn.in_proj_weight": r(3 * w, w),
                f"{b}.attn.in_proj_bias": r(3 * w),
                f"{b}.attn.out_proj.weight": r(w, w),
                f"{b}.attn.out_proj.bias": r(w),
                f"{b}.ln_1.weight": torch.ones(w), f"{b}.ln_1.bias": torch.zeros(w),
                f"{b}.ln_2.weight": torch.ones(w), f"{b}.ln_2.bias": torch.zeros(w),
                f"{b}.mlp.c_fc.weight": r(4 * w, w), f"{b}.mlp.c_fc.bias": r(4 * w),
                f"{b}.mlp.c_proj.weight": r(w, 4 * w), f"{b}.mlp.c_proj.bias": r(w),
            })
    return sd


def test_synthetic_openai_pt_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from clip_fsar_tpu.models.clip.convert import load_openai_checkpoint

    sd = _tiny_vit_state_dict()
    path = tmp_path / "tiny.pt"
    torch.save(sd, str(path))

    arch, variables = load_openai_checkpoint(str(path))
    assert arch.vision_layers == 2 and arch.vision_width == 64 and arch.embed_dim == 16
    assert arch.image_resolution == 32 and arch.vision_patch_size == 8

    # flax forward
    from clip_fsar_tpu.models.clip.model import CLIP

    model = CLIP(arch=arch)
    img = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    toks = jnp.asarray(np.array([[49406, 320, 49407] + [0] * 74, [49406, 589, 49407] + [0] * 74]), jnp.int32)
    img_f = model.apply(variables, img, method=model.encode_image)
    txt_f = model.apply(variables, toks, method=model.encode_text)

    # reference vendored CLIP from the SAME state dict (stubbed imports,
    # tests/reference_oracle.py)
    from reference_oracle import import_reference_few_shot

    ref_fs = import_reference_few_shot()
    ref = ref_fs.build_model({k: v.clone() for k, v in sd.items()}).float().eval()
    with torch.no_grad():
        rimg = ref.encode_image(torch.from_numpy(np.asarray(img.transpose(0, 3, 1, 2), np.float32)))
        rtxt = ref.encode_text(torch.from_numpy(np.asarray(toks)))

    np.testing.assert_allclose(np.asarray(img_f, np.float32), rimg.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(txt_f, np.float32), rtxt.numpy(), rtol=2e-4, atol=2e-4)


def test_synthetic_openai_pt_roundtrip_rn50_family(tmp_path):
    """Same roundtrip for the ModifiedResNet branch: the state dict comes
    from the reference's own CLIP class (tuple vision_layers ->
    ModifiedResNet), so every RN key/layout quirk is covered."""
    import jax.numpy as jnp

    from reference_oracle import import_reference_few_shot

    ref_fs = import_reference_few_shot()
    torch.manual_seed(0)
    ref = ref_fs.CLIP(
        embed_dim=16, image_resolution=64, vision_layers=(1, 1, 1, 1), vision_width=64,
        vision_patch_size=None, context_length=77, vocab_size=49408,
        transformer_width=64, transformer_heads=1, transformer_layers=2,
    ).float().eval()
    path = tmp_path / "tiny_rn.pt"
    torch.save(ref.state_dict(), str(path))

    from clip_fsar_tpu.models.clip.convert import load_openai_checkpoint
    from clip_fsar_tpu.models.clip.model import CLIP

    arch, variables = load_openai_checkpoint(str(path))
    assert arch.vision_layers == (1, 1, 1, 1) and arch.vision_width == 64
    assert arch.image_resolution == 64 and arch.embed_dim == 16

    model = CLIP(arch=arch)
    img = jnp.asarray(np.random.RandomState(1).rand(2, 64, 64, 3), jnp.float32)
    toks = jnp.asarray(np.array([[49406, 320, 49407] + [0] * 74, [49406, 589, 49407] + [0] * 74]), jnp.int32)
    img_f = model.apply(variables, img, method=model.encode_image)
    txt_f = model.apply(variables, toks, method=model.encode_text)

    with torch.no_grad():
        rimg = ref.encode_image(torch.from_numpy(np.asarray(img.transpose(0, 3, 1, 2), np.float32)))
        rtxt = ref.encode_text(torch.from_numpy(np.asarray(toks)))

    np.testing.assert_allclose(np.asarray(img_f, np.float32), rimg.numpy(), rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(txt_f, np.float32), rtxt.numpy(), rtol=5e-4, atol=5e-4)
