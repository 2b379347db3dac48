"""CLIP tower tests: shapes, jit, and full-tower numeric parity against
HuggingFace transformers CLIPModel (quick_gelu) as an independent oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_fsar_tpu.models.clip.model import ARCHS, CLIP, build_clip
from clip_fsar_tpu.models.clip.convert import convert_hf_clip, convert_openai_clip, infer_arch


def test_vit_shapes_and_jit(rng):
    model = build_clip("ViT-Tiny-Test")
    imgs = jnp.zeros((2, 64, 64, 3))
    text = jnp.zeros((3, 77), dtype=jnp.int32).at[:, 1].set(7).at[:, 2].set(100)
    vs = model.init(rng, imgs, text)
    img_feat = jax.jit(lambda v, x: model.apply(v, x, method=CLIP.encode_image))(vs, imgs)
    txt_feat = jax.jit(lambda v, x: model.apply(v, x, method=CLIP.encode_text))(vs, text)
    assert img_feat.shape == (2, 32)
    assert txt_feat.shape == (3, 32)
    li, lt = model.apply(vs, imgs, text)
    assert li.shape == (2, 3) and lt.shape == (3, 2)


def test_resnet_shapes(rng):
    model = build_clip("RN-Tiny-Test")
    imgs = jnp.ones((2, 64, 64, 3))
    text = jnp.zeros((1, 77), dtype=jnp.int32).at[:, 1].set(5)
    vs = model.init(rng, imgs, text)
    assert "batch_stats" in vs
    feat = model.apply(vs, imgs, method=CLIP.encode_image)
    assert feat.shape == (2, 32)


@pytest.fixture(scope="module")
def hf_tiny():
    import torch
    from transformers import CLIPConfig, CLIPModel

    cfg = CLIPConfig(
        projection_dim=32,
        text_config_dict=dict(
            hidden_size=64, intermediate_size=256, num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=77, vocab_size=49408, hidden_act="quick_gelu",
        ),
        vision_config_dict=dict(
            hidden_size=64, intermediate_size=256, num_hidden_layers=2, num_attention_heads=2,
            image_size=64, patch_size=16, hidden_act="quick_gelu",
        ),
    )
    torch.manual_seed(0)
    model = CLIPModel(cfg).eval()
    return model, cfg


def test_hf_parity_image_and_text(hf_tiny):
    """Full-tower parity: our flax CLIP with converted HF weights must match
    transformers CLIPModel outputs to fp32 tolerance."""
    import torch

    hf_model, hf_cfg = hf_tiny
    sd = hf_model.state_dict()
    arch, variables = convert_hf_clip(sd, hf_cfg)
    model = CLIP(arch=arch)

    rng = np.random.RandomState(0)
    imgs = rng.randn(2, 64, 64, 3).astype(np.float32)
    toks = np.zeros((2, 77), dtype=np.int64)
    toks[0, :5] = [49406, 320, 1125, 539, 49407]
    toks[1, :4] = [49406, 593, 2368, 49407]

    with torch.no_grad():
        hf_img = hf_model.get_image_features(pixel_values=torch.from_numpy(imgs).permute(0, 3, 1, 2)).numpy()
        hf_txt = hf_model.get_text_features(input_ids=torch.from_numpy(toks)).numpy()

    my_img = np.asarray(model.apply(variables, jnp.asarray(imgs), method=CLIP.encode_image))
    my_txt = np.asarray(model.apply(variables, jnp.asarray(toks.astype(np.int32)), method=CLIP.encode_text))

    np.testing.assert_allclose(my_img, hf_img, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(my_txt, hf_txt, rtol=2e-4, atol=2e-5)


def test_openai_format_conversion_roundtrip(hf_tiny):
    """Build an OpenAI-format state dict from the HF weights and check our
    OpenAI converter (incl. in_proj split + arch inference) gives identical
    params to the HF converter."""
    import torch

    hf_model, hf_cfg = hf_tiny
    sd = hf_model.state_dict()

    openai_sd = {}
    openai_sd["visual.conv1.weight"] = sd["vision_model.embeddings.patch_embedding.weight"]
    openai_sd["visual.class_embedding"] = sd["vision_model.embeddings.class_embedding"]
    openai_sd["visual.positional_embedding"] = sd["vision_model.embeddings.position_embedding.weight"]
    openai_sd["visual.ln_pre.weight"] = sd["vision_model.pre_layrnorm.weight"]
    openai_sd["visual.ln_pre.bias"] = sd["vision_model.pre_layrnorm.bias"]
    openai_sd["visual.ln_post.weight"] = sd["vision_model.post_layernorm.weight"]
    openai_sd["visual.ln_post.bias"] = sd["vision_model.post_layernorm.bias"]
    openai_sd["visual.proj"] = sd["visual_projection.weight"].T
    openai_sd["token_embedding.weight"] = sd["text_model.embeddings.token_embedding.weight"]
    openai_sd["positional_embedding"] = sd["text_model.embeddings.position_embedding.weight"]
    openai_sd["ln_final.weight"] = sd["text_model.final_layer_norm.weight"]
    openai_sd["ln_final.bias"] = sd["text_model.final_layer_norm.bias"]
    openai_sd["text_projection"] = sd["text_projection.weight"].T
    openai_sd["logit_scale"] = sd["logit_scale"]
    for side, hf_side in (("visual.transformer", "vision_model.encoder"), ("transformer", "text_model.encoder")):
        for i in range(2):
            p, h = f"{side}.resblocks.{i}", f"{hf_side}.layers.{i}"
            openai_sd[f"{p}.ln_1.weight"] = sd[f"{h}.layer_norm1.weight"]
            openai_sd[f"{p}.ln_1.bias"] = sd[f"{h}.layer_norm1.bias"]
            openai_sd[f"{p}.ln_2.weight"] = sd[f"{h}.layer_norm2.weight"]
            openai_sd[f"{p}.ln_2.bias"] = sd[f"{h}.layer_norm2.bias"]
            openai_sd[f"{p}.attn.in_proj_weight"] = torch.cat(
                [sd[f"{h}.self_attn.{n}.weight"] for n in ("q_proj", "k_proj", "v_proj")], dim=0
            )
            openai_sd[f"{p}.attn.in_proj_bias"] = torch.cat(
                [sd[f"{h}.self_attn.{n}.bias"] for n in ("q_proj", "k_proj", "v_proj")], dim=0
            )
            openai_sd[f"{p}.attn.out_proj.weight"] = sd[f"{h}.self_attn.out_proj.weight"]
            openai_sd[f"{p}.attn.out_proj.bias"] = sd[f"{h}.self_attn.out_proj.bias"]
            openai_sd[f"{p}.mlp.c_fc.weight"] = sd[f"{h}.mlp.fc1.weight"]
            openai_sd[f"{p}.mlp.c_fc.bias"] = sd[f"{h}.mlp.fc1.bias"]
            openai_sd[f"{p}.mlp.c_proj.weight"] = sd[f"{h}.mlp.fc2.weight"]
            openai_sd[f"{p}.mlp.c_proj.bias"] = sd[f"{h}.mlp.fc2.bias"]

    arch = infer_arch(openai_sd)
    assert arch.is_vit and arch.vision_layers == 2 and arch.vision_patch_size == 16
    assert arch.image_resolution == 64 and arch.embed_dim == 32

    _, v_openai = convert_openai_clip(openai_sd)
    _, v_hf = convert_hf_clip(sd, hf_cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(v_openai)
    flat_b = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(v_hf)}
    assert len(flat_a) == len(flat_b)
    for k, v in flat_a:
        np.testing.assert_array_equal(v, flat_b[jax.tree_util.keystr(k)])


def test_bf16_close_to_fp32(hf_tiny):
    hf_model, hf_cfg = hf_tiny
    arch, variables = convert_hf_clip(hf_model.state_dict(), hf_cfg)
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    f32 = CLIP(arch=arch).apply(variables, imgs, method=CLIP.encode_image)
    bf16 = CLIP(arch=arch, dtype=jnp.bfloat16).apply(variables, imgs, method=CLIP.encode_image)
    assert bf16.dtype == jnp.bfloat16
    rel = np.abs(np.asarray(bf16, np.float32) - np.asarray(f32)) / (np.abs(np.asarray(f32)) + 1e-3)
    assert np.median(rel) < 0.05


def test_known_arch_table():
    assert ARCHS["RN50"].vision_heads == 32 and ARCHS["RN50"].embed_dim == 1024
    assert ARCHS["ViT-B/16"].embed_dim == 512
    assert not ARCHS["RN50"].is_vit and ARCHS["ViT-B/16"].is_vit


def test_unsplit_attention_layout_matches_split():
    """TPU.ATTENTION_LAYOUT=unsplit computes attention in the [B,N,H,Dh]
    view (no head transposes) — must match the split layout bitwise-close
    on the same weights."""
    import jax
    import jax.numpy as jnp

    from clip_fsar_tpu.models.clip.model import MultiheadAttention

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(3, 17, 64).astype(np.float32))
    split_attn = MultiheadAttention(64, 4, attention_backend="xla")
    unsplit_attn = MultiheadAttention(64, 4, attention_backend="xla:unsplit")
    vs = split_attn.init(jax.random.PRNGKey(0), x)
    want = split_attn.apply(vs, x)
    got = unsplit_attn.apply(vs, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
    # causal (text tower) path too
    want_c = split_attn.apply(vs, x, causal=True)
    got_c = unsplit_attn.apply(vs, x, causal=True)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c), rtol=2e-5, atol=2e-5)


def test_fused_attention_backend_matches_split():
    """backend='fused' (whole-sequence Pallas kernel, interpret mode on
    CPU) must match the split XLA path on the same weights; causal calls
    fall back to XLA inside the module."""
    import jax
    import jax.numpy as jnp

    from clip_fsar_tpu.models.clip.model import MultiheadAttention

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 13, 64).astype(np.float32))
    split_attn = MultiheadAttention(64, 4, attention_backend="xla")
    fused_attn = MultiheadAttention(64, 4, attention_backend="fused")
    vs = split_attn.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(fused_attn.apply(vs, x)), np.asarray(split_attn.apply(vs, x)), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(fused_attn.apply(vs, x, causal=True)),
        np.asarray(split_attn.apply(vs, x, causal=True)),
        rtol=2e-5, atol=2e-5,
    )


def test_adapt_vision_resolution_follows_the_running_flow():
    """The tower must be sized for the pixels the active flow feeds it:
    a test-only config (TRAIN.ENABLE false) with a different train crop
    consumes TEST_CROP_SIZE; explicit flow= from the runners wins."""
    from clip_fsar_tpu.config.config import Config
    from clip_fsar_tpu.models.builder import _adapt_vision_resolution

    arch = ARCHS["ViT-B/16"]

    def cfg(train_enable):
        return Config({
            "DATA": {"TRAIN_CROP_SIZE": 192, "TEST_CROP_SIZE": 224},
            "TRAIN": {"ENABLE": train_enable},
        })

    assert _adapt_vision_resolution(cfg(False), arch).image_resolution == 224
    assert _adapt_vision_resolution(cfg(True), arch).image_resolution == 192
    assert _adapt_vision_resolution(cfg(True), arch, flow="test").image_resolution == 224
    assert _adapt_vision_resolution(cfg(False), arch, flow="train").image_resolution == 192
