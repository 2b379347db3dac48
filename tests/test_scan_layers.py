"""Scan-over-layers execution mode: lax.scan over stacked per-layer params
must be numerically identical to the unrolled loop (same params, same math),
for both forward values and gradients, with and without remat.

Params keep their ``resblocks_i`` names in both modes — only execution
changes — so a checkpoint saved in one mode loads in the other.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from clip_fsar_tpu.models.clip.model import ARCHS, Transformer, VisionTransformer


@pytest.mark.parametrize("remat", [False, True])
def test_transformer_scan_matches_loop(remat):
    loop = Transformer(width=32, layers=4, heads=4, remat=remat, remat_policy="dots")
    scan = Transformer(width=32, layers=4, heads=4, remat=remat, remat_policy="dots", scan_layers=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 32))
    params = loop.init(jax.random.PRNGKey(1), x)["params"]
    # identical param tree works in both modes
    y_loop = loop.apply({"params": params}, x)
    y_scan = scan.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y_loop), np.asarray(y_scan), rtol=0, atol=1e-5)

    def loss_loop(p):
        return jnp.sum(loop.apply({"params": p}, x) ** 2)

    def loss_scan(p):
        return jnp.sum(scan.apply({"params": p}, x) ** 2)

    g_loop = jax.grad(loss_loop)(params)
    g_scan = jax.grad(loss_scan)(params)
    flat_l, _ = jax.flatten_util.ravel_pytree(g_loop)
    flat_s, _ = jax.flatten_util.ravel_pytree(g_scan)
    np.testing.assert_allclose(np.asarray(flat_l), np.asarray(flat_s), rtol=1e-4, atol=1e-4)


def test_scan_init_param_names_match_loop():
    """Init in scan mode produces the same per-layer names as loop mode."""
    loop = Transformer(width=32, layers=3, heads=4)
    scan = Transformer(width=32, layers=3, heads=4, scan_layers=True)
    x = jnp.zeros((1, 5, 32))
    p_loop = loop.init(jax.random.PRNGKey(0), x)["params"]
    p_scan = scan.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(p_loop) == jax.tree_util.tree_structure(p_scan)
    assert set(p_loop) == {"resblocks_0", "resblocks_1", "resblocks_2"}


def test_vit_scan_matches_loop():
    a = ARCHS["ViT-Tiny-Test"]
    kw = dict(
        input_resolution=a.image_resolution,
        patch_size=a.vision_patch_size,
        width=a.vision_width,
        layers=a.vision_layers,
        heads=a.vision_heads,
        output_dim=a.embed_dim,
    )
    loop = VisionTransformer(**kw)
    scan = VisionTransformer(**kw, scan_layers=True)
    img = jax.random.normal(jax.random.PRNGKey(2), (2, a.image_resolution, a.image_resolution, 3))
    variables = loop.init(jax.random.PRNGKey(3), img)
    y_loop = loop.apply(variables, img)
    y_scan = scan.apply(variables, img)
    np.testing.assert_allclose(np.asarray(y_loop), np.asarray(y_scan), rtol=0, atol=1e-5)


def test_scan_layers_with_tensor_parallel():
    """scan_layers composes with the (data x model) TP sharding: GSPMD
    propagates the per-layer shardings through the trace-time stack and the
    logits match the replicated loop run."""
    from clip_fsar_tpu.config import Config
    from clip_fsar_tpu.models.heads.clipfsar import CLIPFSARConfig, CLIPFSARHead
    from clip_fsar_tpu.parallel.mesh import build_mesh, shard_params
    from tests.test_clipfsar_head import make_episode, WAY, T, C_TRAIN, C_TEST, DIM

    base = CLIPFSARHead(arch=ARCHS["ViT-Tiny-Test"], head_cfg=CLIPFSARConfig(way=WAY, num_frames=T))
    ep = make_episode(0)
    text_train = jnp.asarray(np.random.RandomState(7).randn(C_TRAIN, DIM).astype(np.float32))
    text_test = jnp.asarray(np.random.RandomState(8).randn(C_TEST, DIM).astype(np.float32))
    variables = base.init(jax.random.PRNGKey(0), ep, text_train, text_test, train=False)
    ref = np.asarray(base.apply(variables, ep, text_train, text_test, train=False)["logits"])

    head = CLIPFSARHead(
        arch=ARCHS["ViT-Tiny-Test"], head_cfg=CLIPFSARConfig(way=WAY, num_frames=T), scan_layers=True
    )
    mesh = build_mesh(Config({"TPU": {"MESH": {"MODEL": 2, "DATA": 1}}}), devices=jax.devices()[:2])
    v_sharded = shard_params(variables, mesh)
    got = np.asarray(
        jax.jit(lambda v, e: head.apply(v, e, text_train, text_test, train=False)["logits"])(v_sharded, ep)
    )
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-5)


def test_full_head_scan_matches_loop():
    """scan_layers on the full CLIP-FSAR head: same eval logits and finite
    train gradients (covers the TPU.SCAN_LAYERS config path)."""
    from clip_fsar_tpu.models.heads.clipfsar import CLIPFSARConfig, CLIPFSARHead
    from tests.test_clipfsar_head import make_episode, WAY, T, C_TRAIN, C_TEST, DIM

    ep = make_episode(0)
    text_train = jnp.asarray(np.random.RandomState(7).randn(C_TRAIN, DIM).astype(np.float32))
    text_test = jnp.asarray(np.random.RandomState(8).randn(C_TEST, DIM).astype(np.float32))

    base = CLIPFSARHead(arch=ARCHS["ViT-Tiny-Test"], head_cfg=CLIPFSARConfig(way=WAY, num_frames=T))
    variables = base.init(jax.random.PRNGKey(0), ep, text_train, text_test, train=False)
    ref = np.asarray(base.apply(variables, ep, text_train, text_test, train=False)["logits"])

    head = CLIPFSARHead(
        arch=ARCHS["ViT-Tiny-Test"], head_cfg=CLIPFSARConfig(way=WAY, num_frames=T),
        scan_layers=True, remat=True, remat_policy="dots",
    )
    out = np.asarray(jax.jit(lambda v, e: head.apply(v, e, text_train, text_test, train=False)["logits"])(variables, ep))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=1e-5)
    g = jax.grad(lambda v: head.apply(v, ep, text_train, text_test, train=True, deterministic=True)["logits"].sum())(variables)
    assert np.isfinite(float(jax.tree_util.tree_leaves(g)[0].sum()))
