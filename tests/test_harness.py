"""Guard: the test harness must run on the virtual CPU mesh, never on the
tunneled TPU (slow compiles, TPU transcendental approximations break
fp32 parity tolerances)."""


def test_cpu_backend_with_8_devices():
    import jax

    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8


def test_tensor_parallel_matches_replicated():
    """A (data x model) mesh with Megatron-style sharding of the CLIP
    tower must produce the same eval logits as the replicated run (GSPMD
    inserts the collectives; numerics unchanged)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from clip_fsar_tpu.models.clip.model import ARCHS
    from clip_fsar_tpu.models.heads.clipfsar import CLIPFSARConfig, CLIPFSARHead
    from clip_fsar_tpu.parallel.mesh import build_mesh, shard_batch, shard_params
    from clip_fsar_tpu.config import Config
    from tests.test_clipfsar_head import make_episode, WAY, T, C_TRAIN, C_TEST, DIM

    head = CLIPFSARHead(arch=ARCHS["ViT-Tiny-Test"], head_cfg=CLIPFSARConfig(way=WAY, num_frames=T))
    ep = make_episode(0)
    text_train = jnp.asarray(np.random.RandomState(7).randn(C_TRAIN, DIM).astype(np.float32))
    text_test = jnp.asarray(np.random.RandomState(8).randn(C_TEST, DIM).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), ep, text_train, text_test, train=False)

    fn = jax.jit(lambda v, e: head.apply(v, e, text_train, text_test, train=False)["logits"])
    base = np.asarray(fn(variables, ep))

    cfg = Config({"TPU": {"MESH": {"MODEL": 2, "DATA": 1}}})
    mesh = build_mesh(cfg, devices=jax.devices()[:2])
    v_sharded = shard_params(variables, mesh)
    # episode replicated over the tiny mesh (eval path, batch of 1 episode)
    got = np.asarray(fn(v_sharded, ep))
    np.testing.assert_allclose(got, base, rtol=2e-4, atol=1e-5)

    # the qkv/c_fc kernels are actually sharded over 'model'
    k = v_sharded["params"]["backbone"]["transformer"]["resblocks_0"]["attn"]["q_proj"]["kernel"]
    assert "model" in str(k.sharding.spec)


def test_remat_and_pallas_configs_compile():
    """The perf-sweep configurations (remat nothing/dots, pallas
    attention) must compile and run — guards the bench sweep against
    config-path rot while real hardware is unavailable."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from clip_fsar_tpu.models.clip.model import ARCHS
    from clip_fsar_tpu.models.heads.clipfsar import CLIPFSARConfig, CLIPFSARHead
    from tests.test_clipfsar_head import make_episode, WAY, T, C_TRAIN, C_TEST, DIM

    ep = make_episode(0)
    text_train = jnp.asarray(np.random.RandomState(7).randn(C_TRAIN, DIM).astype(np.float32))
    text_test = jnp.asarray(np.random.RandomState(8).randn(C_TEST, DIM).astype(np.float32))

    base = CLIPFSARHead(arch=ARCHS["ViT-Tiny-Test"], head_cfg=CLIPFSARConfig(way=WAY, num_frames=T))
    variables = base.init(jax.random.PRNGKey(0), ep, text_train, text_test, train=False)
    ref = np.asarray(base.apply(variables, ep, text_train, text_test, train=False)["logits"])

    for kw in ({"remat": True, "remat_policy": "nothing"}, {"remat": True, "remat_policy": "dots"}):
        head = CLIPFSARHead(arch=ARCHS["ViT-Tiny-Test"], head_cfg=CLIPFSARConfig(way=WAY, num_frames=T), **kw)
        out = np.asarray(jax.jit(lambda v, e: head.apply(v, e, text_train, text_test, train=False)["logits"])(variables, ep))
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=1e-5, err_msg=str(kw))
        # gradients flow through the remat blocks
        g = jax.grad(lambda v: head.apply(v, ep, text_train, text_test, train=True, deterministic=True)["logits"].sum())(variables)
        assert np.isfinite(float(jax.tree_util.tree_leaves(g)[0].sum()))


def test_maybe_init_distributed_noop_single_host(monkeypatch):
    """Single-host (no coordinator env) is a no-op; the reference RANK/
    WORLD_SIZE convention is recognized only with a coordinator address."""
    from clip_fsar_tpu.parallel.mesh import maybe_init_distributed

    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS", "WORLD_SIZE", "RANK"):
        monkeypatch.delenv(var, raising=False)
    assert maybe_init_distributed() is False

    monkeypatch.setenv("WORLD_SIZE", "4")
    monkeypatch.setenv("RANK", "1")
    # no coordinator address and PAI unset -> still a no-op
    assert maybe_init_distributed() is False
