"""cos_sim / class_mean / TransformerV1 parity vs torch-built oracles."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clip_fsar_tpu.models.heads.common import TransformerV1, class_mean, cos_sim


def test_cos_sim_epsilon_regularized():
    rng = np.random.RandomState(0)
    x = rng.randn(6, 16).astype(np.float32)
    y = rng.randn(4, 16).astype(np.float32)
    got = np.asarray(cos_sim(jnp.asarray(x), jnp.asarray(y)))
    num = x @ y.T
    den = np.linalg.norm(x, axis=-1, keepdims=True) @ np.linalg.norm(y, axis=-1, keepdims=True).T + 0.01
    np.testing.assert_allclose(got, num / den, rtol=1e-5)
    # zero vectors stay finite thanks to the epsilon
    z = np.zeros((1, 16), dtype=np.float32)
    assert np.isfinite(np.asarray(cos_sim(jnp.asarray(z), jnp.asarray(y)))).all()


def test_class_mean_matches_unique_index_select_semantics():
    rng = np.random.RandomState(1)
    feats = rng.randn(10, 8, 4).astype(np.float32)  # [N, T, D]
    labels = np.array([3, 1, 4, 0, 2, 2, 0, 4, 1, 3])
    got = np.asarray(class_mean(jnp.asarray(feats), jnp.asarray(labels), 5))
    for c in range(5):  # torch.unique returns sorted classes -> row c is class c
        np.testing.assert_allclose(got[c], feats[labels == c].mean(0), rtol=1e-5)


def test_class_mean_unbalanced_counts():
    feats = np.arange(12, dtype=np.float32).reshape(6, 2)
    labels = np.array([0, 0, 0, 1, 1, 2])
    got = np.asarray(class_mean(jnp.asarray(feats), jnp.asarray(labels), 3))
    np.testing.assert_allclose(got[0], feats[:3].mean(0))
    np.testing.assert_allclose(got[1], feats[3:5].mean(0))
    np.testing.assert_allclose(got[2], feats[5])


@pytest.mark.parametrize("depth", [1, 2])
def test_transformer_v1_parity_vs_torch(depth):
    """Assemble the same computation with torch primitives and compare.

    Validates: shared pre-norm across q/k/v, residual-on-raw-q, biasless
    qkv projections, exact-GELU MLP, depth>1 self-attention layers.
    """
    import torch

    dim, heads, dim_head, mlp_dim = 32, 4, 8, 48
    model = TransformerV1(dim=dim, heads=heads, dim_head_k=dim_head, mlp_dim=mlp_dim, depth=depth)
    rng = np.random.RandomState(depth)
    q = rng.randn(3, 5, dim).astype(np.float32)
    k = rng.randn(3, 7, dim).astype(np.float32)
    v = rng.randn(3, 7, dim).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))["params"]
    got = np.asarray(model.apply({"params": params}, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))

    def t(x):
        return torch.from_numpy(np.asarray(x))

    def torch_layer(i, tq, tk, tv):
        p = params[f"norm_{i}"]
        ln = torch.nn.functional.layer_norm
        nq = ln(tq, (dim,), t(p["scale"]), t(p["bias"]))
        nk = ln(tk, (dim,), t(p["scale"]), t(p["bias"]))
        nv = ln(tv, (dim,), t(p["scale"]), t(p["bias"]))
        a = params[f"attn_{i}"]
        qq = nq @ t(a["to_q"]["kernel"])
        kk = nk @ t(a["to_k"]["kernel"])
        vv = nv @ t(a["to_v"]["kernel"])
        b, n, _ = qq.shape
        m = kk.shape[1]
        qq = qq.view(b, n, heads, dim_head).transpose(1, 2)
        kk = kk.view(b, m, heads, dim_head).transpose(1, 2)
        vv = vv.view(b, m, heads, dim_head).transpose(1, 2)
        att = torch.softmax(qq @ kk.transpose(-1, -2) * dim_head**-0.5, dim=-1)
        out = (att @ vv).transpose(1, 2).reshape(b, n, heads * dim_head)
        out = out @ t(a["to_out"]["kernel"]) + t(a["to_out"]["bias"])
        x = out + tq
        f = params[f"ff_{i}"]
        h = torch.nn.functional.gelu(x @ t(f["fc1"]["kernel"]) + t(f["fc1"]["bias"]))
        h = h @ t(f["fc2"]["kernel"]) + t(f["fc2"]["bias"])
        return h + x

    x = torch_layer(0, t(q), t(k), t(v))
    for i in range(1, depth):
        x = torch_layer(i, x, x, x)
    np.testing.assert_allclose(got, x.numpy(), rtol=1e-4, atol=1e-5)


def test_transformer_v1_dropout_active_in_train():
    model = TransformerV1(dim=16, heads=2, dim_head_k=8, mlp_dim=16, dropout_atte=0.5, dropout_ffn=0.5)
    x = jnp.ones((1, 4, 16))
    params = model.init(jax.random.PRNGKey(0), x, x, x)["params"]
    a = model.apply({"params": params}, x, x, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
    b = model.apply({"params": params}, x, x, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)})
    c = model.apply({"params": params}, x, x, x)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    assert np.allclose(np.asarray(c), np.asarray(model.apply({"params": params}, x, x, x)))
