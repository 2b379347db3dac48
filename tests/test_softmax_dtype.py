"""TPU.SOFTMAX_DTYPE knob: backend selection + numerics envelope.

The bf16-softmax attention path (ops/attention.py, "xla:bf16") is the
adopted train-time default on bf16 towers (PERFORMANCE.md); these tests
pin (a) the config -> backend plumbing, (b) that it is a no-op for fp32
inputs (so every fp32 reference-parity path is untouched), and (c) that
on bf16 inputs it stays within bf16 rounding distance of the fp32
softmax reference.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from clip_fsar_tpu.config.config import Config
from clip_fsar_tpu.models.builder import _attention_backend_from_cfg
from clip_fsar_tpu.ops.attention import mha


def _cfg_with(tpu_overrides):
    return Config({"TPU": tpu_overrides})


def test_backend_selection_from_cfg():
    import os

    import yaml

    # absent key -> fp32 parity backend; explicit keys select
    assert _attention_backend_from_cfg(_cfg_with({})) == "xla"
    assert _attention_backend_from_cfg(_cfg_with({"SOFTMAX_DTYPE": "float32"})) == "xla"
    assert _attention_backend_from_cfg(_cfg_with({"SOFTMAX_DTYPE": "bfloat16"})) == "xla:bf16"
    assert _attention_backend_from_cfg(_cfg_with({"PALLAS_ATTENTION": True})) == "pallas"
    # the shipped pool default is the bf16 path (PERFORMANCE.md)
    base = yaml.safe_load(open(os.path.join(os.path.dirname(__file__), "..", "configs", "pool", "base.yaml")))
    assert base["TPU"]["SOFTMAX_DTYPE"] == "bfloat16"


def test_fp32_inputs_unchanged_by_bf16_backend():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, 4, 9, 8), jnp.float32)
    ref = mha(q, q, q, backend="xla")
    got = mha(q, q, q, backend="xla:bf16")
    # smax dtype follows the input dtype: fp32 in -> identical fp32 math
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("causal", [False, True])
def test_bf16_softmax_within_rounding_of_fp32(causal):
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(3, 2, 17, 8).astype(np.float32), jnp.bfloat16)
    ref = np.asarray(mha(q, q, q, backend="xla", causal=causal), np.float32)
    got = np.asarray(mha(q, q, q, backend="xla:bf16", causal=causal), np.float32)
    # bf16 has ~3 decimal digits; outputs are convex combinations of v
    assert np.max(np.abs(ref - got)) < 0.05
    assert np.mean(np.abs(ref - got)) < 0.01
