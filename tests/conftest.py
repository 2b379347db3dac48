"""Test harness: run everything on a virtual 8-device CPU mesh so the
multi-chip sharding paths are exercised without TPU hardware."""

import os

# Force CPU: the image pre-sets JAX_PLATFORMS=axon (one real TPU via a
# tunnel) and a sitecustomize imports jax at interpreter startup, so the
# env var alone is read too early to override here — use jax.config too.
# Tests must run on the virtual 8-device CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_configure(config):
    # fp32 parity tests need true-fp32 matmuls/convs (XLA CPU otherwise
    # lowers them to reduced-precision oneDNN paths).
    jax.config.update("jax_default_matmul_precision", "highest")
    config.addinivalue_line("markers", "slow: long-running end-to-end drives")


@pytest.fixture(scope="session")
def rng():
    import jax

    return jax.random.PRNGKey(0)
