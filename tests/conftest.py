"""Test harness: run everything on a virtual 8-device CPU mesh so the
multi-chip sharding paths are exercised without TPU hardware."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


def pytest_configure(config):
    # fp32 parity tests need true-fp32 matmuls/convs (XLA CPU otherwise
    # lowers them to reduced-precision oneDNN paths).
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="session")
def rng():
    import jax

    return jax.random.PRNGKey(0)
