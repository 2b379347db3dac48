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


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: `pytest -m "not slow"` is the <5-minute signal on a
    1-core VM; the full suite is ~45 min.  Slow tests carry the marker
    either explicitly (@pytest.mark.slow on e2e/CLI/multihost drives) or
    via tests/slow_tests.txt — the measured >=4 s-per-call manifest,
    regenerated with:  pytest tests -q --durations=0  (see README)."""
    manifest_path = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
    if not os.path.exists(manifest_path):
        return
    with open(manifest_path) as f:
        manifest = {line.strip() for line in f if line.strip() and not line.startswith("#")}
    matched = set()
    for item in items:
        # nodeid relative to tests/: "test_x.py::test_y[param]".  Basename
        # only the FILE part — a '/' inside a param id (e.g. "ViT-B/16")
        # must survive, or the manifest entry can never match.
        f, _, rest = item.nodeid.partition("::")
        nodeid = os.path.basename(f) + "::" + rest
        if nodeid in manifest:
            item.add_marker(pytest.mark.slow)
            matched.add(nodeid)
    stale = manifest - matched
    # only meaningful when the whole suite was collected: a single-file run
    # legitimately misses every other file's manifest entries
    collected_files = {os.path.basename(item.nodeid.partition("::")[0]) for item in items}
    stale = {s for s in stale if s.partition("::")[0] in collected_files}
    if stale and not config.option.keyword and not config.option.markexpr:
        import warnings

        warnings.warn(f"slow_tests.txt entries matched no collected test: {sorted(stale)[:5]}...")


@pytest.fixture(scope="session")
def rng():
    import jax

    return jax.random.PRNGKey(0)
