"""Guard: the test harness must run on the virtual CPU mesh, never on the
tunneled TPU (slow compiles, TPU transcendental approximations break
fp32 parity tolerances)."""


def test_cpu_backend_with_8_devices():
    import jax

    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8
