"""retry_transient: bounded backoff on transient device RESOURCE_EXHAUSTED.

On a shared/tunneled chip another tenant's allocation spike can fail a
small upload (observed twice on the round-4 protocol training run: a 36 MB
batch upload and an eager rng split both died with RESOURCE_EXHAUSTED at
~7 GB resident while 20 GiB probes succeeded minutes later).  The helper
retries only non-donating ops — see parallel/mesh.py::retry_transient.
"""

import pytest

from clip_fsar_tpu.parallel.mesh import retry_transient


def test_retries_then_succeeds():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise ValueError("RESOURCE_EXHAUSTED: TPU backend error (ResourceExhausted).")
        return "ok"

    assert retry_transient(flaky, "t", attempts=4, base_delay=0.0) == "ok"
    assert len(calls) == 3


def test_exhausts_attempts_and_reraises():
    def always_oom():
        raise ValueError("RESOURCE_EXHAUSTED: TPU backend error")

    with pytest.raises(ValueError, match="RESOURCE_EXHAUSTED"):
        retry_transient(always_oom, "t", attempts=3, base_delay=0.0)


def test_non_transient_errors_propagate_immediately():
    calls = []

    def bad():
        calls.append(1)
        raise TypeError("some other failure")

    with pytest.raises(TypeError):
        retry_transient(bad, "t", attempts=4, base_delay=0.0)
    assert len(calls) == 1  # no retry for non-RESOURCE_EXHAUSTED errors


def test_first_try_fast_path():
    assert retry_transient(lambda: 42, "t") == 42
