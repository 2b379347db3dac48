"""Storage abstraction (capability of reference utils/bucket.py)."""

import os

import numpy as np
import pytest

from clip_fsar_tpu.utils import storage


def test_local_paths_pass_through(tmp_path):
    p = tmp_path / "x.bin"
    p.write_bytes(b"abc")
    assert storage.fetch(str(p)) == str(p)
    assert storage.fetch(f"file://{p}") == str(p)
    assert not storage.is_remote(str(p))
    assert not storage.is_remote(f"file://{p}")
    assert storage.is_remote("oss://bucket/key")
    assert storage.is_remote("gs://bucket/key")


def test_unknown_scheme_raises():
    with pytest.raises(ValueError, match="no storage backend"):
        storage.fetch("weird://bucket/key")


def test_custom_scheme_with_retries(tmp_path, monkeypatch):
    """Backends retry like the reference (bucket.py:26-35)."""
    calls = {"n": 0}

    def flaky_fetch(url, dst):
        calls["n"] += 1
        if calls["n"] < 2:
            raise IOError("transient")
        with open(dst, "wb") as f:
            f.write(b"payload")

    monkeypatch.setattr(storage, "CACHE_DIR", str(tmp_path / "cache"))
    storage.register_scheme("mock", flaky_fetch)
    try:
        local = storage.fetch("mock://bucket/key.bin")
        assert open(local, "rb").read() == b"payload"
        assert calls["n"] == 2
        storage.clear_tmp_file(local)
        assert not os.path.exists(local)
    finally:
        storage._FETCHERS.pop("mock", None)


def test_upload_local(tmp_path):
    src = tmp_path / "a.txt"
    src.write_text("hi")
    dst = tmp_path / "sub" / "b.txt"
    storage.upload(str(src), str(dst))
    assert dst.read_text() == "hi"


def test_remote_checkpoint_path_via_loader(tmp_path, monkeypatch):
    """pretrain.load_checkpoint_file fetches remote URLs through the
    storage layer before loading."""
    from clip_fsar_tpu.config import Config
    from clip_fsar_tpu.train.pretrain import load_checkpoint_file, save_weights_npz

    variables = {"params": {"w": np.full(2, 3.0, np.float32)}}
    real = tmp_path / "w.npz"
    save_weights_npz(str(real), variables)

    def fetch_mock(url, dst):
        import shutil

        shutil.copy2(str(real), dst)

    monkeypatch.setattr(storage, "CACHE_DIR", str(tmp_path / "cache"))
    storage.register_scheme("mock", fetch_mock)
    try:
        template = {"params": {"w": np.zeros(2, np.float32)}}
        cfg = Config({"TRAIN": {}})
        out, ok = load_checkpoint_file(cfg, "mock://bucket/w.npz", template)
        assert ok
        np.testing.assert_array_equal(out["params"]["w"], 3.0)
    finally:
        storage._FETCHERS.pop("mock", None)
