"""CLIP zoo parity: the pinned download table and the architecture table
must cover the reference's full `_MODELS` zoo (few_shot.py:232-243)."""

import hashlib
import os

import pytest

from clip_fsar_tpu.models.clip.download import (
    MODEL_URLS,
    available_models,
    download_clip_weights,
)
from clip_fsar_tpu.models.clip.model import ARCHS

REFERENCE_ZOO = [
    "RN50", "RN101", "RN50x4", "RN50x16", "RN50x64",
    "ViT-B/32", "ViT-B/16", "ViT-L/14", "ViT-L/14@336px",
]


def test_zoo_covers_reference_models():
    assert available_models() == REFERENCE_ZOO
    for name in REFERENCE_ZOO:
        assert name in ARCHS, f"ARCHS missing {name}"


def test_arch_table_consistency():
    # OpenAI head rule: width/64 for ViT, width*32/64 for ResNet
    assert ARCHS["RN50x4"].vision_heads == 40
    assert ARCHS["RN50x16"].vision_heads == 48
    assert ARCHS["RN50x64"].vision_heads == 64
    assert ARCHS["ViT-L/14"].vision_heads == 16
    # resolutions scale with the model size (RN50x4 288, x16 384, x64 448)
    assert [ARCHS[n].image_resolution for n in ("RN50x4", "RN50x16", "RN50x64")] == [288, 384, 448]
    assert not ARCHS["RN50x64"].is_vit and ARCHS["ViT-B/16"].is_vit


def test_sha_pinning_is_url_derived():
    # the expected digest IS the parent path segment — 64 hex chars
    for url in MODEL_URLS.values():
        seg = url.split("/")[-2]
        assert len(seg) == 64 and int(seg, 16) >= 0


def test_download_verifies_cached_file(tmp_path, monkeypatch):
    """A cached file with the right digest is returned without touching the
    network; a corrupted cache raises instead of silently loading."""
    payload = b"fake clip checkpoint bytes"
    digest = hashlib.sha256(payload).hexdigest()
    url = f"https://example.invalid/clip/models/{digest}/RN50.pt"
    monkeypatch.setitem(MODEL_URLS, "RN50", url)

    target = tmp_path / "RN50.pt"
    target.write_bytes(payload)
    assert download_clip_weights("RN50", root=str(tmp_path)) == str(target)

    target.write_bytes(b"corrupted")
    with pytest.raises(RuntimeError, match="SHA256"):
        download_clip_weights("RN50", root=str(tmp_path))


def test_download_offline_error_is_actionable(tmp_path, monkeypatch):
    digest = "0" * 64
    monkeypatch.setitem(MODEL_URLS, "RN50", f"https://example.invalid/clip/models/{digest}/RN50.pt")
    with pytest.raises((RuntimeError, OSError), match="RN50"):
        download_clip_weights("RN50", root=str(tmp_path))
    assert not os.path.exists(tmp_path / "RN50.pt.part")
