"""TPU.REMAT/SCAN_LAYERS "auto" resolution (models/builder.py):
deep towers (>= 24 layers) get remat + scan-over-layers — measured v5e
necessity for ViT-L (PERFORMANCE.md) — while ViT-B-class towers and
ModifiedResNets stay unrolled; explicit booleans always win."""

from clip_fsar_tpu.config import Config
from clip_fsar_tpu.models.builder import _resolve_tower_execution


class _Arch:
    def __init__(self, layers):
        self.vision_layers = layers


def _cfg(**tpu):
    return Config({"TPU": tpu})


def test_auto_by_depth():
    auto = _cfg(REMAT="auto", SCAN_LAYERS="auto")
    assert _resolve_tower_execution(auto, _Arch(12)) == (False, False)
    assert _resolve_tower_execution(auto, _Arch(24)) == (True, True)
    assert _resolve_tower_execution(auto, _Arch((3, 4, 6, 3))) == (False, False)  # RN tuple
    assert _resolve_tower_execution(auto, None) == (False, False)


def test_explicit_wins_over_auto_default():
    assert _resolve_tower_execution(_cfg(REMAT=True, SCAN_LAYERS=False), _Arch(24)) == (True, False)
    assert _resolve_tower_execution(_cfg(REMAT=False, SCAN_LAYERS=True), _Arch(24)) == (False, True)
    assert _resolve_tower_execution(_cfg(REMAT=True, SCAN_LAYERS=True), _Arch(12)) == (True, True)


def test_no_tpu_section_means_off():
    assert _resolve_tower_execution(Config({}), _Arch(24)) == (False, False)
