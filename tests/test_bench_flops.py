"""Pin bench.py's analytic useful-FLOP counters against XLA cost analysis.

The ``mfu_useful`` bench stat divides the analytic per-frame forward cost
into the measured rate; this test proves the analytic formulas track the
compiled HLO's own flop count (on towers small enough to compile on the
CPU mesh), so the MFU numbers in PERFORMANCE.md are not self-graded.
Reference cost model being matched: 2 FLOP per MAC over the vision tower
of /root/reference/models/base/few_shot.py (ViT 654-688, ModifiedResNet
542-602)."""

import os
import sys

import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _tower_gflops_per_frame  # noqa: E402
from clip_fsar_tpu.models.clip.model import ARCHS, ModifiedResNet, VisionTransformer  # noqa: E402
from clip_fsar_tpu.utils.misc import compiled_stats  # noqa: E402


def _hlo_gflops(module, res: int) -> float:
    x = jnp.zeros((1, res, res, 3), jnp.float32)
    params = module.init(jax.random.PRNGKey(0), x)
    fwd = lambda p, im: module.apply(p, im)
    stats = compiled_stats(fwd, params, x)
    assert "gflops" in stats, "cost analysis unavailable"
    return stats["gflops"]


@pytest.mark.parametrize("name", ["RN-Tiny-Test", "RN50"])
def test_resnet_analytic_flops_match_hlo(name):
    arch = ARCHS[name]
    res = arch.image_resolution
    tower = ModifiedResNet(
        layers=arch.vision_layers,
        output_dim=arch.embed_dim,
        heads=arch.vision_heads,
        input_resolution=res,
        width=arch.vision_width,
    )
    analytic = _tower_gflops_per_frame(name, res)
    assert analytic is not None
    hlo = _hlo_gflops(tower, res)
    # The analytic count covers convs + attnpool matmuls; HLO adds BN/relu
    # vector ops and counts transcendentals, so allow a one-sided margin.
    assert hlo <= analytic * 1.10
    assert analytic <= hlo * 1.10


def test_vit_analytic_flops_match_hlo():
    arch = ARCHS["ViT-Tiny-Test"]
    res = arch.image_resolution
    tower = VisionTransformer(
        input_resolution=res,
        patch_size=arch.vision_patch_size,
        width=arch.vision_width,
        layers=arch.vision_layers,
        heads=arch.vision_heads,
        output_dim=arch.embed_dim,
    )
    analytic = _tower_gflops_per_frame("ViT-Tiny-Test", res)
    hlo = _hlo_gflops(tower, res)
    assert hlo <= analytic * 1.25  # tiny towers: projections the formula rounds over
    assert analytic <= hlo * 1.25
