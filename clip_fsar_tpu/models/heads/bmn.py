"""BMN head for temporal action localization (capability of reference
module_zoo/heads/bmn_head.py:20-224).

Predicts start/end boundary probabilities and a (duration x time)
boundary-matching confidence map from 1D window features, with optional
regression and verb/noun classification maps (EPIC).

TPU notes: the boundary-matching layer is one big matmul against a
precomputed interpolation mask [T, N*D*T] (exactly the reference's
sample_mask, built host-side in numpy at trace time) — MXU-friendly by
construction.  Features are [B, T, C] (channel-last).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from clip_fsar_tpu.utils.registry import HEAD_REGISTRY


def interp1d_bin_mask(seg_xmin, seg_xmax, tscale, num_sample, num_sample_perbin) -> np.ndarray:
    """Sampling weights of one proposal over the T grid
    (reference bmn_head.py:195-224)."""
    plen = float(seg_xmax - seg_xmin)
    plen_sample = plen / (num_sample * num_sample_perbin - 1.0)
    total = [seg_xmin + plen_sample * i for i in range(num_sample * num_sample_perbin)]
    cols = []
    for idx in range(num_sample):
        vec = np.zeros(tscale)
        for s in total[idx * num_sample_perbin : (idx + 1) * num_sample_perbin]:
            up = math.ceil(s)
            frac, down = math.modf(s)
            if 0 <= int(down) <= tscale - 1:
                vec[int(down)] += 1 - frac
            if 0 <= int(up) <= tscale - 1:
                vec[int(up)] += frac
        cols.append(vec / num_sample_perbin)
    return np.stack(cols, axis=1)  # [T, num_sample]


def boundary_matching_mask(tscale: int, dscale: int, num_sample: int, num_sample_perbin: int, boundary_ratio: float) -> np.ndarray:
    """[T, num_sample, D, T] sample mask (reference get_interp1d_mask)."""
    mat = []
    for start in range(tscale):
        per_duration = []
        for duration in range(dscale):
            if start + duration < tscale:
                xmin, xmax = start, start + duration
                center = float(xmax - xmin) + 1
                m = interp1d_bin_mask(xmin - center * boundary_ratio, xmax + center * boundary_ratio, tscale, num_sample, num_sample_perbin)
            else:
                m = np.zeros((tscale, num_sample))
            per_duration.append(m)
        mat.append(np.stack(per_duration, axis=2))  # [T, N, D]
    return np.stack(mat, axis=3).astype(np.float32)  # [T, N, D, Tstart]


def _conv1d(f, k, groups=1, name=None):
    return nn.Conv(f, (k,), padding=[(k // 2, k // 2)], feature_group_count=groups, param_dtype=jnp.float32, name=name)


def _conv2d(f, k, name=None):
    return nn.Conv(f, (k, k), padding=[(k // 2, k // 2)] * 2, param_dtype=jnp.float32, name=name)


@HEAD_REGISTRY.register(name="BaseBMN")
class BaseBMN(nn.Module):
    cfg: Any
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> Tuple[Dict[str, Any], Dict]:
        """x: [B, T, C] window features -> maps dict."""
        cfg = self.cfg
        tscale = int(cfg.DATA.TEMPORAL_SCALE)
        dscale = int(cfg.DATA.get("DURATION_SCALE", 0) or 0) or tscale
        num_sample = int(cfg.VIDEO.HEAD.NUM_SAMPLE)
        per_bin = int(cfg.VIDEO.HEAD.NUM_SAMPLE_PERBIN)
        ratio = float(cfg.VIDEO.HEAD.BOUNDARY_RATIO)
        d1 = int(cfg.VIDEO.DIM1D)
        d2 = int(cfg.VIDEO.DIM2D)
        d3 = int(cfg.VIDEO.DIM3D)

        start = _conv1d(d1, 3, groups=4, name="x_1d_s_conv1")(x)
        start = nn.sigmoid(_conv1d(1, 1, name="x_1d_s_conv2")(nn.relu(start)))[..., 0]  # [B, T]
        end = _conv1d(d1, 3, groups=4, name="x_1d_e_conv1")(x)
        end = nn.sigmoid(_conv1d(1, 1, name="x_1d_e_conv2")(nn.relu(end)))[..., 0]

        mid = nn.relu(_conv1d(d1, 3, name="x_1d_p_conv")(x))  # [B, T, C]

        # boundary matching: [B, C, T] @ [T, N*D*T] -> [B, C, N, D, T]
        mask = jnp.asarray(boundary_matching_mask(tscale, dscale, num_sample, per_bin, ratio).reshape(tscale, -1))
        bm = jnp.einsum("btc,tm->bcm", mid, mask).reshape(x.shape[0], d1, num_sample, dscale, tscale)

        # 3D conv over the sample axis == weighted sum -> [B, D, T, C3]
        bm = bm.transpose(0, 2, 3, 4, 1)  # [B, N, D, T, C]
        bm = nn.Conv(d3, (num_sample, 1, 1), strides=(num_sample, 1, 1), param_dtype=jnp.float32, name="x_3d_p")(bm)
        bm = nn.relu(bm)[:, 0]  # [B, D, T, C3]

        h = nn.relu(_conv2d(d2, 1, name="x_2d_p_conv1")(bm))
        h = nn.relu(_conv2d(d2, 3, name="x_2d_p_conv2")(h))
        h = nn.relu(_conv2d(d2, 3, name="x_2d_p_conv3")(h))
        confidence = nn.sigmoid(_conv2d(2, 1, name="x_2d_p_conv4")(h))  # [B, D, T, 2]
        confidence_map = confidence.transpose(0, 3, 1, 2)  # [B, 2, D, T]

        out: Dict[str, Any] = {"confidence_map": confidence_map, "start": start, "end": end,
                               "reg_map": {}, "verb_map": {}, "noun_map": {}}

        if bool(cfg.VIDEO.HEAD.get("USE_BMN_REGRESSION", False)):
            r = nn.relu(_conv2d(d2, 1, name="x_2d_r_conv1")(bm))
            r = nn.relu(_conv2d(d2, 3, name="x_2d_r_conv2")(r))
            r = nn.relu(_conv2d(d2, 3, name="x_2d_r_conv3")(r))
            out["reg_map"] = _conv2d(2, 1, name="x_2d_r_conv4")(r).transpose(0, 3, 1, 2)

        ncls = cfg.VIDEO.HEAD.get("NUM_CLASSES", None)
        if isinstance(ncls, (list, tuple)):
            for tag, n in (("verb", int(ncls[0])), ("noun", int(ncls[1]))):
                v = nn.relu(_conv2d(d2, 1, name=f"x_2d_{tag}_conv1")(bm))
                v = nn.relu(_conv2d(d2, 3, name=f"x_2d_{tag}_conv2")(v))
                v = nn.relu(_conv2d(d2, 3, name=f"x_2d_{tag}_conv3")(v))
                out[f"{tag}_map"] = _conv2d(n, 1, name=f"x_2d_{tag}_conv4")(v).transpose(0, 3, 1, 2)
        return out, {}
