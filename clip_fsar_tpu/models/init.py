"""Weight initializers matching the reference init helpers
(models/utils/init_helper.py):

  * ``msra_fill``     — c2_msra_fill (:112-122): kaiming-normal fan_out
    with relu gain, zero bias; used for every conv in the ResNet-style
    video models (_init_convnet_weights :125-156);
  * ``trunc_normal``  — timm trunc_normal_(std=0.02) for transformer
    linears/embeddings (_init_transformer_weights :103-110);
  * ``fc_init``       — normal(std=0.01), zero bias, for classifier FCs
    (reference fc_init_std).

flax note: variance_scaling(2.0, "fan_out", "normal") computes
std = sqrt(2 / fan_out) with fan_out = out_channels * prod(kernel) —
exactly torch's kaiming_normal_(mode="fan_out", nonlinearity="relu").
"""

from __future__ import annotations

import flax.linen as nn

msra_fill = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

trunc_normal = nn.initializers.truncated_normal(stddev=0.02)


def fc_init(std: float = 0.01):
    return nn.initializers.normal(stddev=std)
