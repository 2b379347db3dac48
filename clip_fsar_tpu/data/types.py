"""Episode pytrees — the fixed-shape data unit of few-shot training.

The reference assembles episodes as dicts of torch tensors in DataLoader
workers (datasets/base/ssv2_few_shot.py:202-285).  Here an episode is a
static-shape flax pytree so it can be vmapped/sharded/jitted; a batch of
episodes is the same structure with a leading [E] axis (shard axis for the
``data`` mesh dimension).

Layout: images are NHWC ([.., T, H, W, 3]) — the TPU-native conv layout —
not the reference's NCHW.
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class Episode:
    """One N-way K-shot episode (or a batch with a leading axis).

    support_images: [S, T, H, W, 3] with S = WAY*SHOT (shuffled order)
    support_labels: [S] episode-local labels in [0, WAY)
    real_support_labels: [S] global class ids (index into the text bank)
    target_images: [Q, T, H, W, 3] with Q = WAY*QUERY_PER_CLASS
    target_labels: [Q] episode-local labels
    real_target_labels: [Q] global class ids
    batch_class_list: [WAY] global class ids chosen for this episode
    """

    support_images: jnp.ndarray
    support_labels: jnp.ndarray
    real_support_labels: jnp.ndarray
    target_images: jnp.ndarray
    target_labels: jnp.ndarray
    real_target_labels: jnp.ndarray
    batch_class_list: Optional[jnp.ndarray] = None
    # optional unlabeled clips for semi-supervised episodes (the reference
    # head reads inputs["target_set_weakly"], few_shot.py:2348-2352)
    unlabeled_images: Optional[jnp.ndarray] = None  # [U, T, H, W, 3]

    @property
    def way(self) -> int:
        return int(self.batch_class_list.shape[-1]) if self.batch_class_list is not None else int(self.support_labels.max()) + 1
