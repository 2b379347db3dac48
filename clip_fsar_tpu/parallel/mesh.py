"""Device mesh + sharding helpers.

Replaces the reference's NCCL/DDP runtime (utils/launcher.py,
utils/distributed.py, models/base/builder.py:69-79) with the JAX
single-controller model: a 1-D ``data`` mesh, episode batches sharded on
their leading axis, parameters replicated.  GSPMD inserts the gradient
psum over ICI — there is no DDP wrapper object, and metric scalars come
back as replicated values instead of all_reduce calls.

The episodic workloads fit one chip each (SURVEY.md §2.3: the reference is
data-parallel only); the mesh is sized by ``TPU.MESH.DATA`` (-1 = all
devices).  Multi-host: call ``jax.distributed.initialize()`` before
building the mesh and the same code spans pods over DCN.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(cfg=None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if cfg is not None and "TPU" in cfg:
        want = int(cfg.TPU.get("MESH", {}).get("DATA", -1) if hasattr(cfg.TPU.get("MESH", {}), "get") else -1)
        if want > 0:
            if want > n:
                raise ValueError(f"TPU.MESH.DATA={want} but only {n} devices present")
            devices = devices[:want]
            n = want
    return Mesh(np.asarray(devices), ("data",))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for episode batches."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """device_put a pytree of [E, ...] arrays with E sharded over 'data'."""
    sh = data_sharding(mesh)
    return jax.device_put(batch, sh)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def check_batch_divisible(episodes_per_step: int, mesh: Mesh) -> None:
    n = mesh.devices.size
    if episodes_per_step % n:
        raise ValueError(
            f"TPU.EPISODES_PER_STEP={episodes_per_step} must be divisible by the "
            f"data-mesh size {n} (each device takes an equal episode slice)"
        )
