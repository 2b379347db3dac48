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

import logging
import time
from typing import Callable, Optional, TypeVar

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

_T = TypeVar("_T")


def retry_transient(fn: Callable[[], _T], what: str, attempts: int = 4, base_delay: float = 5.0) -> _T:
    """Run ``fn`` with bounded exponential-backoff retries on transient
    device ``RESOURCE_EXHAUSTED`` errors.

    On a shared or tunneled chip, another tenant's allocation spike can
    fail a small host->device transfer even though this process's
    steady-state residency fits comfortably (observed on the dev tunnel:
    36 MB batch uploads dying at ~7 GB resident while 20 GiB allocation
    probes succeed minutes later).  Only operations that do NOT consume
    donated buffers may be wrapped — uploads (``shard_batch``,
    ``device_put``) and eager RNG ops, never the jitted train step itself,
    whose donated input state is dead after a partial execution.
    """
    delay = base_delay
    for k in range(attempts):
        try:
            return fn()
        except Exception as e:  # jax surfaces XLA errors via several wrapper types
            if "RESOURCE_EXHAUSTED" not in str(e) or k == attempts - 1:
                raise
            # A deterministic OOM (workload genuinely too big) also
            # matches this string and will eat the full backoff budget
            # before surfacing; the warning states that budget so a
            # stuck log is self-explaining.
            # remaining sleeps: this one (base*2^k) + those of attempts
            # k+1 .. attempts-2 (the final attempt re-raises, no sleep)
            total_backoff = base_delay * (2.0 ** (attempts - 1) - 2.0 ** k)
            logger.warning(
                "transient RESOURCE_EXHAUSTED during %s (attempt %d/%d) — retrying in %.0f s"
                " (≤%.0f s more backoff before a real OOM would surface)",
                what, k + 1, attempts, delay, total_backoff,
            )
            time.sleep(delay)
            delay *= 2.0
    raise AssertionError("unreachable")


def build_mesh(cfg=None, devices=None) -> Mesh:
    """1-D ``data`` mesh by default; set ``TPU.MESH.MODEL > 1`` for a 2-D
    (data, model) mesh — the model axis tensor-shards the CLIP tower
    (see ``sharding_rules``) as scaling headroom beyond the reference's
    data-parallel-only design (SURVEY.md §2.3)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    mesh_cfg = cfg.TPU.get("MESH", {}) if (cfg is not None and "TPU" in cfg) else {}
    get = mesh_cfg.get if hasattr(mesh_cfg, "get") else (lambda *_: -1)
    model = int(get("MODEL", 1) or 1)
    want = int(get("DATA", -1) or -1)
    if model > 1:
        if n % model:
            raise ValueError(f"TPU.MESH.MODEL={model} must divide the device count {n}")
        data = want if want > 0 else n // model
        if data * model > n:
            raise ValueError(f"mesh {data}x{model} needs {data * model} devices, have {n}")
        arr = np.asarray(devices[: data * model]).reshape(data, model)
        return Mesh(arr, ("data", "model"))
    if want > 0:
        if want > n:
            raise ValueError(f"TPU.MESH.DATA={want} but only {n} devices present")
        devices = devices[:want]
    return Mesh(np.asarray(devices), ("data",))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for episode batches."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_episode_range(global_e: int, mesh: Mesh) -> tuple:
    """The contiguous [lo, hi) slice of the global episode batch owned by
    THIS process (keyed on jax.process_index()).  Single-process runs own
    the whole batch.  This is what lets each host of a multi-host job feed
    only its local episodes (replaces the reference's per-rank DataLoader
    sharding, utils/launcher.py:55-57)."""
    if jax.process_count() == 1:
        return 0, int(global_e)
    sh = data_sharding(mesh)
    pi = jax.process_index()
    rows = [
        idx[0]
        for dev, idx in sh.devices_indices_map((int(global_e),)).items()
        if dev.process_index == pi
    ]
    if not rows:
        return 0, 0  # this process holds no data-axis shard (model-only host)
    lo = min(r.start or 0 for r in rows)
    hi = max(int(global_e) if r.stop is None else r.stop for r in rows)
    covered = sorted(set((r.start or 0, int(global_e) if r.stop is None else r.stop) for r in rows))
    span = sum(b - a for a, b in covered)
    if span != hi - lo:
        raise ValueError(f"non-contiguous local episode shards {covered} for process {pi}")
    return lo, hi


def shard_batch(batch, mesh: Mesh, global_e: Optional[int] = None):
    """Place a pytree of episode arrays on the mesh with the leading axis
    sharded over 'data'.

    Single-process: ``batch`` holds the full [E, ...] arrays -> device_put.
    Multi-process: ``batch`` holds only THIS process's [hi-lo, ...] rows
    (see local_episode_range) and ``global_e`` is the global batch size;
    the global array is assembled with
    jax.make_array_from_process_local_data without any cross-host copy.
    """
    sh = data_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(batch, sh)
    if global_e is None:
        raise ValueError("multi-process shard_batch needs global_e (the global episode count)")

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sh, x, (int(global_e),) + x.shape[1:])

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


# ---------------------------------------------------------------------------
# tensor-parallel param placement (optional 'model' mesh axis)
# ---------------------------------------------------------------------------


def _tp_spec_for(path_parts, shape) -> P:
    """Megatron-style sharding of transformer blocks: column-parallel
    qkv/c_fc (output dim over 'model'), row-parallel out_proj/c_proj
    (input dim over 'model'); everything else replicated.  GSPMD inserts
    the all-reduce after each row-parallel matmul over ICI.  Scan-over-
    layers stacks per-layer params with a leading depth axis ([L, in,
    out] kernels, [L, out] biases) — the same rules apply one axis later,
    so TP keeps working under TPU.SCAN_LAYERS."""
    parts = [p.lower() for p in path_parts]
    leaf = parts[-1]
    module = parts[-2] if len(parts) >= 2 else ""
    col = module in ("q_proj", "k_proj", "v_proj", "mlp_c_fc", "to_q", "to_k", "to_v", "fc1", "to_qkv")
    row = module in ("out_proj", "mlp_c_proj", "to_out", "fc2", "proj")
    if leaf == "kernel" and len(shape) in (2, 3):
        lead = (None,) * (len(shape) - 2)  # depth axis under scan_layers
        if col:
            return P(*lead, None, "model")
        if row:
            return P(*lead, "model", None)
    if leaf == "bias" and col and len(shape) in (1, 2):
        return P(*((None,) * (len(shape) - 1)), "model")
    return P()


def shard_params(tree, mesh: Mesh):
    """Place a param/state pytree on the mesh: tensor-sharded transformer
    matmuls over the 'model' axis when present, replicated otherwise."""
    if "model" not in mesh.axis_names:
        return replicate(tree, mesh)

    def place(path, x):
        parts = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
        spec = _tp_spec_for(parts, getattr(x, "shape", ()))
        # shard only when the dimension divides evenly; replicate otherwise
        ax_size = mesh.shape["model"]
        for dim, name in enumerate(spec):
            if name == "model" and x.shape[dim] % ax_size:
                spec = P()
                break
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, tree)


def data_axis_size(mesh: Mesh) -> int:
    """Size of the 'data' axis — batches shard over it alone; with a 2-D
    (data, model) mesh the model axis must NOT inflate the batch."""
    return int(mesh.shape["data"]) if "data" in mesh.axis_names else mesh.devices.size


def round_to_data_mesh(episodes_per_step: int, mesh: Mesh) -> int:
    """Round UP to a data-axis multiple (each device takes an equal slice;
    rounding down would silently shrink the configured batch)."""
    n = data_axis_size(mesh)
    return max(-(-int(episodes_per_step) // n), 1) * n


def check_batch_divisible(episodes_per_step: int, mesh: Mesh) -> None:
    n = data_axis_size(mesh)
    if episodes_per_step % n:
        raise ValueError(
            f"TPU.EPISODES_PER_STEP={episodes_per_step} must be divisible by the "
            f"data-mesh size {n} (each device takes an equal episode slice)"
        )


def maybe_init_distributed(cfg=None) -> bool:
    """Multi-host initialization (replaces reference utils/launcher.py:9-36
    + PAI env parsing :21-27): when a multi-process environment is
    detected (JAX coordinator vars, or the reference's RANK/WORLD_SIZE
    convention with a coordinator address), call
    ``jax.distributed.initialize()`` so ``jax.devices()`` spans all hosts
    and the same mesh code runs over ICI/DCN.  Single-host runs are a
    no-op.  Returns True when distributed mode was initialized."""
    import os

    # read the environment BEFORE touching any jax API: jax.process_count()
    # would initialize the local backend and make a later
    # jax.distributed.initialize() fail ("must be called before any JAX
    # operations")
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS")
    world = int(os.environ.get("WORLD_SIZE", os.environ.get("JAX_NUM_PROCESSES", "1")) or "1")
    rank = int(os.environ.get("RANK", os.environ.get("JAX_PROCESS_ID", "0")) or "0")
    pai = bool(cfg.get("PAI", False)) if cfg is not None else False
    if world > 1 and (coord or pai):
        if not coord:
            raise RuntimeError(
                "multi-process run requested (WORLD_SIZE>1 with PAI=true) but no "
                "coordinator address: set JAX_COORDINATOR_ADDRESS (or COORDINATOR_ADDRESS)"
            )
        try:
            already = jax.distributed.is_initialized()  # jax>=0.4.34
        except AttributeError:
            already = False
        if not already:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=world,
                process_id=rank,
            )
        if cfg is not None:
            # reference cfg bookkeeping (launcher.py:21-27)
            cfg.SHARD_ID = rank
            cfg.NUM_SHARDS = world
        return True
    return False
