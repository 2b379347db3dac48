"""Worker for test_multihost.py::test_two_process_distributed_matches_single_process.

Env: MH_COORD host:port, MH_RANK, MH_WORLD (1 = plain single-process run),
JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_device_count=N.

Runs 3 chained train steps of the tiny flagship config over an 8-global-
device data mesh, each process feeding only its local_episode_range slice,
and prints "LOSSES l0 l1 l2".
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon TPU plugin can override JAX_PLATFORMS from the environment —
# force the CPU platform before any backend is initialized
jax.config.update("jax_platforms", "cpu")

world = int(os.environ.get("MH_WORLD", "1"))
rank = int(os.environ.get("MH_RANK", "0"))
if world > 1:
    jax.distributed.initialize(
        coordinator_address=os.environ["MH_COORD"], num_processes=world, process_id=rank
    )
    # Establish the Gloo collective context NOW, while both processes sit
    # at the same point right after the coordinator rendezvous.  Its
    # creation happens lazily at the first cross-process collective and
    # carries a fixed ~30 s KV deadline; deferring it to the end of the
    # run means minutes of single-core XLA compiles can interleave the
    # two processes far enough apart to blow that deadline
    # ("Gloo context initialization failed: DEADLINE_EXCEEDED",
    # observed round 5 on a 1-core host).
    from jax.experimental import multihost_utils as _mhu

    _mhu.process_allgather(jax.numpy.zeros((1,), jax.numpy.float32))

import jax.numpy as jnp  # noqa: E402

import __graft_entry__ as ge  # noqa: E402
from clip_fsar_tpu.data.loader import build_few_shot_loader  # noqa: E402
from clip_fsar_tpu.models.builder import build_few_shot_model  # noqa: E402
from clip_fsar_tpu.parallel.mesh import (  # noqa: E402
    build_mesh,
    local_episode_range,
    shard_batch,
    shard_params,
)
from clip_fsar_tpu.train.loop import build_state  # noqa: E402
from clip_fsar_tpu.train.optimizer import build_optimizer  # noqa: E402
from clip_fsar_tpu.train.step import make_train_step  # noqa: E402


def main() -> None:
    assert len(jax.devices()) == 8, jax.devices()
    e = 8
    cfg = ge._cfg("ViT-Tiny-Test", frames=2, res=64, episodes=e, ways=3, shot=1, qpc=1)
    cfg.DATA_LOADER.NUM_WORKERS = 2
    mesh = build_mesh(cfg)

    model = build_few_shot_model(cfg, jax.random.PRNGKey(0))
    tx = build_optimizer(cfg, model.variables["params"], name_prefix="head")
    state = shard_params(build_state(cfg, model, tx), mesh)
    train_step = jax.jit(make_train_step(model.head, tx, cfg, model.text_train, model.text_test))

    losses = []
    rng = jax.random.PRNGKey(1)
    ep_range = local_episode_range(e, mesh)
    print(f"rank {rank}/{world}: episode range {ep_range}", flush=True)
    with build_few_shot_loader(cfg, "train", num_steps=3, episodes_per_step=e, episode_range=ep_range) as loader:
        for batch in loader:
            rng, srng = jax.random.split(rng)
            state, metrics = train_step(state, shard_batch(batch, mesh, global_e=e), jnp.float32(1e-4), srng)
            losses.append(float(metrics["loss"]))
    print("LOSSES " + " ".join(f"{l:.6f}" for l in losses), flush=True)


if __name__ == "__main__":
    main()
