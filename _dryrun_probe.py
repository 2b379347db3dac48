"""Stage-timing probe for __graft_entry__.dryrun_multichip phase 1."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
t0 = time.time()


def mark(msg):
    print(f"[{time.time() - t0:7.1f}s] {msg}", flush=True)


import jax

mark(f"jax imported, devices={len(jax.devices())}")
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge
from clip_fsar_tpu.models.builder import build_few_shot_model
from clip_fsar_tpu.parallel.mesh import build_mesh, shard_batch, shard_params
from clip_fsar_tpu.train.loop import build_state
from clip_fsar_tpu.train.optimizer import build_optimizer
from clip_fsar_tpu.train.step import make_train_step

mark("imports done")

n = 8
ways, shot, qpc, frames, res = 3, 1, 1, 2, 32
cfg = ge._cfg("ViT-B/16", frames, res, episodes=n, ways=ways, shot=shot, qpc=qpc)
cfg.TPU.SCAN_LAYERS = True
mark("config loaded")
model = build_few_shot_model(cfg, jax.random.PRNGKey(0))
mark("model built (init + text precompute)")
tx = build_optimizer(cfg, model.variables["params"], name_prefix="head")
mesh = build_mesh(cfg, devices=jax.devices()[:n])
state = shard_params(build_state(cfg, model, tx), mesh)
mark("state sharded")
train_step = jax.jit(make_train_step(model.head, tx, cfg, model.text_train, model.text_test))

rng = np.random.RandomState(1000)
eps = [ge._dummy_episode(rng, ways, shot, qpc, frames, res) for _ in range(n)]
batch = jax.device_get(jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *eps))
batch = shard_batch(batch, mesh)
mark("batch ready")
state, metrics = train_step(state, batch, jnp.float32(1e-4), jax.random.PRNGKey(1))
mark(f"step 1 done loss={float(metrics['loss']):.4f}")
state, metrics = train_step(state, batch, jnp.float32(1e-4), jax.random.PRNGKey(2))
mark(f"step 2 done loss={float(metrics['loss']):.4f}")
