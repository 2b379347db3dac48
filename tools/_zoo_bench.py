"""Video-backbone zoo throughput on the real chip: classification train
step (fwd+bwd+adam) clips/s per backbone preset.

Attribution tool for PERFORMANCE.md — chains the train state through
steps so the axon tunnel cannot overlap executions (see bench.py note).

  python _zoo_bench.py [--backbones tada2d,timesformer,...] [--batch 16]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import yaml

REPO = os.path.dirname(os.path.abspath(__file__))


def make_cfg(preset: str, batch: int, frames: int, res: int):
    from clip_fsar_tpu.config import Config, load_config
    from clip_fsar_tpu.config.config import merge_into

    base = load_config(os.path.join(REPO, "configs/projects/CLIPFSAR/hmdb51/CLIPFSAR_HMDB51_1shot_v1.yaml")).to_dict()
    with open(os.path.join(REPO, f"configs/pool/backbone/{preset}.yaml")) as f:
        merge_into(base, yaml.safe_load(f))
    cfg = Config(base)
    cfg.TASK_TYPE = "classification"
    cfg.TRAIN.BATCH_SIZE = batch
    cfg.DATA.NUM_INPUT_FRAMES = frames
    cfg.DATA.TRAIN_CROP_SIZE = res
    cfg.VIDEO.HEAD.NUM_CLASSES = 174
    return cfg


def bench_one(preset: str, batch: int, frames: int, res: int, steps: int) -> float:
    import jax
    import jax.numpy as jnp

    from clip_fsar_tpu.train.classification import _build, make_classification_train_step
    from clip_fsar_tpu.train.optimizer import build_optimizer
    from clip_fsar_tpu.train.state import TrainState

    cfg = make_cfg(preset, batch, frames, res)
    model, variables = _build(cfg)
    tx = build_optimizer(cfg, variables["params"])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        opt_state=tx.init(variables["params"]),
        batch_stats=variables.get("batch_stats"),
        ema_params=None,
    )
    step = jax.jit(make_classification_train_step(model, tx, cfg), donate_argnums=0)

    rng = np.random.RandomState(0)
    x = jnp.asarray((rng.rand(batch, frames, res, res, 3) * 255).astype(np.uint8))
    y = jnp.asarray(rng.randint(0, 174, (batch,)).astype(np.int32))
    lr = jnp.float32(1e-3)
    key = jax.random.PRNGKey(0)

    state, m = step(state, x, y, lr, key)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, x, y, lr, key)
    jax.block_until_ready(m["loss"])
    float(jax.device_get(m["loss"]))
    dt = time.perf_counter() - t0
    return batch * steps / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backbones", default="tada2d,timesformer,slowfast_8x8,r2p1d,s3dg,csn,r2d3ds")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--res", type=int, default=224)
    p.add_argument("--steps", type=int, default=6)
    args = p.parse_args()
    for preset in args.backbones.split(","):
        try:
            cps = bench_one(preset, args.batch, args.frames, args.res, args.steps)
            print(f"{preset:16s} {cps:8.2f} clips/s/chip  (B={args.batch}, {args.frames}f@{args.res})")
        except Exception as e:
            print(f"{preset:16s} FAIL {str(e)[:140]}")


if __name__ == "__main__":
    main()
