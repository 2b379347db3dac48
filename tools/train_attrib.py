#!/usr/bin/env python
"""Train-path throughput attribution + pixel-vs-bank A/B (VERDICT r4 #2).

The round-4 protocol run sustained ~1.0 eps/s while the device bench
measured 7.65 eps/s on the same RN50 step — this tool attributes that
gap with the same rigor as the round-3 eval-path attack, then measures
the TPU.TRAIN_FRAME_BANK fix:

  phase "pixel":  real train loader (cached_opencv) -> per-step wall
                  split into host-assembly / H2D-upload / device-step
                  (the three serialized in the round-4 loop), plus the
                  loop-overlap (pipelined) wall rate
  phase "bank":   TRAIN_FRAME_BANK=true -> index-only feed, device-side
                  crop/flip, same measurements

Emits ONE JSON line per phase and a final summary line to stdout; run it
on the real chip from the repo root:

  python tools/train_attrib.py --cfg configs/projects/CLIPFSAR/hmdb51/CLIPFSAR_HMDB51_1shot_v1.yaml \
      --steps 30 [--skip-pixel] [--bank-frames 8] [KEY VALUE ...]

Reference hot loop being attributed: runs/train_net_few_shot.py:60-152.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_phase(cfg, bank_mode: bool):
    """Build model/optimizer/step (and bank context) ONCE per phase —
    a tunnel-bound model build costs minutes and must not be repeated
    per measurement."""
    import jax

    from clip_fsar_tpu.models.builder import build_few_shot_model
    from clip_fsar_tpu.parallel.mesh import build_mesh
    from clip_fsar_tpu.train.loop import build_state
    from clip_fsar_tpu.train.optimizer import build_optimizer
    from clip_fsar_tpu.train.step import make_train_step

    mesh = build_mesh(cfg)
    t0 = time.perf_counter()
    model = build_few_shot_model(cfg, jax.random.PRNGKey(0), flow="train")
    tx = build_optimizer(cfg, model.variables["params"], name_prefix="head")
    print(f"[attrib] model built in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    wrap = None
    if bank_mode:
        from clip_fsar_tpu.data.frame_bank import TrainIndexEpisodeSampler, make_bank_train_context

        ctx = make_bank_train_context(cfg, model, mesh, tx)
        wrap = lambda s: TrainIndexEpisodeSampler(s, ctx.table)  # noqa: E731
        step_fn = lambda s, b, lr, r: ctx.train_step(s, b, lr, r, ctx.bank)  # noqa: E731
    else:
        step_fn = jax.jit(
            make_train_step(model.head, tx, cfg, model.text_train, model.text_test), donate_argnums=0
        )

    # the step donates its input state, so each measurement needs a fresh
    # one — keep a HOST snapshot (the device buffers of build_state are
    # consumed by the first donation) and re-upload per measurement
    host_state = jax.device_get(build_state(cfg, model, tx))

    def fresh_state():
        return jax.device_put(host_state)

    return mesh, step_fn, wrap, fresh_state


def measure_serialized(cfg, mesh, step_fn, wrap, fresh_state, steps: int):
    """Per-phase wall split: host assembly / H2D upload / device step,
    each fenced so the phases don't overlap."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from clip_fsar_tpu.data.loader import build_few_shot_loader
    from clip_fsar_tpu.parallel.mesh import shard_batch

    state = fresh_state()
    e = int(cfg.TPU.get("EPISODES_PER_STEP", 1))
    host_s, h2d_s, dev_s = [], [], []
    rng = jax.random.PRNGKey(1)
    bytes_per_batch = None
    t0 = time.perf_counter()
    with build_few_shot_loader(
        cfg, "train", num_steps=steps + 2, episodes_per_step=e, sampler_wrap=wrap
    ) as loader:
        it = iter(loader)
        batch = next(it)  # warmup: first step compiles
        rng, r = jax.random.split(rng)
        state, m = step_fn(state, shard_batch(batch, mesh), jnp.float32(1e-6), r)
        jax.block_until_ready(m)
        print(f"[attrib] warmup done at {time.perf_counter() - t0:.1f}s", file=sys.stderr)
        for k in range(steps + 1):
            ta = time.perf_counter()
            batch = next(it)  # host assembly (prefetch threads may hide some)
            tb = time.perf_counter()
            dev = shard_batch(batch, mesh)
            jax.block_until_ready(dev)  # isolate H2D from the step
            tc = time.perf_counter()
            rng, r = jax.random.split(rng)
            state, m = step_fn(state, dev, jnp.float32(1e-6), r)
            jax.block_until_ready(m)  # serialize: attribute, don't pipeline
            td = time.perf_counter()
            if k == 0:
                continue  # settle caches
            if bytes_per_batch is None:
                bytes_per_batch = sum(
                    x.nbytes for x in jax.tree_util.tree_leaves(batch) if hasattr(x, "nbytes")
                )
            host_s.append(tb - ta)
            h2d_s.append(tc - tb)
            dev_s.append(td - tc)

    med = lambda xs: float(np.median(xs))  # noqa: E731
    tot = med(host_s) + med(h2d_s) + med(dev_s)
    return {
        "steps": steps,
        "episodes_per_step": e,
        "host_assembly_ms": round(med(host_s) * 1e3, 1),
        "h2d_upload_ms": round(med(h2d_s) * 1e3, 1),
        "device_step_ms": round(med(dev_s) * 1e3, 1),
        "serialized_eps_per_sec": round(e / tot, 3),
        "bytes_per_batch": bytes_per_batch,
        "upload_MB_per_s": round(bytes_per_batch / max(med(h2d_s), 1e-9) / 1e6, 1) if bytes_per_batch else None,
    }


def measure_pipelined(cfg, mesh, step_fn, wrap, fresh_state, steps: int):
    """The real loop overlap (async dispatch, as train_few_shot runs it):
    wall rate over `steps` without per-phase serialization."""
    import jax
    import jax.numpy as jnp

    from clip_fsar_tpu.data.loader import build_few_shot_loader
    from clip_fsar_tpu.parallel.mesh import shard_batch

    state = fresh_state()
    e = int(cfg.TPU.get("EPISODES_PER_STEP", 1))
    rng = jax.random.PRNGKey(2)
    t_start = None
    n = 0
    with build_few_shot_loader(
        cfg, "train", num_steps=steps + 1, episodes_per_step=e, sampler_wrap=wrap
    ) as loader:
        for k, batch in enumerate(loader):
            rng, r = jax.random.split(rng)
            state, m = step_fn(state, shard_batch(batch, mesh), jnp.float32(1e-6), r)
            if k == 0:  # compile/warm step excluded from the window
                jax.block_until_ready(m)
                t_start = time.perf_counter()
            else:
                n += 1
        jax.block_until_ready(m)
    return round(n * e / (time.perf_counter() - t_start), 3)


def run_phase(cfg, bank_mode: bool, steps: int):
    mesh, step_fn, wrap, fresh_state = build_phase(cfg, bank_mode)
    r = measure_serialized(cfg, mesh, step_fn, wrap, fresh_state, steps)
    r["phase"] = "bank" if bank_mode else "pixel"
    r["pipelined_eps_per_sec"] = measure_pipelined(cfg, mesh, step_fn, wrap, fresh_state, steps)
    return r


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--skip-pixel", action="store_true")
    p.add_argument("--skip-bank", action="store_true")
    p.add_argument("--bank-frames", type=int, default=8)
    p.add_argument("opts", nargs="*")
    args = p.parse_args()

    from clip_fsar_tpu.config.config import load_config

    results = []
    if not args.skip_pixel:
        cfg = load_config(args.cfg, list(args.opts))
        r = run_phase(cfg, bank_mode=False, steps=args.steps)
        print(json.dumps(r))
        results.append(r)
    if not args.skip_bank:
        cfg = load_config(
            args.cfg,
            list(args.opts)
            + ["TPU.TRAIN_FRAME_BANK", "true", "TPU.TRAIN_FRAME_BANK_FRAMES", str(args.bank_frames)],
        )
        r = run_phase(cfg, bank_mode=True, steps=args.steps)
        print(json.dumps(r))
        results.append(r)
    if len(results) == 2:
        print(
            json.dumps(
                {
                    "summary": "train-path pixel-vs-bank A/B",
                    "speedup_serialized": round(
                        results[1]["serialized_eps_per_sec"] / results[0]["serialized_eps_per_sec"], 2
                    ),
                    "speedup_pipelined": round(
                        results[1]["pipelined_eps_per_sec"] / results[0]["pipelined_eps_per_sec"], 2
                    ),
                }
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
