"""Microbenchmark: raw CLIP ViT-B/16 visual tower throughput (frames/s),
forward-only and forward+backward, isolated from the episodic head/step.
Attribution tool for PERFORMANCE.md — not part of the framework."""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from clip_fsar_tpu.models.clip.model import VisionTransformer


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=480)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--scan-layers", action="store_true")
    p.add_argument("--mode", default="both", choices=["fwd", "bwd", "both"])
    args = p.parse_args()

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    vit = VisionTransformer(
        input_resolution=224, patch_size=16, width=768, layers=12, heads=12,
        output_dim=512, dtype=dtype, remat=args.remat, scan_layers=args.scan_layers,
    )
    x = jnp.asarray(np.random.RandomState(0).rand(args.frames, 224, 224, 3), dtype)
    params = vit.init(jax.random.PRNGKey(0), x[:2])

    # every step consumes the previous step's scalar output so the
    # executions form a dependency chain: through the axon tunnel, neither
    # block_until_ready nor device_get reliably serializes independent
    # dispatches, but a data dependency always does (same trick bench.py
    # relies on via the train-state carry).
    fwd = jax.jit(
        lambda p_, x_, c: vit.apply(p_, x_ + (c * 0).astype(x_.dtype)).astype(jnp.float32).sum()
    )

    def loss(p_, x_, c):
        return vit.apply(p_, x_ + (c * 0).astype(x_.dtype)).astype(jnp.float32).sum()

    def bwd_chain(p_, x_, c):
        val, grads = jax.value_and_grad(loss)(p_, x_, c)
        # fold EVERY grad leaf into the chained scalar so no weight-grad
        # matmul is dead code (grad wrt c alone would constant-fold to zero)
        total = sum(g.astype(jnp.float32).sum() for g in jax.tree_util.tree_leaves(grads))
        return val + total

    bwd = jax.jit(bwd_chain)

    results = {}
    for name, fn, out_of in (("fwd", fwd, None), ("fwd+bwd", bwd, None)):
        if args.mode != "both" and not name.startswith(args.mode):
            continue
        c = jnp.float32(0.0)
        c = fn(params, x, c)
        jax.block_until_ready(c)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            c = fn(params, x, c)
        jax.block_until_ready(c)
        float(jax.device_get(c))
        dt = time.perf_counter() - t0
        fps = args.frames * args.steps / dt
        # ViT-B/16 @224: ~17.6 GFLOP/frame fwd; bwd ~2x fwd
        mult = 1.0 if name == "fwd" else 3.0
        tflops = fps * 17.6e9 * mult / 1e12
        results[name] = (fps, tflops)
        print(f"{name:8s} frames={args.frames} remat={args.remat} "
              f"{fps:9.1f} frames/s  ~{tflops:6.1f} TFLOP/s useful  "
              f"({100 * tflops / 197:4.1f}% of v5e peak)")
    return results


if __name__ == "__main__":
    main()
