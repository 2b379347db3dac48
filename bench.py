#!/usr/bin/env python
"""Benchmark: episodic training throughput of the flagship CLIP-FSAR model.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Protocol: 5-way 1-shot 5-query episodes, 8 frames @ 224x224 (the published
eval protocol, BASELINE.md), CLIP ViT-B/16 tower, full train step
(forward+backward+adam) on synthetic device-resident episodes — measuring
the compute path, not the host pipeline (bench the loader separately with
--loader).

vs_baseline: the reference repo publishes no throughput (BASELINE.md);
the divisor is BASELINE_EPS_PER_SEC = 2.0, the midpoint of the analytic
derivation in BASELINE.md §"A100 reference throughput": eager-fp32
PyTorch (no AMP/compile, few_shot.py:884) on A100 TF32 at 30-40 % of
156 TFLOP/s over 25.3 TFLOP/episode -> 1.8-2.5 eps/s.  Replace with a
measured number when an A100 run exists.  The assumption-free number is
mfu_useful (fraction of the 7.8 eps/s v5e roofline).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_EPS_PER_SEC = 2.0  # analytic A100 eager-fp32 reference (BASELINE.md derivation)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="tiny model on CPU (smoke)")
    p.add_argument("--eval", action="store_true", help="benchmark the eval step instead of train")
    p.add_argument("--episodes", type=int, default=0, help="episodes per step (0 = auto)")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--backbone", default="ViT-B/16")
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--res", type=int, default=224)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--no-remat", action="store_true")
    p.add_argument("--remat-policy", default="", choices=["", "nothing", "dots"])
    p.add_argument("--attention", default="", choices=["", "xla", "pallas"])
    p.add_argument("--layout", default="", choices=["", "split", "unsplit", "fused"], help="attention head layout")
    p.add_argument("--dtype", default="", choices=["", "bfloat16", "float32"])
    p.add_argument("--softmax-dtype", default="", choices=["", "bfloat16", "float32"])
    p.add_argument("--scan-layers", action="store_true", help="lax.scan over transformer depth")
    p.add_argument("--bn-freeze", action="store_true", help="BN.FREEZE: run BatchNorm on running stats (diagnostic: isolates the BN-statistics bandwidth tax on RN towers)")
    p.add_argument("--frame-chunks", type=int, default=0, help="sequential rematted tower chunks (TPU.FRAME_CHUNKS)")
    p.add_argument("--profile", default="", help="write a jax.profiler trace to this dir")
    p.add_argument("--loader", action="store_true", help="benchmark the host episode pipeline instead of the device step")
    p.add_argument("--real", action="store_true", help="with --loader: real mp4 decode (+ frame cache) instead of the synthetic decoder")
    p.add_argument("--way", type=int, default=5)
    p.add_argument("--shot", type=int, default=1, help="support shots (5 = the BASELINE 5-shot protocol)")
    p.add_argument("--qpc", type=int, default=5, help="queries per class")
    p.add_argument(
        "--no-rn50",
        action="store_true",
        help="skip the RN50 sub-measurements the default run embeds in detail.rn50 "
        "(RN50 is the reference YAMLs' default backbone; VERDICT r2 item 3)",
    )
    args = p.parse_args()

    if args.loader:
        return bench_loader(args)

    # The axon tunnel can wedge a device RPC indefinitely (observed: a
    # bench identical to one that just ran in ~3 min sat blocked for 25
    # with ~0 CPU).  The unattended driver bench must always land a line,
    # so run the measurement in a child with a hard timeout and one retry
    # (the retry drops the RN50 extras to stay cheap).
    if os.environ.get("CLIP_FSAR_BENCH_SUPERVISED") != "1" and not args.quick:
        return _supervised(args)

    if args.quick:
        # force CPU even when the shell pins JAX_PLATFORMS to the TPU
        # plugin — the smoke bench must never touch (or hang on) the tunnel
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        args.backbone, args.res, args.frames = "ViT-Tiny-Test", 64, 4
        args.steps = min(args.steps, 3)
    import jax
    import jax.numpy as jnp
    import numpy as np

    t_start = time.perf_counter()
    watch = {"t": t_start, "deadline": 300.0}

    def _mark(msg, deadline=300.0):
        # stderr progress marks: the axon tunnel can wedge single device
        # RPCs for tens of minutes — these make a wedge attributable and
        # arm the watchdog below with a per-phase deadline
        watch["t"] = time.perf_counter()
        watch["deadline"] = deadline
        sys.stderr.write(f"bench[{watch['t'] - t_start:6.1f}s] {msg}\n")
        sys.stderr.flush()

    if not args.quick:
        # a wedged tunnel RPC blocks with ~0 CPU and never returns; exit
        # fast so the supervisor's retry recovers in minutes, not the
        # outer timeout
        import threading

        def _watchdog():
            while True:
                time.sleep(10)
                if time.perf_counter() - watch["t"] > watch["deadline"]:
                    sys.stderr.write(
                        f"bench watchdog: no progress for {watch['deadline']:.0f}s — "
                        "assuming a wedged device RPC, exiting for retry\n"
                    )
                    sys.stderr.flush()
                    os._exit(57)

        threading.Thread(target=_watchdog, daemon=True).start()

    from __graft_entry__ import _cfg, _dummy_episode
    from clip_fsar_tpu.models.builder import build_few_shot_model
    from clip_fsar_tpu.parallel.mesh import build_mesh, replicate, shard_batch
    from clip_fsar_tpu.train.loop import build_state
    from clip_fsar_tpu.train.optimizer import build_optimizer
    from clip_fsar_tpu.train.step import make_eval_step, make_train_step

    ways, shot, qpc = args.way, args.shot, args.qpc
    n_dev = len(jax.devices())
    # E=1/chip is the measured sweet spot for ViT-B/16 train: at E=2 the
    # packed-QKV residuals (~436 MB/layer) pressure HBM enough that XLA
    # auto-remats fc1/qkv in backward (+16% executed FLOPs, .remat
    # fusions in the trace) — 4.60 eps/s at E=1 vs 4.35 at E=2.  One
    # 240-frame episode already fills the MXU; eval (no bwd residuals)
    # still wants E=8.
    episodes = args.episodes or (n_dev if not args.eval else 8 * n_dev)
    episodes = max(episodes // n_dev, 1) * n_dev

    cfg = _cfg(args.backbone, args.frames, args.res, episodes, ways=ways, shot=shot, qpc=qpc)
    # default: NO remat — with state donation ViT-B/16 train fits at E=2
    # and runs ~5% faster than the remat path (PERFORMANCE.md); the OOM
    # fallback below turns remat on before shrinking the episode batch
    if args.remat:
        cfg.TPU.REMAT = True
    if args.no_remat:
        cfg.TPU.REMAT = False
    if args.remat_policy:
        cfg.TPU.REMAT_POLICY = args.remat_policy
    if args.attention:
        cfg.TPU.PALLAS_ATTENTION = args.attention == "pallas"
    if args.layout:
        cfg.TPU.ATTENTION_LAYOUT = args.layout
    if args.dtype:
        cfg.TPU.COMPUTE_DTYPE = args.dtype
    if args.softmax_dtype:
        cfg.TPU.SOFTMAX_DTYPE = args.softmax_dtype
    if args.scan_layers:
        cfg.TPU.SCAN_LAYERS = True
    if args.bn_freeze:
        cfg.BN.FREEZE = True
    if args.frame_chunks:
        cfg.TPU.FRAME_CHUNKS = args.frame_chunks
    mesh = build_mesh(cfg)

    # 600 s: ViT-L/14@336px flax init takes ~250-320 s on a 1-core host —
    # the default 300 s deadline false-positives on the largest tower
    _mark("building model", deadline=600.0)
    model = build_few_shot_model(cfg, jax.random.PRNGKey(0))
    # 600 s for the NEXT phase (state init + batch upload): a 336px episode
    # batch is ~160 MB and the dev tunnel has been observed near ~1 MB/s on
    # bad days — the 300 s default killed healthy ViT-L sweep configs
    # during the upload (r5 sweep, c24 runs)
    _mark("model built", deadline=600.0)
    tx = build_optimizer(cfg, model.variables["params"], name_prefix="head")
    state = replicate(build_state(cfg, model, tx), mesh)

    rng = np.random.RandomState(0)
    eps = [_dummy_episode(rng, ways, shot, qpc, args.frames, args.res) for _ in range(episodes)]
    batch = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *[jax.device_get(e) for e in eps])
    # uint8 on host -> device, like the real pipeline
    batch = batch.replace(
        support_images=(batch.support_images * 255).astype(np.uint8),
        target_images=(batch.target_images * 255).astype(np.uint8),
    )
    batch = shard_batch(batch, mesh)
    _mark("batch on device")

    frames_per_episode = (ways * shot + ways * qpc) * args.frames

    if args.eval:
        step_fn = jax.jit(make_eval_step(model.head, cfg, model.text_train, model.text_test))
        variables = replicate(model.variables, mesh)

        def run_once(block=True):
            # eval dispatches are independent (no state carried), so the
            # per-step sync must stay — unchained dispatches through the
            # axon tunnel overlap and wall-clock lies (PERFORMANCE.md)
            out = step_fn(variables, batch)
            float(np.asarray(jax.device_get(out["top1_correct"])).sum())
    else:
        # donate the state like the real training loop (train/loop.py) does —
        # without donation XLA keeps old+new optimizer state live (~3 extra
        # param-sized buffers) and copies instead of updating in place
        train_step = jax.jit(
            make_train_step(model.head, tx, cfg, model.text_train, model.text_test), donate_argnums=0
        )
        rng_key = jax.random.PRNGKey(0)
        lr = jnp.float32(1e-5)
        state_box = [state]

        def run_once(block=True):
            new_state, metrics = train_step(state_box[0], batch, lr, rng_key)
            state_box[0] = new_state
            if block:
                # per-step sync: needed around compiles/profiling, but NOT
                # inside the timing loop — steps chain through the donated
                # state, so async dispatch measures truthfully (see
                # PERFORMANCE.md "Timing through the axon tunnel") and the
                # per-step host/tunnel round-trip (~29 ms here) is
                # pipelined away like a real training loop would.  The
                # fence is a scalar device_get, not block_until_ready —
                # through the axon tunnel the latter can return before the
                # device work ran (measured in the kernel micro-bench).
                float(jax.device_get(new_state.params["scale"])[0])

    # warmup (compile); fall back to fewer episodes per step on OOM so the
    # unattended end-of-round bench always produces a number
    try:
        _mark("warmup compile+run", deadline=900.0)
        run_once()
        _mark("warmup done")
    except Exception as e:
        oom = "RESOURCE_EXHAUSTED" in str(e) or "Ran out of memory" in str(e) or "ResourceExhausted" in str(e)
        # EFFECTIVE remat (the builder resolves "auto" per tower depth) —
        # retrying with --remat when auto already enabled it would re-run
        # the identical graph into the same OOM
        remat_on = bool(getattr(model.head, "remat", cfg.TPU.get("REMAT", False) is True))
        chunks = int(cfg.TPU.get("FRAME_CHUNKS", 1))
        is_vit = args.backbone.startswith("ViT")
        if not oom or (remat_on and episodes <= n_dev and (chunks >= 16 or not is_vit)):
            raise
        # fallback chain: remat (keeps the batch) -> shrink the episode
        # batch -> frame-chunk the tower (ViT only) — the unattended
        # end-of-round bench must always land a number
        argv, skip = [sys.argv[0]], False
        drop = {"--episodes", "--remat", "--no-remat", "--frame-chunks"}
        for a in sys.argv[1:]:
            if skip:
                skip = False
                continue
            if a in ("--episodes", "--frame-chunks"):
                skip = True
                continue
            if a.startswith("--episodes=") or a.startswith("--frame-chunks=") or a in drop:
                continue
            argv.append(a)
        if not remat_on:
            sys.stderr.write(f"OOM at {episodes} episodes/step without remat — retrying with remat\n")
            retry = argv + ["--remat", "--episodes", str(episodes)]
        elif episodes > n_dev:
            sys.stderr.write(f"OOM at {episodes} episodes/step — retrying at {n_dev}\n")
            retry = argv + ["--remat", "--episodes", str(n_dev)]
        else:
            next_chunks = max(chunks * 4, 4)
            sys.stderr.write(f"OOM at {episodes} episodes/step with remat — retrying with {next_chunks} frame chunks\n")
            retry = argv + ["--remat", "--episodes", str(episodes), "--frame-chunks", str(next_chunks)]
        sys.stderr.flush()
        # exec, don't recurse: an in-process retry OOMs immediately because
        # this frame still pins the failed attempt's device buffers (model,
        # state, batch) while the retry builds its own
        os.execv(sys.executable, [sys.executable, os.path.abspath(__file__)] + retry[1:])
    for _ in range(1):
        run_once()
    if args.profile:
        with jax.profiler.trace(args.profile):
            run_once()
    _mark("timing loop", deadline=600.0)
    t0 = time.perf_counter()
    for _ in range(args.steps - 1):
        run_once(block=False)
    run_once(block=True)  # fence; train steps chain through donated state
    dt = time.perf_counter() - t0
    _mark(f"timing done ({dt:.2f}s)")

    eps_per_sec = episodes * args.steps / dt
    eps_per_sec_per_chip = eps_per_sec / n_dev
    frames_per_sec = eps_per_sec * frames_per_episode

    # MFU from the compiled HLO's own flop count (not an analytic guess).
    # NOTE on conventions: published "ViT-B/16 = 17.6 GFLOPs" counts
    # multiply-accumulates; the hardware executes ~35.2 GFLOP per frame
    # forward.  mfu below = HLO-counted executed FLOPs vs chip peak;
    # mfu_useful = analytic useful FLOPs (fwd+2x bwd, no remat recompute).
    mfu = None
    mfu_useful = None
    gfpf = _tower_gflops_per_frame(args.backbone, args.res)
    if gfpf:
        useful_tflops = frames_per_sec * gfpf * 1e9 * (1.0 if args.eval else 3.0) / 1e12
        mfu_useful = round(useful_tflops / 197.0 / n_dev, 4)
    step_gflops = None
    try:
        from clip_fsar_tpu.utils.misc import compiled_stats

        if args.eval:
            stats = compiled_stats(step_fn, variables, batch)
        else:
            stats = compiled_stats(train_step, state_box[0], batch, lr, rng_key)
        step_gflops = stats.get("gflops")
        if step_gflops:
            peak_tflops = {"TPU v5 lite": 197.0, "TPU v4": 275.0}.get(
                getattr(jax.devices()[0], "device_kind", ""), None
            ) or (197.0 if jax.devices()[0].platform != "cpu" else None)
            if peak_tflops:
                achieved_tflops = step_gflops / 1e3 * (args.steps * 1.0) / dt / n_dev
                mfu = round(achieved_tflops / peak_tflops, 4)
    except Exception:
        pass

    # The shipped YAMLs default to the RN50 tower (reference
    # CLIPFSAR_HMDB51_1shot_v1.yaml:79), so the driver-run default bench
    # also reports it: run train+eval RN50 sub-benches in subprocesses
    # (fresh jit caches, same measurement path) and fold their numbers
    # into detail.rn50 — output stays ONE JSON line.
    rn50 = None
    if args.backbone == "ViT-B/16" and not (args.eval or args.quick or args.no_rn50):
        _mark("rn50 sub-benches", deadline=2000.0)
        rn50 = _rn50_detail(args.steps)
        _mark("rn50 done")

    mode = "eval" if args.eval else "train"
    metric = f"clipfsar_{args.backbone.replace('/', '')}_{mode}_episodes_per_sec_per_chip"
    result = {
        "metric": metric,
        "value": round(eps_per_sec_per_chip, 4),
        "unit": "episodes/s/chip",
        "vs_baseline": round(eps_per_sec_per_chip / BASELINE_EPS_PER_SEC, 4),
        "detail": {
            "episodes_per_step": episodes,
            "devices": n_dev,
            "steps": args.steps,
            "frames_per_sec": round(frames_per_sec, 1),
            "frames_per_episode": frames_per_episode,
            "backbone": args.backbone,
            "step_gflops": step_gflops,
            "mfu": mfu,
            "mfu_useful": mfu_useful,
            "baseline_note": f"analytic A100 eager-fp32 reference {BASELINE_EPS_PER_SEC} eps/s (BASELINE.md derivation: TF32 156 TFLOP/s x 30-40% / 25.3 TFLOP/episode)",
        },
    }
    if rn50:
        result["detail"]["rn50"] = rn50
    elif args.backbone == "ViT-B/16" and not (args.eval or args.quick):
        # --no-rn50 retry (or a failed sub-bench): degrade to the last
        # SUCCESSFUL rn50 measurement, tagged stale, rather than to absent
        # (VERDICT r3 weak #2 — the recorded artifact lost all RN50
        # evidence when attempt 1 wedged on the tunnel)
        cached = _rn50_cached()
        if cached:
            result["detail"]["rn50"] = cached
    print(json.dumps(result))
    return 0


_RN50_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output", "bench_rn50_cache.json")
# committed fallback: output/ is gitignored and wiped between rounds, so a
# round whose every bench attempt wedges before the RN50 sub-benches still
# degrades to the last committed measurement instead of to absent
_RN50_CACHE_COMMITTED = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools", "bench_rn50_cache.json")


def _rn50_cached():
    """Last successful detail.rn50, tagged stale, or None."""
    for path in (_RN50_CACHE, _RN50_CACHE_COMMITTED):
        try:
            with open(path) as f:
                cached = json.load(f)
        except Exception:
            continue
        cached["stale"] = True
        cached["staleness_note"] = (
            "rn50 sub-benches skipped this run (--no-rn50 retry after a tunnel "
            "wedge, or sub-bench failure); values are the last successful "
            f"measurement from measured_at={cached.get('measured_at', '?')}"
        )
        return cached
    return None


_FULL_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output", "bench_full_cache.json")
# committed fallback (output/ is wiped between rounds): the driver must
# NEVER record parsed=null again, even when every attempt wedges at
# "building model" before any sub-result exists (VERDICT r4 weak #1)
_FULL_CACHE_COMMITTED = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools", "bench_full_cache.json")


def _preflight_probe(timeout_s: float = 90.0):
    """Tiny device op in a child with a hard timeout.

    Distinguishes "the device/tunnel is wedged" from "the bench broke":
    a wedged axon RPC blocks forever with ~0 CPU, so a 90 s device_put+add
    child that never returns is a device-side wedge, not a bench bug.
    Returns (ok, note)."""
    import subprocess

    code = (
        "import jax, jax.numpy as jnp;"
        "x = jax.device_put(jnp.ones((128, 128)));"
        "print(float((x + 1.0).sum()))"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s, capture_output=True, text=True
        )
        if proc.returncode == 0:
            return True, "ok"
        return False, f"probe rc={proc.returncode}: {proc.stderr.strip()[-300:]}"
    except subprocess.TimeoutExpired:
        return False, f"device wedged: probe did not return within {timeout_s:.0f}s"


def _save_full_cache(line: str) -> None:
    """Persist a successful FULL result line, keyed by metric, to the
    gitignored output cache AND the committed fallback."""
    try:
        result = json.loads(line)
    except Exception:
        return
    if not isinstance(result, dict) or "metric" not in result:
        return
    entry = dict(result, measured_at=time.strftime("%Y-%m-%dT%H:%M:%S"))
    for k in ("stale", "staleness_note", "wedge"):
        entry.pop(k, None)
    for path in (_FULL_CACHE, _FULL_CACHE_COMMITTED):
        try:
            try:
                with open(path) as f:
                    cache = json.load(f)
            except Exception:
                cache = {}
            if not isinstance(cache, dict):
                cache = {}
            cache[result["metric"]] = entry
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "w") as f:
                json.dump(cache, f, indent=1, sort_keys=True)
        except Exception:
            pass  # cache persistence must never fail the bench


def _full_cached(metric_hint: str):
    """Last successful full result for metric_hint (or the most recent
    entry of any metric), or None."""
    for path in (_FULL_CACHE, _FULL_CACHE_COMMITTED):
        try:
            with open(path) as f:
                cache = json.load(f)
        except Exception:
            continue
        if not isinstance(cache, dict) or not cache:
            continue
        entry = cache.get(metric_hint)
        if entry is None:
            entry = max(cache.values(), key=lambda e: str(e.get("measured_at", "")))
        return dict(entry)
    return None


def _supervised(args) -> int:
    """Run the bench in a child process with hard timeouts + retries.

    Attempt 1 runs argv as given; on a timeout/watchdog exit (tunnel
    stall) or failure, attempts 2-3 add --no-rn50 so the retries only pay
    for the headline measurement.  The in-child watchdog (os._exit(57) on
    a stalled phase) makes a failed attempt cost minutes, not the outer
    timeout.  Only JSON lines from the child reach stdout.

    Under EVERY failure mode a parsed JSON line is still emitted: a
    pre-flight probe first classifies a wedged device (and shrinks the
    retry budget — re-benching a wedged tunnel 3x is how round 4
    recorded nothing), successful full results are cached keyed by
    metric, and total failure emits the last-good full result tagged
    ``stale: true`` with the wedge evidence attached (VERDICT r4 #3)."""
    import subprocess

    probe_ok, probe_note = _preflight_probe()
    if not probe_ok:
        sys.stderr.write(f"bench pre-flight: {probe_note} — re-probing in 30 s\n")
        time.sleep(30)
        probe_ok, probe_note = _preflight_probe()
    sys.stderr.write(f"bench pre-flight: {probe_note}\n")

    env = dict(os.environ, CLIP_FSAR_BENCH_SUPERVISED="1")
    base = [sys.executable, os.path.abspath(__file__)] + sys.argv[1:]
    # Attempt-1 limit must exceed the SUM of the in-child phase deadlines
    # (build 600 + batch 300 + warmup 900 + timing 600 + rn50 2000 ≈ 4400 s
    # worst case) or a healthy-but-slow full run gets killed and silently
    # degraded to --no-rn50 (ADVICE r3).  The in-child watchdog already
    # bounds a WEDGED run to minutes; this outer limit is only the backstop.
    plan = [(1, base, 4800), (2, base + ["--no-rn50"], 2700), (3, base + ["--no-rn50"], 2700)]
    if not probe_ok:
        # device already classified as wedged: one cheap attempt, then the
        # stale fallback — don't burn the round-end window on a dead tunnel
        plan = [(1, base + ["--no-rn50"], 1200)]
    attempt_log, last_tail = [], ""
    for attempt, argv, t_lim in plan:
        try:
            proc = subprocess.run(
                argv, env=env, timeout=t_lim, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True
            )
            sys.stderr.write(proc.stderr)
            last_tail = proc.stderr[-600:]
            lines = [l for l in proc.stdout.splitlines() if l.lstrip().startswith("{")]
            if proc.returncode == 0 and lines:
                _save_full_cache(lines[-1])
                print(lines[-1])
                return 0
            attempt_log.append(f"attempt {attempt}: rc={proc.returncode}, no JSON line")
            sys.stderr.write(f"bench {attempt_log[-1]}\n")
        except subprocess.TimeoutExpired as e:
            stderr = e.stderr.decode() if isinstance(e.stderr, bytes) else (e.stderr or "")
            sys.stderr.write(stderr)
            last_tail = stderr[-600:]
            attempt_log.append(f"attempt {attempt}: {t_lim} s outer timeout (tunnel stall?)")
            sys.stderr.write(f"bench {attempt_log[-1]} — retrying\n")

    mode = "eval" if args.eval else "train"
    metric_hint = f"clipfsar_{args.backbone.replace('/', '')}_{mode}_episodes_per_sec_per_chip"
    fallback = _full_cached(metric_hint)
    if fallback is not None:
        fallback["stale"] = True
        fallback["staleness_note"] = (
            f"all {len(plan)} bench attempts failed this run; values are the last "
            f"successful full measurement from measured_at={fallback.get('measured_at', '?')}"
        )
        fallback["wedge"] = {
            "device_probe": probe_note,
            "attempts": attempt_log,
            "stderr_tail": last_tail,
        }
        print(json.dumps(fallback))
        return 0
    sys.stderr.write("bench: no cached full result available for stale fallback\n")
    return 1


def _rn50_detail(steps: int):
    """Train + eval RN50 sub-benches in subprocesses, condensed for
    detail.rn50 of the default bench line.  Never fails the main bench."""
    import subprocess

    out = {}
    for mode, extra in (("train", []), ("eval", ["--eval"])):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--backbone", "RN50", "--no-rn50",
                 "--steps", str(max(steps, 6))] + extra,
                capture_output=True, text=True, timeout=900,
            )
            jlines = [l for l in proc.stdout.splitlines() if l.lstrip().startswith("{")]
            r = json.loads(jlines[-1])
            out[f"{mode}_eps_per_sec_per_chip"] = r["value"]
            out[f"{mode}_mfu_useful"] = r["detail"]["mfu_useful"]
        except Exception as e:  # the RN50 extra must never sink the headline number
            out[f"{mode}_error"] = str(e)[:200]
    out["roofline_note"] = (
        "mfu_useful vs 197 TFLOP/s bf16 over the analytic ModifiedResNet counter "
        "(11.59 GFLOP/frame fwd @224; PERFORMANCE.md 'RN50 roofline')"
    )
    if not any(k.endswith("_error") for k in out):
        # persist for the stale-but-present degradation path (_rn50_cached)
        try:
            os.makedirs(os.path.dirname(_RN50_CACHE), exist_ok=True)
            with open(_RN50_CACHE, "w") as f:
                json.dump(dict(out, measured_at=time.strftime("%Y-%m-%dT%H:%M:%S")), f)
        except OSError:
            pass
    return out


def _tower_gflops_per_frame(backbone: str, res: int):
    """Analytic useful GFLOP per frame forward for a CLIP vision tower at
    the given crop (2 FLOP per MAC — the published per-model "GFLOPs"
    numbers count MACs; see PERFORMANCE.md "Corrected roofline").  Covers
    ViT and ModifiedResNet towers (None for unknown backbones).  Used for
    mfu_useful because the HLO cost analysis undercounts scan-over-layers
    graphs (loop bodies counted once)."""
    from clip_fsar_tpu.models.clip.model import ARCHS

    arch = ARCHS.get(backbone)
    if arch is None:
        return None
    if not arch.is_vit:
        return _resnet_gflops_per_frame(arch, res)
    w, l, p = arch.vision_width, arch.vision_layers, arch.vision_patch_size
    n = (res // p) ** 2 + 1
    per_layer = 8 * n * w * w + 16 * n * w * w + 4 * n * n * w  # qkv+out, mlp(4x), attn
    patch = 2 * (n - 1) * w * 3 * p * p
    return (l * per_layer + patch) / 1e9


def _resnet_gflops_per_frame(arch, res: int):
    """Analytic useful GFLOP per frame forward for a CLIP ModifiedResNet
    tower (models/clip/model.py:492-534; mirrors reference few_shot.py
    542-602): 3-conv stem, anti-aliased bottleneck stages, attention pool.
    Validated against XLA cost analysis in tests/test_bench_flops.py."""
    w = arch.vision_width
    layers = arch.vision_layers  # e.g. (3, 4, 6, 3) for RN50
    flops = 0
    # stem: conv1 3x3 s2 (3->w/2), conv2/conv3 3x3 s1 at res/2, then 2x2 avgpool
    n = res // 2
    flops += 2 * n * n * (w // 2) * 3 * 9
    flops += 2 * n * n * (w // 2) * (w // 2) * 9
    flops += 2 * n * n * w * (w // 2) * 9
    n = n // 2
    inplanes = w
    for blocks, planes, stride in zip(layers, (w, w * 2, w * 4, w * 8), (1, 2, 2, 2)):
        for i in range(blocks):
            s = stride if i == 0 else 1
            m = n // s  # conv1/conv2 run at n, avgpool to m, conv3 at m
            flops += 2 * n * n * planes * inplanes  # conv1 1x1
            flops += 2 * n * n * planes * planes * 9  # conv2 3x3
            flops += 2 * m * m * planes * 4 * planes  # conv3 1x1
            if s > 1 or inplanes != planes * 4:
                flops += 2 * m * m * planes * 4 * inplanes  # downsample 1x1
            inplanes = planes * 4
            n = m
    # attention pool: N = (res/32)^2 + 1 tokens, embed E = w*32, out D
    ntok = (res // 32) ** 2 + 1
    e, d = w * 32, arch.embed_dim
    flops += 2 * ntok * e * e * 2  # k, v projections over all tokens
    flops += 2 * 1 * e * e  # q projection (pooled token only)
    flops += 2 * 2 * ntok * e  # qk^T + att@v for the single query
    flops += 2 * 1 * e * d  # c_proj
    return flops / 1e9


def _make_real_videos(root: str, num_videos: int = 40, frames: int = 72, size=(240, 180)) -> None:
    """Write small real mp4s + HMDB-style split lists for the --real bench."""
    import cv2
    import numpy as np

    vdir = os.path.join(root, "videos")
    os.makedirs(vdir, exist_ok=True)
    lines = []
    rng = np.random.RandomState(0)
    for i in range(num_videos):
        cls = i % 8
        path = os.path.join(vdir, f"c{cls}_v{i:03d}.avi")
        if not os.path.exists(path):
            w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 24.0, size)
            assert w.isOpened(), f"VideoWriter failed for {path}"
            base = rng.randint(0, 200, (size[1], size[0], 3)).astype(np.uint8)
            for t in range(frames):
                w.write(np.roll(base, t * 3, axis=1))
            w.release()
        lines.append(f"train{cls}//videos/c{cls}_v{i:03d}.avi")
    for split in ("train", "test"):
        with open(os.path.join(root, f"{split}_few_shot.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")


def bench_loader(args) -> int:
    """Host input-pipeline throughput: episodes/s through decode +
    transform + batch (compare against the device step rate from the
    default bench to see which side bounds training).  Default: synthetic
    decoder (pure transform cost).  --real: real mp4 decode via OpenCV,
    measured cold (opencv) and warm (cached_opencv JPEG frame cache)."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import json as _json
    import tempfile
    import time as _time

    from __graft_entry__ import _cfg
    from clip_fsar_tpu.data.loader import build_few_shot_loader

    if args.quick:
        args.backbone, args.res, args.frames = "ViT-Tiny-Test", 64, 4
    episodes = args.episodes or 4
    steps = max(args.steps, 5)

    def rate(cfg, split="train", warm_steps=1) -> float:
        with build_few_shot_loader(cfg, split, num_steps=steps + warm_steps, episodes_per_step=episodes) as loader:
            it = iter(loader)
            for _ in range(warm_steps):
                next(it)  # warm workers (and the frame cache's first decode)
            t0 = _time.perf_counter()
            for _ in range(steps):
                next(it)
            return episodes * steps / (_time.perf_counter() - t0)

    detail = {"episodes_per_step": episodes, "steps": steps, "frames": args.frames, "res": args.res}
    if args.real:
        root = os.path.join(tempfile.gettempdir(), "clip_fsar_loader_bench")
        _make_real_videos(root)
        cfg = _cfg(args.backbone, args.frames, args.res, episodes)
        cfg.DATA.DATA_ROOT_DIR = root
        cfg.DATA.ANNO_DIR = root
        cfg.DATA.DECODER = "opencv"
        cold = rate(cfg)
        cfg.DATA.DECODER = "cached_opencv"
        cfg.DATA.FRAME_CACHE_DIR = os.path.join(root, "cache")
        rate(cfg)  # first pass builds the cache
        warmc = rate(cfg)
        detail.update({"decoder": "opencv->cached_opencv", "mp4_decode_eps_per_sec": round(cold, 3),
                       "frame_cache_eps_per_sec": round(warmc, 3)})
        eps_per_sec, metric = warmc, "clipfsar_loader_real_episodes_per_sec"
    else:
        cfg = _cfg(args.backbone, args.frames, args.res, episodes)
        eps_per_sec, metric = rate(cfg), "clipfsar_loader_episodes_per_sec"
        detail["decoder"] = "synthetic"
    print(
        _json.dumps(
            {
                "metric": metric,
                "value": round(eps_per_sec, 4),
                "unit": "episodes/s",
                "vs_baseline": round(eps_per_sec / BASELINE_EPS_PER_SEC, 4),
                "detail": detail,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
