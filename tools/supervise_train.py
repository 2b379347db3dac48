#!/usr/bin/env python
"""Stall-watchdog supervisor for long real-chip runs.

The single-chip axon tunnel can wedge mid-run (observed: a training step
blocks forever inside a device call with 0 CPU; round-3 bench attempts
hit the same at model build). The reference has no analog — its CUDA
runs either crash or finish — but on a tunneled TPU a silent wedge is
the dominant failure mode for multi-hour workloads, so long runs here
are launched under this supervisor:

  python tools/supervise_train.py --log /tmp/run.log [--stall 420]
      [--startup-stall 1500] [--max-restarts 6] [--total 14400] \
      -- python runs/run.py --cfg ... OUTPUT_DIR output/run ...

It spawns the command in its own process group with stdout/stderr
appended to --log, then watches the log for growth. No growth for
--stall seconds (or --startup-stall seconds before the first
"train_iter" line after a (re)launch, to allow model build + frame-bank
+ first jit) ⇒ SIGKILL the process group and relaunch. Recovery relies
on TRAIN.AUTO_RESUME (clip_fsar_tpu/train/checkpoint.py:105): the
relaunch resumes from the latest checkpoint in OUTPUT_DIR, so at most
one VAL_FRE_ITER window of work is repeated.

Exits 0 when the child exits 0; exits non-zero when restarts or the
--total wall budget are exhausted. Supervisor events are appended to
the same log as lines prefixed "[supervise]" so the run's timeline
(including every wedge) is a single committed artifact.
"""
import argparse
import os
import signal
import subprocess
import sys
import time


def log_event(log_path: str, msg: str) -> None:
    line = f"[supervise] {time.strftime('%m/%d %H:%M:%S')} {msg}\n"
    with open(log_path, "a") as f:
        f.write(line)
    sys.stderr.write(line)


def launch(cmd, log_path):
    # Caller must close the returned handle after the child exits —
    # leaving it open leaks an fd per restart and keeps buffered writes
    # alive across relaunches.
    logf = open(log_path, "a")
    proc = subprocess.Popen(
        cmd, stdout=logf, stderr=subprocess.STDOUT, start_new_session=True
    )
    return proc, logf


def kill_group(proc) -> None:
    try:
        os.killpg(proc.pid, signal.SIGTERM)
    except ProcessLookupError:
        return
    deadline = time.time() + 15
    while time.time() < deadline:
        if proc.poll() is not None:
            return
        time.sleep(1)
    try:
        os.killpg(proc.pid, signal.SIGKILL)
    except ProcessLookupError:
        pass
    proc.wait()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True)
    ap.add_argument("--stall", type=float, default=420.0,
                    help="steady-state no-log-growth kill threshold (s)")
    ap.add_argument("--startup-stall", type=float, default=1500.0,
                    help="threshold before the first train_iter after a launch")
    ap.add_argument("--max-restarts", type=int, default=6)
    ap.add_argument("--total", type=float, default=14400.0,
                    help="overall wall budget (s)")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- separated command to supervise")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given (use -- cmd ...)")

    t0 = time.time()
    restarts = 0
    while True:
        log_event(args.log, f"launch attempt {restarts + 1}: {' '.join(cmd)}")
        launch_off = os.path.getsize(args.log) if os.path.exists(args.log) else 0
        proc, logf = launch(cmd, args.log)
        last_size = -1
        last_growth = time.time()
        in_steady = False
        try:
            while True:
                rc = proc.poll()
                if rc is not None:
                    if rc == 0:
                        log_event(args.log, "child exited 0; done")
                        return 0
                    log_event(args.log, f"child exited rc={rc}")
                    break
                now = time.time()
                if now - t0 > args.total:
                    log_event(args.log, "total wall budget exhausted; killing")
                    kill_group(proc)
                    return 3
                try:
                    size = os.path.getsize(args.log)
                except OSError:
                    # log rotated/deleted mid-run: treat as no growth
                    # rather than crashing and leaving the detached
                    # child running unsupervised
                    size = last_size
                if size != last_size:
                    if not in_steady and size > launch_off:
                        # cheap check: steady state begins at the first
                        # train/eval progress line after this launch
                        with open(args.log, "rb") as f:
                            f.seek(launch_off)
                            tail = f.read()
                        if b"train_iter" in tail or b"eval_" in tail:
                            in_steady = True
                    last_size = size
                    last_growth = now
                threshold = args.stall if in_steady else args.startup_stall
                if now - last_growth > threshold:
                    log_event(
                        args.log,
                        f"no log growth for {now - last_growth:.0f}s "
                        f"(threshold {threshold:.0f}s, steady={in_steady}); "
                        "killing process group for auto-resume restart",
                    )
                    kill_group(proc)
                    break
                time.sleep(15)
        finally:
            logf.close()
        restarts += 1
        if restarts > args.max_restarts:
            log_event(args.log, "max restarts exhausted")
            return 2
        if time.time() - t0 > args.total:
            log_event(args.log, "total wall budget exhausted")
            return 3
        time.sleep(10)


if __name__ == "__main__":
    sys.exit(main())
