"""Group device-op time from a jax.profiler trace.json.gz by op kind.

Usage: python _trace_buckets.py /tmp/trace_dir [step_ms]
"""

import gzip
import json
import re
import sys
from collections import defaultdict
from pathlib import Path


def main(trace_dir: str) -> None:
    paths = sorted(Path(trace_dir).rglob("*.trace.json.gz"))
    if not paths:
        print("no trace found under", trace_dir)
        return
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device-op events live on TensorCore pids; host threads have names
    pid_names = {e["pid"]: e.get("args", {}).get("name", "") for e in events if e.get("ph") == "M" and e.get("name") == "process_name"}
    device_pids = {pid for pid, name in pid_names.items() if "TPU" in name or "Core" in name or "XLA Op" in name}
    buckets = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pid = e.get("pid")
        if device_pids and pid not in device_pids:
            continue
        name = e.get("name", "")
        if not device_pids and not re.match(r"^(fusion|copy|convert|reduce|dot|custom-call|transpose|broadcast|select|scatter|all-|bitcast|dynamic)", name):
            continue
        kind = re.split(r"[.\d]", name, 1)[0]
        buckets[kind] += e["dur"] / 1e3  # us -> ms
        total += e["dur"] / 1e3
    print(f"total device op time: {total:.1f} ms across {len(paths)} trace(s)")
    for kind, ms in sorted(buckets.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {kind:30s} {ms:9.2f} ms  {ms / max(total, 1e-9) * 100:5.1f}%")


if __name__ == "__main__":
    main(sys.argv[1])
