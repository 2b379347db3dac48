"""Top individual device ops from a jax.profiler trace (by total time).

Usage: python _trace_top.py /tmp/trace_dir [N]
"""

import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path


def main(trace_dir: str, top: int = 30) -> None:
    paths = sorted(Path(trace_dir).rglob("*.trace.json.gz"))
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {e["pid"]: e.get("args", {}).get("name", "") for e in events if e.get("ph") == "M" and e.get("name") == "process_name"}
    device_pids = {pid for pid, name in pid_names.items() if "TPU" in name or "Core" in name}
    agg = defaultdict(lambda: [0.0, 0])
    for e in events:
        if e.get("ph") != "X" or "dur" not in e or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        agg[name][0] += e["dur"] / 1e3
        agg[name][1] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
    total = sum(v[0] for v in agg.values())
    print(f"device total {total:.1f} ms, pids={sorted(device_pids)} ({[pid_names[p] for p in sorted(device_pids)]})")
    for name, (ms, cnt) in rows:
        print(f"  {ms:9.2f} ms x{cnt:4d}  {name[:110]}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 30)
