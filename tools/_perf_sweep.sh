#!/bin/bash
# One-shot TPU perf sweep: most-valuable configs first so partial results
# survive a tunnel failure.  Results append to /tmp/perf_sweep.jsonl.
set -u
OUT=/tmp/perf_sweep.jsonl
: > "$OUT"
run() {
  echo "### $*" >> "$OUT"
  timeout 900 python bench.py --steps 6 "$@" 2>/dev/null | tail -1 >> "$OUT"
  echo >> "$OUT"
  sleep 10
}
run --remat-policy dots --episodes 4
run --remat-policy dots --episodes 8
run --remat-policy dots --episodes 2
run                     --episodes 2          # baseline regression
run --remat-policy dots --episodes 4 --attention pallas
run --no-remat --episodes 2
run --remat-policy dots --episodes 4 --scan-layers
run --eval --episodes 8
echo "SWEEP DONE" >> "$OUT"
