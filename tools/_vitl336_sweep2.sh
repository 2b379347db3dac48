#!/bin/bash
# ViT-L/14@336px round-5 follow-up: config e (dots, scan, c12) measured
# 0.1584 eps/s / 44.2 % useful MFU — probe the dots-policy chunking
# space around it (and retry the c24 point that hit a transient wedge).
set -u
mkdir -p output/vitl336
run() {
  tag=$1; shift
  echo "=== $tag: $* ==="
  CLIP_FSAR_BENCH_SUPERVISED=1 timeout 2400 python bench.py \
    --backbone ViT-L/14@336px --frames 16 --res 336 --episodes 1 --steps 5 "$@" \
    > output/vitl336/$tag.json 2> output/vitl336/$tag.err
  echo "rc=$? $(tail -c 400 output/vitl336/$tag.json)"
}
run g_scan_dots_c10      --remat --remat-policy dots --scan-layers --frame-chunks 10
run h_scan_dots_c8       --remat --remat-policy dots --scan-layers --frame-chunks 8
run i_scan_dots_c20      --remat --remat-policy dots --scan-layers --frame-chunks 20
run j_scan_dots_c24      --remat --remat-policy dots --scan-layers --frame-chunks 24
run k_noscan_dots_c12    --remat --remat-policy dots --frame-chunks 12
echo done
