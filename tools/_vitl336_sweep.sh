#!/bin/bash
# ViT-L/14@336px train-step sweep (VERDICT r3 item 3).  Serialized
# single-chip runs; each bench.py invocation is self-supervised (watchdog
# + retry).  Logs land in output/vitl336/.
#
# ROUND-5 OUTCOME (PERFORMANCE.md "ViT-L/14@336px train step"): best
# reliable config is  --remat --remat-policy dots --scan-layers
# --frame-chunks 12  (44.2 % useful MFU; c10 is +1 % but sits on the
# memory edge and intermittently OOMs).  No-remat does not fit on a
# 16 GB v5e (17.07 G of 15.75 G with dots@c16); pallas attention loses
# 2.5x at N=577.  See tools/_vitl336_sweep2.sh for the probe grid.
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
# a) round-2 adopted config (reproduce the committed 0.152 eps/s row)
run a_scan_remat_c4      --remat --scan-layers --frame-chunks 4
# b) inner remat policy dots (recompute elementwise only) at wider chunking
run b_scan_dots_c16      --remat --remat-policy dots --scan-layers --frame-chunks 16
run c_scan_dots_c24      --remat --remat-policy dots --scan-layers --frame-chunks 24
# d) chunk-level remat only (no inner per-layer remat): upper bound if it fits
run d_noremat_c24        --no-remat --scan-layers --frame-chunks 24
run e_scan_dots_c12      --remat --remat-policy dots --scan-layers --frame-chunks 12
run f_noremat_c32        --no-remat --scan-layers --frame-chunks 32
echo done
