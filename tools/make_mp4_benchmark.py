"""Materialize a few-shot split list as REAL video files on disk.

The zero-egress image has no HMDB/SSv2/UCF data, but the 10,000-episode
evaluation protocol (reference runs/test_net_few_shot.py:57,
NUM_TEST_TASKS yaml:16) must be exercised through the REAL decode path —
seek + decode + frame cache — not the synthetic decoder.  This tool walks
a split list (e.g. configs/projects/CLIPFSAR/hmdb51/test_few_shot.txt)
and writes one MJPG .avi per entry with deterministic per-video content,
mirroring the exact directory layout the reference expects, so the
shipped project YAMLs run unchanged with ``DATA.DATA_ROOT_DIR <out>``.

Usage:
  python tools/make_mp4_benchmark.py \
      --list configs/projects/CLIPFSAR/hmdb51/test_few_shot.txt \
      --split test --out output/hmdb_videos [--frames 80] [--size 240x180]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clip_fsar_tpu.data.splits import load_split_file  # noqa: E402


def write_video(path: str, seed: int, frames: int, w: int, h: int) -> None:
    import cv2

    rng = np.random.RandomState(seed)
    # low-frequency moving pattern: compresses well (small files) but is
    # not constant, so decode + resize do real work per frame
    base = rng.randint(0, 255, size=(h // 8, w // 8, 3), dtype=np.uint8)
    base = cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30.0, (w, h))
    if not vw.isOpened():
        raise RuntimeError(f"VideoWriter failed for {path}")
    for t in range(frames):
        shift = (t * 3) % w
        frame = np.roll(base, shift, axis=1)
        vw.write(frame)
    vw.release()


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--list", required=True, help="split list file (reference format)")
    p.add_argument("--split", default="test", choices=["train", "val", "test"])
    p.add_argument("--out", required=True, help="DATA.DATA_ROOT_DIR to materialize under")
    p.add_argument("--frames", type=int, default=80)
    p.add_argument("--size", default="240x180")
    p.add_argument("--ssv2-style", action="store_true", help="id-style entries (get .mp4 suffix)")
    args = p.parse_args()

    w, h = (int(v) for v in args.size.split("x"))
    split = load_split_file(args.list, args.split, args.ssv2_style)
    t0 = time.time()
    made = skipped = 0
    for i, rel in enumerate(split.videos):
        path = os.path.join(args.out, rel + ".mp4" if args.ssv2_style else rel)
        if os.path.exists(path):
            skipped += 1
            continue
        os.makedirs(os.path.dirname(path), exist_ok=True)
        write_video(path, seed=hash(rel) & 0x7FFFFFFF, frames=args.frames, w=w, h=h)
        made += 1
        if made % 100 == 0:
            rate = made / (time.time() - t0)
            print(f"{made}/{len(split.videos)} videos ({rate:.1f}/s)", flush=True)
    print(f"done: {made} written, {skipped} already present, {time.time() - t0:.0f}s -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
