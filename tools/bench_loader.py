# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Loader-only benchmark: video-decode throughput vs num_workers.

Generates a pool of real mp4 clips (cv2 mp4v), then measures
samples/sec through avec_tpu.data.loader.DataLoader for several worker
counts. The decode path is the same as LRS __getitem__ (cv2 read +
grayscale + normalize). cv2 releases the GIL, so worker threads scale
with cores — on a 1-core host expect ~1x; on an n-core TPU host expect
~n x (SURVEY §7.3: video decode is the reference's bottleneck).

Usage: python tools/bench_loader.py [--clips 32] [--frames 50]
       [--workers 0 1 2 4 8] [--batches 16]
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class Mp4Dataset:
    """Decode-heavy dataset over a pool of mp4 clips (LRS-like work)."""

    shuffle = False
    collate_fn = None
    batch_size = None

    def __init__(self, paths, frames):
        self.paths = paths
        self.frames = frames

    def sample_lengths(self):
        return [self.frames] * len(self.paths)

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, n):
        import cv2

        cap = cv2.VideoCapture(self.paths[n % len(self.paths)])
        out = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
            out.append(cv2.resize(gray, (88, 88)))
        cap.release()
        video = np.stack(out).astype(np.float32) / 255.0
        return (video - 0.4161) / 0.1688


def make_clips(n_clips, frames, size=96):
    import cv2

    tmp = tempfile.mkdtemp(prefix="avec_loader_bench_")
    rng = np.random.RandomState(0)
    paths = []
    for i in range(n_clips):
        p = os.path.join(tmp, f"clip_{i}.mp4")
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 25,
                            (size, size))
        for _ in range(frames):
            w.write(rng.randint(0, 255, (size, size, 3), np.uint8))
        w.release()
        paths.append(p)
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=32)
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--batches", type=int, default=16)
    ap.add_argument("--workers", type=int, nargs="+", default=[0, 1, 2, 4, 8])
    args = ap.parse_args()

    from avec_tpu.data.loader import DataLoader

    paths = make_clips(args.clips, args.frames)
    ds = Mp4Dataset(paths * ((args.batch * args.batches) // len(paths) + 1),
                    args.frames)

    results = {}
    for nw in args.workers:
        dl = DataLoader(ds, batch_size=args.batch, shuffle=False,
                        collate_fn=lambda s: s, drop_last=True,
                        num_workers=nw, prefetch=2)
        it = iter(dl)
        next(it)  # warmup (thread pool spin-up)
        t0 = time.perf_counter()
        n = 0
        for batch in it:
            n += len(batch)
            if n >= args.batch * args.batches:
                break
        dt = time.perf_counter() - t0
        rate = n / dt
        results[nw] = rate
        base = results.get(args.workers[0], rate)
        print(f"workers={nw:>2}  {rate:8.1f} samples/s  "
              f"({rate / base:.2f}x vs workers={args.workers[0]})")
    print({"metric": "loader_samples_per_sec", "results": results,
           "cores": os.cpu_count()})


if __name__ == "__main__":
    main()
