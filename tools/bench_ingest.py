"""Host-ingest throughput benchmark (JPEG decode -> 256x256 uint8 base).

The device bench (bench.py) measures the on-chip path and excludes host
decode by design — this tool provides the matching evidence that the
host side keeps up: it measures images/sec for the C++ libjpeg threaded
decoder (ingest/cpp) and the PIL fallback, on synthetic JPEGs of the
documented eval geometry. The pipeline overlaps host decode with device
compute (data/loader.py prefetch), so serving is chip-bound as long as
host decode img/s exceeds the chip's ~1486 img/s.

Usage: python tools/bench_ingest.py [--n 256] [--iters 5] [--threads N]
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image


def make_jpegs(n, size=(320, 280), quality=90, seed=0, content="photo"):
    """content='photo': smooth multi-scale structure (realistic JPEG
    entropy — a 1024x768 blob lands in the few-hundred-KB range like a
    real Flickr photo). content='noise': uniform noise — the worst case
    for JPEG size and entropy-decode cost (~5-10x a real photo's bytes);
    kept for a pessimistic bound."""
    rng = np.random.default_rng(seed)
    w, h = size
    blobs = []
    for _ in range(n):
        if content == "noise":
            arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        else:
            y, x = np.mgrid[0:h, 0:w].astype(np.float32)
            f1, f2 = rng.uniform(60, 200), rng.uniform(90, 260)
            p1, p2 = rng.uniform(0, 6.3, 2)
            base = np.stack([
                127 + 110 * np.sin(x / f1 + p1) * np.cos(y / f2 + p2),
                127 + 110 * np.cos(x / f2 + p2) * np.sin(y / f1),
                (x + y) * (255.0 / (w + h)),
            ], -1)
            texture = rng.normal(0, 12, (h // 4 + 1, w // 4 + 1, 3))
            texture = np.repeat(np.repeat(texture, 4, 0), 4, 1)[:h, :w]
            arr = np.clip(base + texture, 0, 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
        blobs.append(buf.getvalue())
    return blobs


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--threads", type=int, default=None)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--height", type=int, default=280,
                   help="source JPEG dims; use e.g. --width 1024 "
                        "--height 768 for realistic Flickr photos where "
                        "scaled decode pays off")
    p.add_argument("--content", default="photo",
                   choices=["photo", "noise"],
                   help="photo: realistic smooth JPEGs; noise: "
                        "pessimistic entropy-decode bound")
    args = p.parse_args(argv)

    from geoestimation_tpu.ingest import decode

    blobs = make_jpegs(args.n, size=(args.width, args.height),
                       content=args.content)
    backends = ["pil"]
    if decode.native.available():
        backends.insert(0, "turbo")
    cores = os.cpu_count() or 1
    for backend in backends:
        for fast in (False, True):
            # warmup (thread pool spin-up, page faults)
            decode.decode_batch(blobs[:16], backend=backend,
                                num_threads=args.threads, fast_scale=fast)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out, ok = decode.decode_batch(blobs, backend=backend,
                                              num_threads=args.threads,
                                              fast_scale=fast)
            dt = time.perf_counter() - t0
            assert ok.all() and out.shape[1:] == (256, 256, 3)
            ips = args.n * args.iters / dt
            label = backend + ("+fast" if fast else "")
            kb = sum(len(b) for b in blobs) / len(blobs) / 1024
            print(f"{label:11s}: {ips:8.1f} images/sec "
                  f"({ips / cores:.0f}/core x {cores} cores; "
                  f"{args.n} {args.content} blobs of "
                  f"{args.width}x{args.height} (~{kb:.0f} KB) "
                  f"x {args.iters} iters, "
                  f"threads={args.threads or 'auto'})")


if __name__ == "__main__":
    main()
