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


def make_jpegs(n, size=(320, 280), quality=90, seed=0):
    rng = np.random.default_rng(seed)
    blobs = []
    for _ in range(n):
        arr = rng.integers(0, 255, (size[1], size[0], 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
        blobs.append(buf.getvalue())
    return blobs


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--threads", type=int, default=None)
    args = p.parse_args(argv)

    from geoestimation_tpu.ingest import decode

    blobs = make_jpegs(args.n)
    backends = ["pil"]
    if decode.native.available():
        backends.insert(0, "turbo")
    for backend in backends:
        # warmup (thread pool spin-up, page faults)
        decode.decode_batch(blobs[:16], backend=backend,
                            num_threads=args.threads)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out, ok = decode.decode_batch(blobs, backend=backend,
                                          num_threads=args.threads)
        dt = time.perf_counter() - t0
        assert ok.all() and out.shape[1:] == (256, 256, 3)
        ips = args.n * args.iters / dt
        cores = os.cpu_count() or 1
        print(f"{backend:6s}: {ips:8.1f} images/sec "
              f"({ips / cores:.0f}/core x {cores} cores; "
              f"{args.n} blobs x {args.iters} iters, "
              f"threads={args.threads or 'auto'})")


if __name__ == "__main__":
    main()
