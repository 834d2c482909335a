"""Dynamic-batching inference server.

The reference offered only a batch CLI (SURVEY.md §2: "no serving layer
beyond a batch-inference CLI"); this module adds the production serving
path the framework targets: an HTTP endpoint whose requests are
micro-batched onto the TPU.

Design for the device: the engine's jitted forward has a static batch
shape, so the batcher collects requests for up to `max_wait_ms` (or until
`max_batch` arrive), pads the group to the fixed batch with a validity
mask, and runs ONE device step for the group — classic dynamic batching,
amortizing the per-dispatch overhead while keeping XLA shapes static.

Endpoints:
  POST /predict     body = JPEG bytes -> JSON {p_key: {class, lat, lng}}
  GET  /            browser demo page (serve/demo_page.py) — the
                    framework-native replacement for the reference's
                    gh-pages web demo (reference README.md:69-71)
  GET  /healthz     liveness + device info
  GET  /stats       counters (requests, batches, mean batch occupancy)

Run: python -m geoestimation_tpu.serve --checkpoint DIR [--port 8500]
"""

from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


class _Pending:
    __slots__ = ("image", "event", "result", "error")

    def __init__(self, image):
        self.image = image
        self.event = threading.Event()
        self.result = None
        self.error = None


class MicroBatcher:
    """Collects single-image requests into fixed-size device batches."""

    def __init__(self, predict_fn, batch_size: int = 16,
                 max_wait_ms: float = 5.0, base_size: int = 256):
        self.predict_fn = predict_fn
        self.batch_size = batch_size
        self.max_wait_s = max_wait_ms / 1000.0
        self.base_size = base_size
        self.queue: queue.Queue = queue.Queue()
        self.n_requests = 0
        self.n_batches = 0
        self.occupancy_sum = 0
        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, image_u8: np.ndarray, timeout: float = 30.0):
        """Blocking: (base, base, 3) uint8 -> {p_key: (cls, lat, lng)}."""
        item = _Pending(image_u8)
        self.queue.put(item)
        if not item.event.wait(timeout):
            raise TimeoutError("prediction timed out")
        if item.error is not None:
            raise item.error
        return item.result

    def _loop(self):
        while not self._stop:
            try:
                first = self.queue.get(timeout=0.1)
            except queue.Empty:
                continue
            group = [first]
            deadline = time.monotonic() + self.max_wait_s
            while len(group) < self.batch_size:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    group.append(self.queue.get(timeout=remaining))
                except queue.Empty:
                    break
            self._run(group)

    def _run(self, group):
        try:
            images = np.zeros(
                (self.batch_size, self.base_size, self.base_size, 3),
                np.uint8,
            )
            for i, item in enumerate(group):
                images[i] = item.image
            # pad slots repeat real images rather than staying black:
            # their predictions are discarded, but the int8 engine
            # calibrates activation scales on its FIRST batch — zero
            # padding would bake underestimated scales (persistent
            # clipping) into the scales cache
            for i in range(len(group), self.batch_size):
                images[i] = group[i % len(group)].image
            preds = self.predict_fn(images)
            for i, item in enumerate(group):
                item.result = {
                    key: {
                        "class": int(cls[i]),
                        "lat": float(lat[i]),
                        "lng": float(lng[i]),
                    }
                    for key, (cls, lat, lng) in preds.items()
                }
                item.event.set()
            self.n_requests += len(group)
            self.n_batches += 1
            self.occupancy_sum += len(group)
        except Exception as e:  # propagate to all waiters
            for item in group:
                item.error = e
                item.event.set()

    def stats(self):
        batches = max(self.n_batches, 1)
        return {
            "requests": self.n_requests,
            "batches": self.n_batches,
            "mean_occupancy": self.occupancy_sum / batches,
            "batch_size": self.batch_size,
        }

    def close(self):
        self._stop = True


class GeoInferenceServer:
    def __init__(self, engine, host: str = "127.0.0.1", port: int = 8500,
                 batch_size: int = 16, max_wait_ms: float = 5.0,
                 resize_to: int = 256, base_size: int = 256,
                 fast_decode: bool = False):
        from ..ingest import decode

        self.engine = engine
        self.batcher = MicroBatcher(
            engine.predict_batch, batch_size=batch_size,
            max_wait_ms=max_wait_ms, base_size=base_size,
        )
        self._decode = lambda blob: decode.decode_batch(
            [blob], resize_to=resize_to, base_size=base_size,
            fast_scale=fast_decode,
        )
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _json(self, code, payload):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path in ("/", "/demo"):
                    from .demo_page import DEMO_HTML

                    body = DEMO_HTML.encode()
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "text/html; charset=utf-8")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif self.path == "/healthz":
                    import jax

                    self._json(200, {
                        "status": "ok",
                        "devices": [str(d) for d in jax.devices()],
                        "partitionings": list(server.engine.harrays.names),
                    })
                elif self.path == "/stats":
                    self._json(200, server.batcher.stats())
                else:
                    self._json(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/predict":
                    self._json(404, {"error": "not found"})
                    return
                length = int(self.headers.get("Content-Length", 0))
                if length <= 0 or length > 64 * 1024 * 1024:
                    self._json(400, {"error": "bad Content-Length"})
                    return
                blob = self.rfile.read(length)
                images, ok = server._decode(blob)
                if not ok[0]:
                    self._json(400, {"error": "undecodable image"})
                    return
                try:
                    result = server.batcher.submit(images[0])
                except TimeoutError:
                    self._json(503, {"error": "timed out"})
                    return
                self._json(200, {"predictions": result})

        # default request_queue_size (5) resets connections under burst
        # load (measured: a 64-client burst dropped ~half) — raise the
        # listen backlog well above any sane concurrent client count
        class _Server(ThreadingHTTPServer):
            request_queue_size = 256
            daemon_threads = True

        self.httpd = _Server((host, port), Handler)
        self.port = self.httpd.server_port

    def serve_forever(self):
        self.httpd.serve_forever()

    def start_background(self):
        t = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        t.start()
        return t

    def close(self):
        self.batcher.close()
        self.httpd.shutdown()
        self.httpd.server_close()


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="GeoEstimation-TPU inference "
                                            "server")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--hparams", default=None)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8500)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--max_wait_ms", type=float, default=5.0)
    p.add_argument("--crops", type=int, default=1, choices=[1, 5, 10])
    p.add_argument("--fast", action="store_true")
    p.add_argument("--feature_tta", action="store_true",
                   help="with --crops 5/10: feature-space TTA — the "
                        "trunk runs once per base image and crops happen "
                        "at the feature map (2.6-3.3x measured TTA "
                        "throughput; approximate at crop borders — "
                        "accuracy evidence: docs/QUANTIZATION.md)")
    p.add_argument("--feature_tta_level", type=int, default=3,
                   choices=[1, 2, 3],
                   help="with --feature_tta: stage whose feature map is "
                        "cropped (3 = fastest; 2 = closer to exact)")
    p.add_argument("--precision", type=int, default=16,
                   choices=[8, 16, 32],
                   help="8 = int8 PTQ serving precision (models/quant.py;"
                        " calibrated on the first batch; ~1.35x bf16 on "
                        "v5e)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--warmup", action="store_true",
                   help="run one full-size batch before accepting "
                        "traffic so the first request never pays the "
                        "jit compile (and, with --precision 8, the "
                        "calibration pass)")
    p.add_argument("--calib_dir", default=None,
                   help="with --precision 8: directory of real images "
                        "used for deterministic calibration (engine "
                        "draws the first --calib_images in sorted "
                        "order); int8 activation scales calibrated on "
                        "synthetic noise are NOT representative — "
                        "always provide domain images in production")
    p.add_argument("--calib_images", type=int, default=64)
    p.add_argument("--calib_stat", default="auto",
                   choices=["auto", "absmax", "p999", "p9999"],
                   help="'auto' (default) scores absmax/p999/p9999 on "
                        "the calibration images and ships the winner")
    p.add_argument("--calib_headroom", type=float, default=1.0,
                   help="scale multiplier >1 trades resolution for "
                        "clipping margin (same knob as the eval CLIs)")
    p.add_argument("--recalibrate", action="store_true",
                   help="ignore any cached int8_scales.json")
    p.add_argument("--fast_decode", action="store_true",
                   help="scaled DCT JPEG decode for request images and "
                        "calibration (faster host path on large photos; "
                        "slightly different pixels)")
    p.add_argument("--shard_batch", action="store_true",
                   help="shard each micro-batch over ALL local chips "
                        "(data-parallel mesh) — the single-server v5e-8 "
                        "deployment shape; --batch_size must divide "
                        "evenly by the local chip count. Default: one "
                        "device (run one server per chip instead for "
                        "latency-bound fleets)")
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    layout = None
    if args.shard_batch:
        # validate BEFORE the (slow) checkpoint load: a bad batch size
        # should fail at startup, not after minutes of loading
        import jax

        from ..parallel.mesh import make_mesh

        n_local = len(jax.devices())
        if args.batch_size % n_local:
            p.error(f"--shard_batch: --batch_size {args.batch_size} not "
                    f"divisible by the {n_local} local devices")
        layout = make_mesh(n_local, 1)
        print(f"sharding micro-batches over {n_local} local devices",
              flush=True)

    import os

    from ..eval.engine import InferenceEngine
    from ..train.checkpoint import load_for_inference

    config, state = load_for_inference(args.checkpoint,
                                       hparams_path=args.hparams)
    import jax.numpy as jnp

    from ..eval.engine import default_scales_path

    # A synthetic warmup (no --calib_dir) may still calibrate the int8
    # path on noise — acceptable to serve behind an explicit flag, but
    # NEVER persisted: a scales cache written from noise would silently
    # poison every later run that trusts the cache.
    synthetic_calib = (args.precision == 8 and args.warmup
                       and not args.calib_dir)
    if args.feature_tta and args.crops == 1:
        p.error("--feature_tta needs --crops 5 or 10")
    engine = InferenceEngine(
        config, state, layout=layout,
        n_crops=args.crops, fast=args.fast,
        dtype=jnp.float32 if args.precision == 32 else jnp.bfloat16,
        tta_mode=("feature" if args.feature_tta else "device"),
        feature_tta_level=args.feature_tta_level,
        int8=(args.precision == 8),
        int8_scales_path=default_scales_path(args.checkpoint),
        calib_dir=args.calib_dir,
        calib_images=args.calib_images,
        calib_stat=args.calib_stat,
        calib_headroom=args.calib_headroom,
        int8_persist=not synthetic_calib,
        int8_recalibrate=args.recalibrate,
        fast_decode=args.fast_decode,
        search_dirs=[os.path.dirname(os.path.abspath(args.checkpoint)),
                     args.checkpoint, os.getcwd()],
    )
    if args.warmup or args.calib_dir:
        import time as _time

        import numpy as np

        t0 = _time.time()
        if synthetic_calib:
            print("WARNING: int8 warmup on synthetic noise — pass "
                  "--calib_dir with domain images for representative "
                  "activation scales (these will not be cached)",
                  flush=True)
            batch = np.random.default_rng(0).integers(
                0, 255, (args.batch_size, 256, 256, 3), dtype=np.uint8)
        else:
            # engine calibrates from calib_dir itself; any batch
            # triggers the build + jit compile
            batch = np.zeros((args.batch_size, 256, 256, 3), np.uint8)
        engine.predict_batch(batch)
        print(f"warmup done in {_time.time() - t0:.1f}s "
              f"(calibrated={args.precision == 8}, "
              f"source={getattr(engine, 'int8_calib_source', None)})",
              flush=True)

    server = GeoInferenceServer(engine, host=args.host, port=args.port,
                                batch_size=args.batch_size,
                                max_wait_ms=args.max_wait_ms,
                                fast_decode=args.fast_decode)
    print(f"serving on {args.host}:{server.port} "
          f"(batch={args.batch_size}, wait={args.max_wait_ms}ms)")
    server.serve_forever()


if __name__ == "__main__":
    main()
