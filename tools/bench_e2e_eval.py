"""End-to-end eval throughput INCLUDING host ingest (round-3, VERDICT
weak #5).

`bench.py` deliberately excludes host decode (the chip is the production
bottleneck when hosts have enough cores); this tool produces the missing
evidence: it drives the REAL folder pipeline — JPEG files on disk ->
`iter_image_folder` (background decode thread) -> device forward — and
reports

  * end-to-end img/s (wall clock over the whole corpus),
  * device-busy fraction (sum of fenced per-batch device times / wall),
  * the standalone host decode rate (img/s/core on THIS host), and
  * the derived host-cores-per-chip budget: how many decode cores one
    chip needs so ingest overlaps compute and the chip stays the
    bottleneck (device_rate / decode_rate_per_core).

On this sandbox's single host core the e2e number is host-bound by
construction — the artifact is the overlap/idle measurement and the
budget formula, replacing the round-2 extrapolation
(docs/PERF_NOTES.md).

Usage:
  python tools/bench_e2e_eval.py                  # TPU, int8, 1024 imgs
  python tools/bench_e2e_eval.py --cpu --arch resnet14 --n_images 64 \
      --precision bf16 --crops 1                  # CI smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def generate_corpus(out_dir, n_images, seed=0, img_size=0):
    """Textured JPEGs (tools/make_demo_world.textured_image) — realistic
    decode cost, varied content. img_size=0 keeps the historical small
    near-base sizes (256-340 px); img_size=N emits ~N-px photos (use
    ~1024 for Flickr-typical decode cost, where --fast_decode pays)."""
    from tools.make_demo_world import textured_image

    rng = np.random.default_rng(seed)
    if img_size:
        s = img_size
        sizes = [(s, s * 3 // 4), (s * 3 // 4, s), (s, s * 2 // 3),
                 (s * 7 // 8, s * 7 // 8)]
    else:
        sizes = [(320, 280), (340, 256), (280, 300), (256, 256)]
    for i in range(n_images):
        w, h = sizes[i % len(sizes)]
        blob = textured_image(rng, i % 3, i % 4, w, h)
        with open(os.path.join(out_dir, f"img_{i:05d}.jpg"), "wb") as f:
            f.write(blob)


def build_forward(arch, precision, n_crops):
    """Synthetic-weights forward like bench.py: uint8 base batch ->
    predictions. Returns a jitted fn."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import REAL_CLASS_COUNTS, _synthetic_harrays
    from geoestimation_tpu.eval.infer import (
        mean_tta_logits,
        predict_hierarchical,
    )
    from geoestimation_tpu.models import MultiPartitioningClassifier

    model = MultiPartitioningClassifier(
        n_classes=REAL_CLASS_COUNTS, arch=arch, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32),
        train=False)
    harrays = _synthetic_harrays(REAL_CLASS_COUNTS)

    if precision == "int8":
        from geoestimation_tpu.ingest.pipeline import eval_pipeline_s8
        from geoestimation_tpu.models.quant import (
            build_int8_apply,
            calibrate,
            quantize_model,
        )

        calib = np.random.default_rng(123).integers(
            0, 255, (8, 256, 256, 3), dtype=np.uint8)
        scales = calibrate(variables, [calib], arch=arch,
                           n_crops=n_crops, crop=224)
        qnet = quantize_model(variables, arch=arch)
        int8_apply = build_int8_apply(qnet, scales,
                                      n_classes=REAL_CLASS_COUNTS)

        @jax.jit
        def forward(images_u8):
            x = eval_pipeline_s8(images_u8, n_crops=n_crops, crop=224)
            logits = int8_apply(x)
            logits = [mean_tta_logits(l, n_crops) for l in logits]
            return predict_hierarchical(logits, harrays)
    else:
        from geoestimation_tpu.ingest.pipeline import eval_pipeline

        @jax.jit
        def forward(images_u8):
            x = eval_pipeline(images_u8, n_crops=n_crops, crop=224,
                              dtype=jnp.bfloat16)
            logits = model.apply(variables, x, train=False)
            logits = [mean_tta_logits(l, n_crops) for l in logits]
            return predict_hierarchical(logits, harrays)

    return forward


def main(argv=None):
    p = argparse.ArgumentParser(
        description="e2e eval throughput incl. host ingest")
    p.add_argument("--image_dir", default=None,
                   help="existing corpus (default: generate one)")
    p.add_argument("--n_images", type=int, default=1024)
    p.add_argument("--img_size", type=int, default=0,
                   help="generated-corpus photo size (0: historical "
                        "256-340 px; ~1024 for Flickr-typical)")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--crops", type=int, default=10, choices=[1, 5, 10])
    p.add_argument("--precision", default="int8",
                   choices=["int8", "bf16"])
    p.add_argument("--arch", default="resnet50")
    p.add_argument("--num_workers", type=int, default=None,
                   help="decode threads (default: cpu count)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--fast_decode", action="store_true",
                   help="scaled DCT JPEG decode (ingest.decode fast_scale)"
                        " — the production host-ingest mode for large "
                        "photos; measured alongside the budget numbers")
    p.add_argument("--json", dest="json_out", default=None)
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        # persistent compile cache (same as bench.py)
        import jax

        cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax

    from geoestimation_tpu.data.image_folder import iter_image_folder
    from geoestimation_tpu.ingest import decode

    tmp = None
    image_dir = args.image_dir
    if image_dir is None:
        tmp = tempfile.TemporaryDirectory(prefix="e2e_corpus_")
        image_dir = tmp.name
        t0 = time.perf_counter()
        generate_corpus(image_dir, args.n_images, img_size=args.img_size)
        print(f"generated {args.n_images} JPEGs in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)

    forward = build_forward(args.arch, args.precision, args.crops)

    # warmup / compile on one batch
    for fb in iter_image_folder(image_dir, batch_size=args.batch_size,
                                num_workers=args.num_workers,
                                fast_decode=args.fast_decode):
        import jax.numpy as jnp

        out = forward(jnp.asarray(fb.images))
        jax.device_get(jax.tree.leaves(out)[0][:1])
        break

    # standalone host decode rate (img/s/core on this host)
    paths = sorted(os.listdir(image_dir))[:min(256, args.n_images)]
    blobs = decode.read_files([os.path.join(image_dir, p)
                               for p in paths])
    t0 = time.perf_counter()
    decode.decode_batch(blobs, resize_to=256, base_size=256,
                        num_threads=1, fast_scale=args.fast_decode)
    decode_rate_1core = len(blobs) / (time.perf_counter() - t0)

    # the measured run: real folder pipeline, decode prefetch overlapping
    # device compute; each batch's device time is fenced (scalar
    # readback — block_until_ready under-reports through the tunnel)
    import jax.numpy as jnp

    n_done = 0
    device_busy = 0.0
    wall0 = time.perf_counter()
    for fb in iter_image_folder(image_dir, batch_size=args.batch_size,
                                num_workers=args.num_workers,
                                fast_decode=args.fast_decode):
        t0 = time.perf_counter()
        out = forward(jnp.asarray(fb.images))
        jax.device_get(jax.tree.leaves(out)[0][:1])
        device_busy += time.perf_counter() - t0
        n_done += int(np.asarray(fb.valid).sum())
    wall = time.perf_counter() - wall0

    # device-RESIDENT rate: batch preloaded on device, no per-step
    # host->device transfer. On a tunneled chip the e2e loop's
    # "device" time includes the tunnel transfer of each uint8 batch
    # (~12.6 MB at b64) — the resident rate is the chip's own speed and
    # the right numerator for the host-cores budget (host-attached TPUs
    # pay PCIe/DMA, not a tunnel).
    dev_images = jax.device_put(jnp.asarray(fb.images))
    out = forward(dev_images)
    jax.device_get(jax.tree.leaves(out)[0][:1])
    t0 = time.perf_counter()
    for _ in range(10):
        out = forward(dev_images)
    jax.device_get(jax.tree.leaves(out)[0][:1])
    resident_rate = 10 * fb.images.shape[0] / (time.perf_counter() - t0)

    device_rate = n_done / device_busy if device_busy else float("nan")
    e2e_rate = n_done / wall
    result = {
        "metric": "e2e_eval_images_per_sec",
        "value": round(e2e_rate, 2),
        "unit": "images/sec (incl. host ingest)",
        "n_images": n_done,
        "batch_size": args.batch_size,
        "crops": args.crops,
        "precision": args.precision,
        "fast_decode": bool(args.fast_decode),
        "img_size": args.img_size,
        "arch": args.arch,
        "platform": jax.devices()[0].platform,
        "device_busy_frac": round(device_busy / wall, 4),
        "device_plus_transfer_images_per_sec": round(device_rate, 2),
        "device_resident_images_per_sec": round(resident_rate, 2),
        "host_decode_images_per_sec_per_core": round(decode_rate_1core, 2),
        "host_cores_per_chip_budget": round(
            resident_rate / decode_rate_1core, 2),
    }
    print(json.dumps(result))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(result, f, indent=1)
    if tmp:
        tmp.cleanup()
    return 0


if __name__ == "__main__":
    sys.exit(main())
