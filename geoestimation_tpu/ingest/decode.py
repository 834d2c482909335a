"""Host-side JPEG decode + geometry normalization.

Design boundary (SURVEY.md §8 "Hard parts"): XLA has no JPEG op, so decode
runs on host; *everything after decode* (crop geometry, normalization,
dtype) is XLA-resident (`ingest/pipeline.py`). The host stage emits a
static-shape uint8 tensor — (N, base_size, base_size, 3) — which is the
whole host->device contract: one small uint8 transfer per batch, no float
traffic over PCIe.

Two host decode backends:
  * `turbo`: the C++ extension in `ingest/cpp/` (libjpeg + bilinear
    shorter-side resize + center crop in native threads). Used when built.
  * `pil`: Pillow fallback, threaded (PIL's decode/resize release the GIL).

Geometry matches torchvision eval semantics: resize shorter side to
`resize_to` with bilinear+antialias, then center-crop `base_size` square.
The reference's eval transform resized to 256 before 224-crops
(SURVEY.md §3.1 dataset row); we center-crop to a 256 square on host so the
device sees a static shape, and take the 224 crops on device.
"""

from __future__ import annotations

import concurrent.futures as cf
import io
import os
from typing import Iterable, Optional, Sequence

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

from . import native

DEFAULT_RESIZE = 256
DEFAULT_BASE = 256
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def decode_pil(data: bytes, resize_to=DEFAULT_RESIZE, base_size=DEFAULT_BASE,
               fast_scale=False):
    """bytes -> (base_size, base_size, 3) uint8. PIL reference path.

    fast_scale=True uses PIL's JPEG draft mode (scaled DCT decode, same
    trick as the native path's flags bit 0): the decoder itself emits the
    smallest 1/2^k scale covering `resize_to`, and the final resize still
    targets the geometry derived from the ORIGINAL dims — identical
    shapes, slightly different pixels, several times faster on large
    photos. No-op for non-JPEG formats and for already-small images.
    """
    img = Image.open(io.BytesIO(data))
    w, h = img.size  # header dims, pre-draft: geometry source of truth
    if fast_scale:
        img.draft("RGB", (resize_to, resize_to))
    img = img.convert("RGB")
    scale = resize_to / min(w, h)
    # Resize shorter side; never upscale-skip (keeps torchvision semantics).
    nw, nh = max(int(round(w * scale)), resize_to), max(
        int(round(h * scale)), resize_to
    )
    img = img.resize((nw, nh), Image.BILINEAR)
    left = (nw - base_size) // 2
    top = (nh - base_size) // 2
    img = img.crop((left, top, left + base_size, top + base_size))
    return np.asarray(img, dtype=np.uint8)


def decode_batch(
    blobs: Sequence[bytes],
    resize_to=DEFAULT_RESIZE,
    base_size=DEFAULT_BASE,
    num_threads: Optional[int] = None,
    backend: str = "auto",
    fast_scale: bool = False,
):
    """Decode many JPEG byte strings -> (N, base, base, 3) uint8.

    backend: 'auto' (native if built), 'turbo', or 'pil'.
    fast_scale: scaled DCT decode for JPEGs (see decode_pil) — several
    times faster host ingest on large photos, slightly different pixels;
    OFF on the default parity path.
    Undecodable blobs yield a zero image and are flagged in the returned
    `ok` mask (the reference's downloader tolerates rotten images,
    README.md:192-194 — eval code must too).
    """
    if backend == "auto":
        backend = "turbo" if native.available() else "pil"
    if backend == "turbo":
        # The native decoder is JPEG-only; route other formats (PNG is
        # part of the eval-folder contract, reference README.md:110)
        # through PIL by sniffing the JPEG magic bytes.
        is_jpeg = [b[:2] == b"\xff\xd8" for b in blobs]
        if all(is_jpeg):
            return native.decode_batch(blobs, resize_to, base_size,
                                       num_threads=num_threads or 0,
                                       fast_scale=fast_scale)
        out = np.zeros((len(blobs), base_size, base_size, 3), np.uint8)
        ok = np.zeros(len(blobs), bool)
        jpeg_idx = [i for i, j in enumerate(is_jpeg) if j]
        if jpeg_idx:
            sub, sub_ok = native.decode_batch(
                [blobs[i] for i in jpeg_idx], resize_to, base_size,
                num_threads=num_threads or 0, fast_scale=fast_scale,
            )
            out[jpeg_idx], ok[jpeg_idx] = sub, sub_ok
        other_idx = [i for i, j in enumerate(is_jpeg) if not j]
        sub, sub_ok = decode_batch(
            [blobs[i] for i in other_idx], resize_to, base_size,
            num_threads, backend="pil", fast_scale=fast_scale,
        )
        out[other_idx], ok[other_idx] = sub, sub_ok
        return out, ok

    n = len(blobs)
    out = np.zeros((n, base_size, base_size, 3), dtype=np.uint8)
    ok = np.zeros(n, dtype=bool)

    def work(i):
        try:
            out[i] = decode_pil(blobs[i], resize_to, base_size,
                                fast_scale=fast_scale)
            ok[i] = True
        except Exception:
            pass

    workers = num_threads or min(16, (os.cpu_count() or 1) * 2)
    if n == 1:
        work(0)
    else:
        with cf.ThreadPoolExecutor(workers) as ex:
            list(ex.map(work, range(n)))
    return out, ok


def decode_pil_tencrop(data: bytes, resize_to=DEFAULT_RESIZE, crop=224):
    """bytes -> (10, crop, crop, 3) uint8 with torchvision-exact geometry.

    Resize shorter side to `resize_to`, then TenCrop on the full resized
    rectangle (4 corners + center of the W x resize_to / resize_to x H
    image, plus horizontal flips) — the reference eval transform
    (SURVEY.md §3.1 dataset row). The default device path crops a center
    square first (static shapes); this host path exists for bit-parity
    evaluation of imported reference checkpoints on non-square images
    (docs/MIGRATION.md difference #2).
    """
    img = Image.open(io.BytesIO(data)).convert("RGB")
    w, h = img.size
    # torchvision Resize(int) semantics: shorter side -> resize_to, longer
    # side floor-scaled (int(size * long / short)), not rounded.
    if w <= h:
        nw, nh = resize_to, int(resize_to * h / w)
    else:
        nw, nh = int(resize_to * w / h), resize_to
    img = img.resize((nw, nh), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.uint8)
    cc_top, cc_left = (nh - crop) // 2, (nw - crop) // 2
    offsets = [
        (0, 0), (0, nw - crop), (nh - crop, 0), (nh - crop, nw - crop),
        (cc_top, cc_left),
    ]
    crops = [arr[t:t + crop, l:l + crop] for t, l in offsets]
    crops += [c[:, ::-1] for c in crops]
    return np.stack(crops)


def decode_batch_tencrop(blobs, resize_to=DEFAULT_RESIZE, crop=224,
                         num_threads: Optional[int] = None):
    """Decode + exact ten-crop many blobs -> ((N, 10, crop, crop, 3), ok)."""
    n = len(blobs)
    out = np.zeros((n, 10, crop, crop, 3), dtype=np.uint8)
    ok = np.zeros(n, dtype=bool)

    def work(i):
        try:
            out[i] = decode_pil_tencrop(blobs[i], resize_to, crop)
            ok[i] = True
        except Exception:
            pass

    workers = num_threads or min(16, (os.cpu_count() or 1) * 2)
    with cf.ThreadPoolExecutor(workers) as ex:
        list(ex.map(work, range(n)))
    return out, ok


def read_files(paths: Iterable[str]):
    blobs = []
    for p in paths:
        try:
            with open(p, "rb") as f:
                blobs.append(f.read())
        except OSError:
            blobs.append(b"")
    return blobs
