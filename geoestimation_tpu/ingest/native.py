"""ctypes binding to the C++ ingest extension (libjpeg decode + resize).

The reference's dataloader hot path was PIL/libjpeg in forked worker
processes (SURVEY.md §3.2). Here the native path is a small C++ library
(`ingest/cpp/ingest.cpp`) doing threaded decode + bilinear shorter-side
resize + center crop into one preallocated uint8 buffer — no Python in the
per-image loop. Falls back cleanly when the .so has not been built
(`decode.decode_batch(backend='pil')`).

Build: `make -C geoestimation_tpu/ingest/cpp` (needs libjpeg headers).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False

_SO_PATH = os.path.join(os.path.dirname(__file__), "cpp", "libgeoingest.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH):
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        base_args = [
            ctypes.POINTER(ctypes.c_char_p),   # blobs
            ctypes.POINTER(ctypes.c_size_t),   # blob lengths
            ctypes.c_int,                      # n
            ctypes.c_int,                      # resize_to
            ctypes.c_int,                      # base_size
            ctypes.c_void_p,                   # out uint8 buffer
            ctypes.POINTER(ctypes.c_uint8),    # ok mask
            ctypes.c_int,                      # n_threads
        ]
        lib.geoingest_decode_batch.restype = ctypes.c_int
        lib.geoingest_decode_batch.argtypes = base_args
        # _ex (flags arg: bit 0 = scaled DCT decode) may be absent from a
        # stale .so; fast_scale then falls back to the exact path.
        try:
            lib.geoingest_decode_batch_ex.restype = ctypes.c_int
            lib.geoingest_decode_batch_ex.argtypes = base_args + [
                ctypes.c_int,                  # flags
            ]
        except AttributeError:
            pass
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def decode_batch(blobs, resize_to=256, base_size=256, num_threads=0,
                 fast_scale=False):
    """Decode JPEG byte strings via the C++ extension.

    fast_scale=True decodes each image at the smallest libjpeg DCT scale
    (M/8) whose shorter side still covers `resize_to` before the exact
    antialiased resize — up to ~60x fewer IDCT pixels on large photos,
    with slightly different pixel values (opt-in; the parity path keeps
    full decode). Output geometry is identical either way.

    Returns (out[N, base, base, 3] uint8, ok[N] bool).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "native ingest library not built; run "
            "`make -C geoestimation_tpu/ingest/cpp`"
        )
    n = len(blobs)
    out = np.zeros((n, base_size, base_size, 3), dtype=np.uint8)
    ok = np.zeros(n, dtype=np.uint8)
    arr_blobs = (ctypes.c_char_p * n)(*blobs)
    arr_lens = (ctypes.c_size_t * n)(*[len(b) for b in blobs])
    common = (
        arr_blobs,
        arr_lens,
        n,
        resize_to,
        base_size,
        out.ctypes.data_as(ctypes.c_void_p),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(num_threads),
    )
    if fast_scale and hasattr(lib, "geoingest_decode_batch_ex"):
        lib.geoingest_decode_batch_ex(*common, 1)
    else:
        lib.geoingest_decode_batch(*common)
    return out, ok.astype(bool)
