"""C++ ingest extension vs PIL reference (SURVEY.md §3.2 native parity)."""

import io
import os
import subprocess

import numpy as np
import pytest
from PIL import Image

CPP_DIR = os.path.join(os.path.dirname(__file__), "..",
                       "geoestimation_tpu", "ingest", "cpp")


@pytest.fixture(scope="module")
def native_mod():
    build = subprocess.run(["make", "-C", CPP_DIR], capture_output=True,
                           text=True)
    if build.returncode != 0:
        pytest.skip(f"native ingest build failed: {build.stderr[-500:]}")
    import geoestimation_tpu.ingest.native as native

    native._TRIED = False  # force reload after build
    native._LIB = None
    if not native.available():
        pytest.skip("native ingest .so not loadable")
    return native


def jpeg(seed, w, h, quality=90):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    b = io.BytesIO()
    Image.fromarray(arr).save(b, format="JPEG", quality=quality)
    return b.getvalue()


class TestNativeIngest:
    def test_matches_pil_within_rounding(self, native_mod):
        from geoestimation_tpu.ingest import decode

        blobs = [jpeg(i, 463 - i, 317 + i) for i in range(8)]
        out_n, ok_n = native_mod.decode_batch(blobs, 256, 256)
        out_p, ok_p = decode.decode_batch(blobs, backend="pil")
        assert ok_n.all() and ok_p.all()
        d = np.abs(out_n.astype(int) - out_p.astype(int))
        assert d.max() <= 2
        assert d.mean() < 0.5

    def test_bad_blobs_flagged(self, native_mod):
        blobs = [jpeg(0, 300, 200), b"", b"not a jpeg",
                 jpeg(1, 64, 64)[:100]]
        out, ok = native_mod.decode_batch(blobs, 256, 256)
        np.testing.assert_array_equal(ok, [True, False, False, False])
        assert out[1].sum() == 0 and out[2].sum() == 0

    def test_small_image_upscaled(self, native_mod):
        blobs = [jpeg(2, 100, 80)]
        out, ok = native_mod.decode_batch(blobs, 256, 256)
        assert ok[0]
        assert out.shape == (1, 256, 256, 3)
        assert out[0].std() > 1  # actual content, not zeros

    def test_auto_backend_prefers_native(self, native_mod):
        from geoestimation_tpu.ingest import decode

        out, ok = decode.decode_batch([jpeg(3, 320, 240)], backend="auto")
        assert ok[0]
