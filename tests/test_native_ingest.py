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


def smooth_jpeg(w, h, quality=92):
    """Photo-like smooth content — the right fixture for scaled-decode
    tolerance (random noise has no stable downscale)."""
    y, x = np.mgrid[0:h, 0:w]
    arr = np.stack([
        127 + 120 * np.sin(x / 120) * np.cos(y / 170),
        127 + 120 * np.cos(x / 90 + 1) * np.sin(y / 210),
        (x + y) % 256,
    ], -1).astype(np.uint8)
    b = io.BytesIO()
    Image.fromarray(arr).save(b, format="JPEG", quality=quality)
    return b.getvalue()


class TestFastScale:
    """Scaled DCT decode (geoingest_decode_batch_ex flags bit 0 / PIL
    draft): opt-in host-ingest speed mode — identical geometry, near-
    identical pixels on large photos, exact no-op on small ones."""

    def test_close_to_exact_on_large_photo(self, native_mod):
        blobs = [smooth_jpeg(1400, 1000), smooth_jpeg(999, 1333)]
        exact, ok_e = native_mod.decode_batch(blobs, 256, 256)
        fast, ok_f = native_mod.decode_batch(blobs, 256, 256,
                                             fast_scale=True)
        np.testing.assert_array_equal(ok_e, ok_f)
        assert exact.shape == fast.shape
        d = np.abs(exact.astype(int) - fast.astype(int))
        # a geometry bug (wrong crop window from scaled dims) would show
        # up as a shift — huge mean error on this gradient content
        assert d.mean() < 1.5, d.mean()

    def test_noop_below_scale_threshold(self, native_mod):
        # short side 280: even the 7/8 scale (245) would undershoot 256,
        # so the scaled path must pick 8/8 == full decode, bit-identical
        blobs = [jpeg(11, 500, 280)]
        exact, _ = native_mod.decode_batch(blobs, 256, 256)
        fast, _ = native_mod.decode_batch(blobs, 256, 256, fast_scale=True)
        np.testing.assert_array_equal(exact, fast)

    def test_bad_blobs_still_flagged(self, native_mod):
        blobs = [smooth_jpeg(800, 600), b"", b"junk"]
        out, ok = native_mod.decode_batch(blobs, 256, 256, fast_scale=True)
        np.testing.assert_array_equal(ok, [True, False, False])

    def test_pil_draft_matches_exact_geometry(self):
        from geoestimation_tpu.ingest import decode

        blob = smooth_jpeg(1200, 900)
        exact = decode.decode_pil(blob)
        fast = decode.decode_pil(blob, fast_scale=True)
        assert exact.shape == fast.shape
        d = np.abs(exact.astype(int) - fast.astype(int))
        assert d.mean() < 1.5, d.mean()

    def test_pil_fast_scale_png_noop(self):
        from geoestimation_tpu.ingest import decode

        arr = np.random.default_rng(3).integers(
            0, 255, (300, 400, 3), dtype=np.uint8)
        b = io.BytesIO()
        Image.fromarray(arr).save(b, format="PNG")
        exact = decode.decode_pil(b.getvalue())
        fast = decode.decode_pil(b.getvalue(), fast_scale=True)
        np.testing.assert_array_equal(exact, fast)

    def test_iter_image_folder_fast_decode(self, native_mod, tmp_path):
        from geoestimation_tpu.data.image_folder import iter_image_folder

        for i in range(5):
            (tmp_path / f"img_{i}.jpg").write_bytes(smooth_jpeg(900, 700))
        batches = list(iter_image_folder(str(tmp_path), batch_size=4,
                                         fast_decode=True))
        assert sum(int(np.asarray(b.valid).sum()) for b in batches) == 5
        assert batches[0].images.shape == (4, 256, 256, 3)
