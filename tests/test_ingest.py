"""Ingest tests: decode vs PIL reference, crop geometry, normalization
(SURVEY.md §7: "ingest-pipeline crop/normalize vs PIL reference within
tolerance")."""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from geoestimation_tpu.ingest import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    center_crop,
    decode_batch,
    decode_pil,
    eval_pipeline,
    five_crop,
    make_crops,
    normalize,
    random_crop_flip,
    ten_crop,
)


def make_jpeg(w, h, seed=0):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


class TestDecode:
    def test_shapes_landscape_portrait_square(self):
        for w, h in [(640, 480), (480, 640), (300, 300), (256, 256),
                     (100, 80)]:
            img = decode_pil(make_jpeg(w, h))
            assert img.shape == (256, 256, 3)
            assert img.dtype == np.uint8

    def test_batch_decode_with_failures(self):
        blobs = [make_jpeg(320, 240), b"not a jpeg", make_jpeg(200, 400),
                 b""]
        out, ok = decode_batch(blobs, backend="pil")
        assert out.shape == (4, 256, 256, 3)
        np.testing.assert_array_equal(ok, [True, False, True, False])
        assert out[1].sum() == 0 and out[3].sum() == 0

    def test_resize_shorter_side_semantics(self):
        # 512x256 landscape: shorter side 256 -> no resize, center crop in w.
        rng = np.random.default_rng(1)
        arr = rng.integers(0, 255, (256, 512, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        img = decode_pil(buf.getvalue())
        np.testing.assert_array_equal(img, arr[:, 128:384])


class TestExactTenCrop:
    def test_geometry_on_nonsquare(self):
        from geoestimation_tpu.ingest.decode import decode_pil_tencrop

        rng = np.random.default_rng(0)
        arr = rng.integers(0, 255, (256, 512, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        crops = decode_pil_tencrop(buf.getvalue())
        assert crops.shape == (10, 224, 224, 3)
        # shorter side already 256 -> no resize; corners come from the FULL
        # 512-wide image, not a center square
        np.testing.assert_array_equal(crops[0], arr[:224, :224])
        np.testing.assert_array_equal(crops[1], arr[:224, 512 - 224:])
        np.testing.assert_array_equal(crops[4],
                                      arr[16:240, 144:368])  # center
        np.testing.assert_array_equal(crops[5], crops[0][:, ::-1])

    def test_batch_and_engine_path(self, ):
        from geoestimation_tpu.ingest.decode import decode_batch_tencrop

        rng = np.random.default_rng(1)
        blobs = []
        for i in range(3):
            arr = rng.integers(0, 255, (300, 280, 3), dtype=np.uint8)
            b = io.BytesIO()
            Image.fromarray(arr).save(b, format="JPEG")
            blobs.append(b.getvalue())
        blobs.append(b"bad")
        out, ok = decode_batch_tencrop(blobs)
        assert out.shape == (4, 10, 224, 224, 3)
        np.testing.assert_array_equal(ok, [True, True, True, False])

    def test_square_matches_device_path(self):
        # for a square image the exact host crops equal the device path's
        # crops from the 256 center square
        from geoestimation_tpu.ingest.decode import (
            decode_pil,
            decode_pil_tencrop,
        )

        rng = np.random.default_rng(2)
        arr = rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        host = decode_pil_tencrop(buf.getvalue())
        square = decode_pil(buf.getvalue())
        device = np.asarray(ten_crop(jnp.asarray(square[None]), 224))[0]
        np.testing.assert_array_equal(host, device)


class TestDevicePipeline:
    def test_normalize_values(self):
        u8 = jnp.full((1, 4, 4, 3), 255, jnp.uint8)
        out = np.asarray(normalize(u8, dtype=jnp.float32))
        expect = (1.0 - np.array(IMAGENET_MEAN)) / np.array(IMAGENET_STD)
        np.testing.assert_allclose(out[0, 0, 0], expect, rtol=1e-5)

    def test_center_crop(self):
        x = jnp.arange(1 * 8 * 8 * 1).reshape(1, 8, 8, 1)
        c = center_crop(x, 4)
        np.testing.assert_array_equal(np.asarray(c), np.asarray(x)[:, 2:6, 2:6])

    def test_five_crop_corners(self):
        rng = np.random.default_rng(0)
        x = jnp.array(rng.integers(0, 255, (2, 256, 256, 3), dtype=np.uint8))
        f = np.asarray(five_crop(x, 224))
        assert f.shape == (2, 5, 224, 224, 3)
        xa = np.asarray(x)
        np.testing.assert_array_equal(f[:, 0], xa[:, :224, :224])
        np.testing.assert_array_equal(f[:, 1], xa[:, :224, 32:])
        np.testing.assert_array_equal(f[:, 2], xa[:, 32:, :224])
        np.testing.assert_array_equal(f[:, 3], xa[:, 32:, 32:])
        np.testing.assert_array_equal(f[:, 4], xa[:, 16:240, 16:240])

    def test_ten_crop_flips(self):
        rng = np.random.default_rng(0)
        x = jnp.array(rng.integers(0, 255, (1, 256, 256, 3), dtype=np.uint8))
        t = np.asarray(ten_crop(x, 224))
        assert t.shape == (1, 10, 224, 224, 3)
        for k in range(5):
            np.testing.assert_array_equal(t[:, 5 + k], t[:, k, :, ::-1])

    def test_make_crops_single(self):
        x = jnp.zeros((2, 256, 256, 3), jnp.uint8)
        assert make_crops(x, 1).shape == (2, 1, 224, 224, 3)
        with pytest.raises(ValueError):
            make_crops(x, 3)

    def test_eval_pipeline_fold(self):
        x = jnp.zeros((2, 256, 256, 3), jnp.uint8)
        out = eval_pipeline(x, n_crops=10, dtype=jnp.float32)
        assert out.shape == (20, 224, 224, 3)

    def test_random_crop_flip_static_shape_and_content(self):
        rng = np.random.default_rng(0)
        x = jnp.array(rng.integers(0, 255, (4, 256, 256, 3), dtype=np.uint8))
        out = random_crop_flip(jax.random.PRNGKey(0), x, crop=224)
        assert out.shape == (4, 224, 224, 3)
        # Each output crop must be a sub-window (possibly flipped) of its
        # input: check pixel membership per row sum heuristic.
        xa, oa = np.asarray(x), np.asarray(out)
        for i in range(4):
            found = False
            for flip in (False, True):
                cand = xa[i, :, ::-1] if flip else xa[i]
                for top in range(0, 33, 8):
                    for left in range(0, 33, 8):
                        if np.array_equal(
                            cand[top:top + 224, left:left + 224], oa[i]
                        ):
                            found = True
            # offsets are random in [0,32]; sample grid of 8 may miss, so
            # fall back to exhaustive search only if needed
            if not found:
                for flip in (False, True):
                    cand = xa[i, :, ::-1] if flip else xa[i]
                    for top in range(33):
                        for left in range(33):
                            if np.array_equal(
                                cand[top:top + 224, left:left + 224], oa[i]
                            ):
                                found = True
                                break
                        if found:
                            break
                    if found:
                        break
            assert found
