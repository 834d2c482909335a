"""Dynamic-batching inference server tests (in-process HTTP)."""

import io
import json
import os
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

from geoestimation_tpu.serve import GeoInferenceServer, MicroBatcher

RNG = np.random.default_rng(0)


def jpeg_bytes():
    arr = RNG.integers(0, 255, (300, 280, 3), dtype=np.uint8)
    b = io.BytesIO()
    Image.fromarray(arr).save(b, format="JPEG", quality=88)
    return b.getvalue()


class TestMicroBatcher:
    def test_batches_concurrent_requests(self):
        calls = []

        def fake_predict(images):
            calls.append(images.shape[0])
            n = images.shape[0]
            return {"hierarchy": (np.zeros(n, np.int32),
                                  np.full(n, 1.0, np.float32),
                                  np.full(n, 2.0, np.float32))}

        mb = MicroBatcher(fake_predict, batch_size=4, max_wait_ms=50,
                          base_size=8)
        imgs = [np.full((8, 8, 3), i, np.uint8) for i in range(6)]
        results = [None] * 6

        def work(i):
            results[i] = mb.submit(imgs[i])

        threads = [threading.Thread(target=work, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        mb.close()
        assert all(r["hierarchy"]["lat"] == 1.0 for r in results)
        stats = mb.stats()
        assert stats["requests"] == 6
        # 6 concurrent requests with batch_size=4 -> at most 3 batches
        assert stats["batches"] <= 3

    def test_error_propagates(self):
        def boom(images):
            raise RuntimeError("device on fire")

        mb = MicroBatcher(boom, batch_size=2, max_wait_ms=1, base_size=4)
        with pytest.raises(RuntimeError, match="device on fire"):
            mb.submit(np.zeros((4, 4, 3), np.uint8))
        mb.close()


@pytest.fixture(scope="module")
def server(geo_parts):
    from geoestimation_tpu.eval.engine import InferenceEngine
    from geoestimation_tpu.train.init import init_model_state
    from geoestimation_tpu.utils.config import Config

    config = Config()
    config.model_params.partitionings.files = []
    _, state = init_model_state(config, geo_parts, seed=0, image_size=64)
    engine = InferenceEngine(config, state, partitionings=geo_parts,
                             n_crops=1)
    srv = GeoInferenceServer(engine, port=0, batch_size=4, max_wait_ms=20)
    srv.start_background()
    yield srv
    srv.close()


class TestHTTP:
    def url(self, server, path):
        return f"http://127.0.0.1:{server.port}{path}"

    def test_healthz(self, server):
        with urllib.request.urlopen(self.url(server, "/healthz")) as r:
            data = json.loads(r.read())
        assert data["status"] == "ok"
        assert data["partitionings"] == ["coarse", "middle", "fine"]
        assert data["devices"]

    def test_predict(self, server):
        req = urllib.request.Request(
            self.url(server, "/predict"), data=jpeg_bytes(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            data = json.loads(r.read())
        preds = data["predictions"]
        assert set(preds) == {"coarse", "middle", "fine", "hierarchy"}
        for v in preds.values():
            assert set(v) == {"class", "lat", "lng"}
            assert -90 <= v["lat"] <= 90

    def test_bad_image_400(self, server):
        req = urllib.request.Request(
            self.url(server, "/predict"), data=b"not a jpeg",
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400

    def test_demo_page(self, server):
        """GET / serves the self-contained browser demo (the reference's
        gh-pages demo equivalent, reference README.md:69-71)."""
        for path in ("/", "/demo"):
            with urllib.request.urlopen(self.url(server, path)) as r:
                assert r.status == 200
                assert r.headers["Content-Type"].startswith("text/html")
                html = r.read().decode()
            # page must be self-contained: posts to /predict, draws the
            # map inline, and references no external origin
            assert "/predict" in html
            assert "<svg" in html
            assert "http://" not in html and "https://" not in html

    def test_stats(self, server):
        with urllib.request.urlopen(self.url(server, "/stats")) as r:
            data = json.loads(r.read())
        assert data["requests"] >= 1


class TestBatchPadding:
    def test_pad_slots_repeat_real_images(self):
        seen = []

        def fake_predict(images):
            seen.append(images.copy())
            n = len(images)
            return {"hierarchy": (np.zeros(n, np.int32),
                                  np.ones(n, np.float32),
                                  np.ones(n, np.float32))}

        mb = MicroBatcher(fake_predict, batch_size=4, max_wait_ms=1,
                          base_size=8)
        try:
            img = np.full((8, 8, 3), 200, np.uint8)
            mb.submit(img)
        finally:
            mb.close()
        # pad slots must carry real image data, not zeros — the int8
        # engine calibrates on its first batch and black padding would
        # bake underestimated activation scales
        batch = seen[0]
        assert (batch == 200).all()


class TestInt8Serving:
    def test_int8_engine_through_batcher(self, geo_parts):
        """Serving with --precision 8 semantics: int8 engine behind the
        micro-batcher — first batch self-calibrates, subsequent requests
        reuse the compiled int8 path."""
        from geoestimation_tpu.eval.engine import InferenceEngine
        from geoestimation_tpu.train.init import init_model_state
        from geoestimation_tpu.utils.config import Config

        config = Config()
        config.model_params.partitionings.files = []
        _, state = init_model_state(config, geo_parts, seed=0,
                                    image_size=64)
        engine = InferenceEngine(config, state, partitionings=geo_parts,
                                 n_crops=1, int8=True)
        mb = MicroBatcher(engine.predict_batch, batch_size=2,
                          max_wait_ms=1, base_size=256)
        try:
            img = np.random.default_rng(0).integers(
                0, 255, (256, 256, 3), dtype=np.uint8)
            out = mb.submit(img, timeout=600)
            assert set(out) == {"coarse", "middle", "fine", "hierarchy"}
            assert engine.int8_scales  # calibration happened
            out2 = mb.submit(img, timeout=600)
            assert out2["hierarchy"]["class"] == out["hierarchy"]["class"]
        finally:
            mb.close()

    def test_padded_batch_scales_not_persisted(self, geo_parts, tmp_path):
        """A serving batch padded from a single repeated image must NOT
        write the scales cache (ADVICE r2: noise/single-image scales
        silently poisoning all future runs) — only a sufficiently varied
        calibration source persists."""
        from geoestimation_tpu.eval.engine import InferenceEngine
        from geoestimation_tpu.train.init import init_model_state
        from geoestimation_tpu.utils.config import Config

        config = Config()
        config.model_params.partitionings.files = []
        _, state = init_model_state(config, geo_parts, seed=0,
                                    image_size=64)
        scales_path = str(tmp_path / "int8_scales.json")
        engine = InferenceEngine(config, state, partitionings=geo_parts,
                                 n_crops=1, int8=True,
                                 int8_scales_path=scales_path)
        img = np.random.default_rng(1).integers(
            0, 255, (256, 256, 3), dtype=np.uint8)
        batch = np.stack([img] * 4)  # micro-batcher pad pattern
        engine.predict_batch(batch)
        assert engine.int8_calib_source == "first_batch"
        assert not os.path.exists(scales_path)


class TestShardBatch:
    def test_sharded_engine_through_batcher_matches_unsharded(
            self, geo_parts):
        """`--shard_batch` (round-5): one server process spans all local
        chips — micro-batches shard over a data-parallel mesh and the
        predictions are identical to the single-device server's."""
        from geoestimation_tpu.eval.engine import InferenceEngine
        from geoestimation_tpu.parallel.mesh import make_mesh
        from geoestimation_tpu.train.init import init_model_state
        from geoestimation_tpu.utils.config import Config

        config = Config()
        config.model_params.partitionings.files = []
        _, state = init_model_state(config, geo_parts, seed=0,
                                    image_size=64)
        plain = InferenceEngine(config, state, partitionings=geo_parts,
                                n_crops=1)
        sharded = InferenceEngine(config, state, partitionings=geo_parts,
                                  n_crops=1, layout=make_mesh(8, 1))
        imgs = [RNG.integers(0, 255, (256, 256, 3), dtype=np.uint8)
                for _ in range(8)]
        mb = MicroBatcher(sharded.predict_batch, batch_size=8,
                          max_wait_ms=20, base_size=256)
        try:
            results = [None] * 8

            def work(i):
                results[i] = mb.submit(imgs[i], timeout=600)

            threads = [threading.Thread(target=work, args=(i,))
                       for i in range(8)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
        finally:
            mb.close()
        ref = plain.predict_batch(np.stack(imgs))
        for i, out in enumerate(results):
            assert out["hierarchy"]["class"] == int(ref["hierarchy"][0][i])

    def test_cli_rejects_indivisible_batch(self, tmp_path):
        """--shard_batch with a batch size the local device count can't
        split must fail loudly at startup, not at the first request.
        The batch size is derived from the live device count (n+1 is
        never divisible by n for n>1) rather than hard-coding the
        8-device conftest assumption."""
        import jax

        from geoestimation_tpu.serve.server import main

        n = len(jax.devices())
        if n == 1:
            pytest.skip("every batch divides by 1 local device")
        with pytest.raises(SystemExit):
            main(["--checkpoint", str(tmp_path / "nonexistent"),
                  "--shard_batch", "--batch_size", str(n + 1)])
