"""`--calib_stat auto`: calibration-time selection of the PTQ statistic.

Round-4 VERDICT: no fixed stat passes the 0.5-pt budget on every study
corpus (the ranking inverts between fixed- and mixed-geometry worlds),
so the shipped default scores {absmax, p999, p9999} against the fp32
forward on the calibration images (quant.autoselect_scales — the same
parity proxy QAT retention uses) and ships the winner.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geoestimation_tpu.models.quant import (
    AUTO_CANDIDATE_STATS,
    autoselect_scales,
    build_int8_apply_dynamic,
    calibrate_samples,
    derive_scales,
    quantize_model,
)
from geoestimation_tpu.train.init import init_model_state
from geoestimation_tpu.utils.config import Config

N_CLASSES = (3, 5, 7)
ARCH = "resnet14"
CROP, BASE = 64, 96


@pytest.fixture(scope="module")
def tiny(geo_parts):
    config = Config()
    config.model_params.partitionings.files = []
    config.model_params.arch = ARCH
    _, state = init_model_state(config, geo_parts, seed=0,
                                image_size=CROP)
    variables = {"params": state["params"],
                 "batch_stats": state["batch_stats"]}
    n_classes = tuple(len(p) for p in geo_parts)
    rng = np.random.default_rng(7)
    batches = [rng.integers(0, 255, (4, BASE, BASE, 3), dtype=np.uint8)
               for _ in range(2)]
    return config, variables, n_classes, batches


class TestAutoselect:
    def test_picks_argmin_of_parity_proxy(self, tiny):
        """The pick IS the candidate with minimum summed per-head
        KL(fp32 ‖ int8) on the calibration crops — re-derived here from
        the same public pieces (derive_scales + the dynamic int8 graph
        + qat.teacher_student_kl) so the selection rule can't silently
        change."""
        from geoestimation_tpu.ingest.pipeline import eval_pipeline_s8
        from geoestimation_tpu.models.qat import (
            build_qat_apply,
            fold_variables,
            teacher_student_kl,
        )

        _, variables, n_classes, batches = tiny
        qnet = quantize_model(variables, ARCH)
        samples = calibrate_samples(variables, batches, arch=ARCH,
                                    n_crops=1, crop=CROP)
        scales, picked, kls = autoselect_scales(
            variables, batches, qnet, arch=ARCH, n_classes=n_classes,
            n_crops=1, crop=CROP, samples=samples)
        assert picked in AUTO_CANDIDATE_STATS
        assert set(kls) == set(AUTO_CANDIDATE_STATS)
        assert scales == derive_scales(samples, picked, 1.0)

        # independent re-derivation of the proxy for every candidate
        folded = fold_variables(variables, arch=ARCH)
        teacher = jax.jit(build_qat_apply(ARCH, scales,
                                          n_classes=n_classes,
                                          fake_quant=False))
        dyn = jax.jit(build_int8_apply_dynamic(qnet, n_classes=n_classes))
        expect = {}
        for stat in AUTO_CANDIDATE_STATS:
            ss = {k: np.float32(v)
                  for k, v in derive_scales(samples, stat, 1.0).items()}
            tot, n = 0.0, 0
            for u8 in batches:
                x = eval_pipeline_s8(jnp.asarray(u8), n_crops=1, crop=CROP)
                t = teacher(folded, x.astype(jnp.float32))
                tot += len(u8) * float(teacher_student_kl(t, dyn(x, ss)))
                n += len(u8)
            expect[stat] = tot / n
        for stat in AUTO_CANDIDATE_STATS:
            assert kls[stat] == pytest.approx(expect[stat], rel=1e-4)
        assert picked == min(AUTO_CANDIDATE_STATS, key=lambda s: expect[s])

    def test_rejects_outlier_poisoned_absmax(self, tiny):
        """An absmax record blown up by a single activation outlier
        (1000x the percentile tail at every site) produces a uselessly
        coarse grid; the selection must not ship it."""
        _, variables, n_classes, batches = tiny
        qnet = quantize_model(variables, ARCH)
        samples = calibrate_samples(variables, batches, arch=ARCH,
                                    n_crops=1, crop=CROP)
        poisoned = {k: (1000.0 * max(m, 1e-3), pool)
                    for k, (m, pool) in samples.items()}
        _, picked, kls = autoselect_scales(
            variables, batches, qnet, arch=ARCH, n_classes=n_classes,
            n_crops=1, crop=CROP, samples=poisoned)
        assert picked != "absmax"
        assert kls["absmax"] > min(kls["p999"], kls["p9999"])

    def test_deterministic(self, tiny):
        _, variables, n_classes, batches = tiny
        qnet = quantize_model(variables, ARCH)
        a = autoselect_scales(variables, batches, qnet, arch=ARCH,
                              n_classes=n_classes, n_crops=1, crop=CROP)
        b = autoselect_scales(variables, batches, qnet, arch=ARCH,
                              n_classes=n_classes, n_crops=1, crop=CROP)
        assert a[1] == b[1]
        assert a[0] == b[0]


class TestEngineAuto:
    def test_engine_defaults_to_auto_and_records_pick(self, tiny,
                                                      geo_parts,
                                                      tmp_path):
        """The engine's shipped default is calib_stat='auto'; the
        provenance records 'auto:<picked>' and the persisted scales are
        exactly the picked stat's grid point."""
        from geoestimation_tpu.eval.engine import InferenceEngine

        config, variables, n_classes, batches = tiny
        state = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
        path = str(tmp_path / "scales.json")
        eng = InferenceEngine(config, state, partitionings=geo_parts,
                              n_crops=1, crop=CROP, int8=True,
                              int8_scales_path=path)
        assert eng._calib_stat == "auto"
        images = np.concatenate(batches, axis=0)  # 8 distinct images
        eng.predict_batch(images)
        assert eng.int8_calib_stat.startswith("auto:")
        picked = eng.int8_calib_stat.split(":", 1)[1]
        assert picked in AUTO_CANDIDATE_STATS
        obj = json.load(open(path))
        assert obj["provenance"]["stat"] == eng.int8_calib_stat
        samples = calibrate_samples(state, [images], arch=ARCH,
                                    n_crops=1, crop=CROP)
        expect = derive_scales(samples, picked, 1.0)
        for k, v in obj["scales"].items():
            assert v == pytest.approx(expect[k], rel=1e-6)

    def test_auto_request_trusts_auto_cache(self, tiny, geo_parts,
                                            tmp_path, monkeypatch):
        """--calib_dir with the auto default: a cache whose provenance
        stat is 'auto:<picked>' from the same set satisfies a new
        'auto' request (the pick is deterministic in the pinned
        inputs), so server restarts skip the selection pass."""
        from PIL import Image

        import geoestimation_tpu.models.quant as quant
        from geoestimation_tpu.eval.engine import InferenceEngine

        config, variables, n_classes, batches = tiny
        state = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
        calib_dir = tmp_path / "calib"
        calib_dir.mkdir()
        for i, im in enumerate(np.concatenate(batches, axis=0)):
            Image.fromarray(im).save(calib_dir / f"c{i:02d}.jpg",
                                     quality=92)
        path = str(tmp_path / "scales.json")
        kw = dict(partitionings=geo_parts, n_crops=1, crop=CROP,
                  int8=True, int8_scales_path=path,
                  calib_dir=str(calib_dir), calib_images=8)
        eng = InferenceEngine(config, state, **kw)
        images = np.concatenate(batches, axis=0)
        eng.predict_batch(images)
        assert eng.int8_calib_source == "calib_dir"
        assert eng.int8_calib_stat.startswith("auto:")

        real_calibrate = quant.calibrate
        real_samples = quant.calibrate_samples

        def boom(*a, **k):
            raise AssertionError("calibration ran despite auto cache")

        monkeypatch.setattr(quant, "calibrate", boom)
        monkeypatch.setattr(quant, "calibrate_samples", boom)
        eng2 = InferenceEngine(config, state, **kw)
        eng2.predict_batch(images)
        assert eng2.int8_calib_source == "cache"
        assert eng2.int8_calib_stat == eng.int8_calib_stat

        # a FIXED stat request must not trust the auto cache
        monkeypatch.setattr(quant, "calibrate", real_calibrate)
        monkeypatch.setattr(quant, "calibrate_samples", real_samples)
        eng3 = InferenceEngine(config, state, calib_stat="p999", **kw)
        eng3.predict_batch(images)
        assert eng3.int8_calib_source == "calib_dir"
        assert eng3.int8_calib_stat == "p999"

    def test_cache_settings_checked_without_calib_dir(self, tiny,
                                                      geo_parts,
                                                      tmp_path):
        """Round-5 review fix: a cache recorded at a different
        stat/headroom must not silently satisfy the requested
        --calib_stat even WITHOUT --calib_dir — otherwise the new auto
        default (or any explicit stat) is inert on a deployment with a
        pre-existing cache."""
        from geoestimation_tpu.eval.engine import InferenceEngine

        config, variables, n_classes, batches = tiny
        state = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
        path = str(tmp_path / "scales.json")
        images = np.concatenate(batches, axis=0)
        kw = dict(partitionings=geo_parts, n_crops=1, crop=CROP,
                  int8=True, int8_scales_path=path)

        fixed = InferenceEngine(config, state, calib_stat="p999", **kw)
        fixed.predict_batch(images)
        assert json.load(open(path))["provenance"]["stat"] == "p999"

        # auto request sees a p999 cache: must NOT trust it
        auto = InferenceEngine(config, state, **kw)
        auto.predict_batch(images)
        assert auto.int8_calib_source == "first_batch"
        assert auto.int8_calib_stat.startswith("auto:")
        assert json.load(open(path))["provenance"]["stat"] \
            == auto.int8_calib_stat

        # matching fixed request trusts its own cache; a different
        # headroom does not
        fixed2 = InferenceEngine(config, state, calib_stat="p999", **kw)
        fixed2.predict_batch(images)
        assert fixed2.int8_calib_source == "first_batch"  # auto cache
        hr = InferenceEngine(config, state, calib_stat="p999",
                             calib_headroom=1.05, **kw)
        hr.predict_batch(images)
        assert hr.int8_calib_source == "first_batch"
        assert json.load(open(path))["provenance"]["headroom"] == 1.05

    def test_fixed_stat_still_forces(self, tiny, geo_parts, tmp_path):
        from geoestimation_tpu.eval.engine import InferenceEngine

        config, variables, n_classes, batches = tiny
        state = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
        path = str(tmp_path / "scales.json")
        eng = InferenceEngine(config, state, partitionings=geo_parts,
                              n_crops=1, crop=CROP, int8=True,
                              int8_scales_path=path, calib_stat="p9999")
        eng.predict_batch(np.concatenate(batches, axis=0))
        assert eng.int8_calib_stat == "p9999"
        obj = json.load(open(path))
        assert obj["provenance"]["stat"] == "p9999"
