"""Int8 accuracy-study harness (tools/quant_study.py) on a varied world.

Round-3 (VERDICT weak #1): the throughput headline rides on int8 PTQ, so
the flip-rate / GCD-delta study that justifies it must itself be pinned
by CI: on a TEXTURED demo world (multi-octave noise, gradients, outlier
blobs — not color blobs) with a trained checkpoint, the absmax-calibrated
int8 path must agree with fp32 within budget. The full-scale study runs
at resnet50/ten-crop on hardware (docs/QUANTIZATION.md); this is the
same tooling end-to-end at CI scale.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def trained_textured_world(tmp_path_factory):
    """Textured demo world + a briefly-trained resnet14 checkpoint,
    shared by the study test and the acceptance-gate test."""
    world = str(tmp_path_factory.mktemp("qworld"))
    from tools.make_demo_world import main as make_world

    make_world(["--output", world, "--style", "textured",
                "--n_train", "320", "--n_eval", "96",
                "--image_size", "64", "--arch", "resnet14"])

    from classification.train_base import main as train_main

    train_main(["--config", os.path.join(world, "demo.yml"),
                "--max_steps", "80", "--cpu"])
    return world


@pytest.mark.slow
def test_textured_world_is_varied(trained_textured_world):
    """The study world must actually vary (not the 8-blob look)."""
    from PIL import Image

    world = trained_textured_world
    imgs = sorted(os.listdir(os.path.join(world, "eval_images")))[:8]
    arrs = [np.asarray(Image.open(os.path.join(world, "eval_images", f)))
            for f in imgs]
    assert len({a.tobytes() for a in arrs}) == len(arrs)
    assert min(a.std() for a in arrs) > 20  # rich content per image


@pytest.mark.slow
def test_quant_study_textured_world(trained_textured_world, tmp_path):
    world = trained_textured_world
    from tools.quant_study import main as study_main

    json_out = str(tmp_path / "study.json")
    rc = study_main([
        "--checkpoint", os.path.join(world, "ckpt"),
        "--image_dir", os.path.join(world, "eval_images"),
        "--meta", os.path.join(world, "eval_meta.csv"),
        "--cpu", "--crops", "1", "--batch_size", "16",
        "--calib_images", "16", "--stats", "absmax,p999",
        "--json", json_out,
    ])
    assert rc == 0
    results = json.load(open(json_out))
    assert results["n_images"] == 96
    assert set(results["configs"]) == {"absmax@1", "p999@1"}
    absmax = results["configs"]["absmax@1"]
    # every p_key + hierarchy measured
    assert set(absmax["flip_rates"]) == {"coarse", "middle", "fine",
                                         "hierarchy"}
    # trained model + absmax calibration: int8 tracks fp32 closely on
    # the varied corpus (full-scale budget enforcement happens in the
    # hardware study; this pins the harness + the claim at CI scale)
    assert absmax["flip_rates"]["hierarchy"] <= 0.05, absmax
    assert absmax["max_abs_gcd_delta_pt"] <= 3.0, absmax


@pytest.mark.slow
def test_pinned_scales_validated_like_serving(trained_textured_world,
                                              tmp_path):
    """--pinned_scales must validate the checkpoint's scales file
    exactly as the serving engine does (unpack_scales: version, site
    map, weights hash) — a stale/foreign file must fail loudly, not
    silently certify a configuration serving would reject."""
    world = trained_textured_world
    from tools.qat_finetune import main as qat_main
    from tools.quant_study import main as study_main

    out = str(tmp_path / "ckpt_qat")
    rc = qat_main(["--checkpoint", os.path.join(world, "ckpt"),
                   "--out", out, "--steps", "1", "--lr", "0",
                   "--calib_images", "8", "--batch_size", "4",
                   "--eval_images", "4", "--eval_every", "1", "--cpu"])
    assert rc == 0
    common = [
        "--checkpoint", out,
        "--image_dir", os.path.join(world, "eval_images"),
        "--meta", os.path.join(world, "eval_meta.csv"),
        "--cpu", "--crops", "1", "--batch_size", "16",
        "--pinned_scales", "--json", str(tmp_path / "pinned.json"),
    ]
    rc = study_main(common)
    assert rc == 0
    results = json.load(open(str(tmp_path / "pinned.json")))
    (label,) = results["configs"]
    assert label.startswith("pinned:qat/")

    # corrupt the hash -> the study must refuse, like serving would
    spath = os.path.join(out, "int8_scales.json")
    obj = json.load(open(spath))
    obj["provenance"]["weights_hash"] = "deadbeefdeadbeef"
    with open(spath, "w") as f:
        json.dump(obj, f)
    with pytest.raises(SystemExit, match="rejected"):
        study_main(common)


@pytest.mark.slow
def test_reproduce_tables_int8_gate(trained_textured_world, tmp_path,
                                    capsys):
    """`reproduce_tables --precision 8 --max_delta N` doubles as the
    serving-precision acceptance gate (VERDICT next #7): it runs fp32
    AND int8 on the same data and fails loudly on budget violation."""
    import shutil

    world = trained_textured_world
    # 12-image subset at 1 crop: XLA:CPU has no vectorized s8 conv, so
    # the int8 legs are minutes-per-ten-crop-eval otherwise — the gate
    # PLUMBING is what this pins; the real gate runs on hardware
    sub = tmp_path / "subset"
    sub.mkdir()
    src = os.path.join(world, "eval_images")
    names = sorted(os.listdir(src))[:12]
    for n in names:
        shutil.copy(os.path.join(src, n), sub / n)
    from tools.reproduce_tables import main as rt_main

    common = [
        "--checkpoint", os.path.join(world, "ckpt"),
        "--im2gps_dir", str(sub),
        "--im2gps_meta", os.path.join(world, "eval_meta.csv"),
        "--precision", "8", "--crops", "1",
        "--calib_dir", str(sub),
        "--batch_size", "12", "--cpu",
    ]
    rc = rt_main(common + ["--max_delta", "5.0"])
    out = capsys.readouterr().out
    assert "int8 serving gate" in out
    assert rc == 0, out  # converged toy model: int8 within 5 pt of fp32
    # the gate trips when the budget is impossible (negative)
    rc = rt_main(common + ["--max_delta", "-1.0"])
    assert rc == 1


@pytest.mark.slow
def test_ref_checkpoint_supplies_the_reference(trained_textured_world,
                                               tmp_path):
    """--ref_checkpoint must actually provide the fp32 reference tables
    (round-3 review fix: it was loaded, validated, then ignored).
    Measuring the trained checkpoint against a RANDOM-INIT reference
    must show large hierarchy flip rates — before the fix this showed
    the near-zero self-comparison instead."""
    world = trained_textured_world
    from geoestimation_tpu.eval.engine import resolve_partitioning_paths
    from geoestimation_tpu.geo import load_partitionings
    from geoestimation_tpu.train.checkpoint import (
        load_for_inference,
        save_single,
    )
    from geoestimation_tpu.train.init import init_model_state

    ckpt = os.path.join(world, "ckpt")
    config, _ = load_for_inference(ckpt)
    mp = config.model_params
    paths = resolve_partitioning_paths(mp.partitionings.files,
                                       [ckpt, world, os.getcwd()])
    parts = load_partitionings(paths, names=list(mp.partitionings.shortnames))
    _, rnd_state = init_model_state(config, parts, seed=123, image_size=64)
    ref_dir = str(tmp_path / "ref_ckpt")
    save_single(ref_dir, rnd_state, config=config, step=0,
                metrics={"val_loss": 99.0})

    from tools.quant_study import main as study_main

    json_out = str(tmp_path / "study_ref.json")
    rc = study_main([
        "--checkpoint", ckpt,
        "--ref_checkpoint", ref_dir,
        "--image_dir", os.path.join(world, "eval_images"),
        "--meta", os.path.join(world, "eval_meta.csv"),
        "--cpu", "--crops", "1", "--batch_size", "16",
        "--calib_images", "16", "--stats", "absmax",
        "--json", json_out,
    ])
    assert rc == 0
    results = json.load(open(json_out))
    flips = results["configs"]["absmax@1"]["flip_rates"]
    # trained-vs-random disagreement: far above the self-comparison's
    # <= 5% (the old bug would reproduce that near-zero number here)
    assert flips["hierarchy"] > 0.2, flips


@pytest.mark.slow
def test_quant_study_realistic_geometry_world(tmp_path_factory, tmp_path):
    """Round-4 (VERDICT next #5): the accuracy-study harness on a
    REALISTIC-geometry world — mixed resolutions (320-1600 px long
    side), aspect ratios/orientations, JPEG qualities 60-95 — instead
    of the fixed 320x280/q88 geometry every earlier study used. Pins:
    (a) `make_demo_world --geometry realistic` actually varies geometry
    and records it (eval_geometry.csv), (b) the study runs end-to-end
    on such a corpus with --fast_decode (scaled-DCT kicks in on the
    large images), (c) the artifact embeds the corpus stats so the
    verdict is tied to the geometry it was measured on."""
    world = str(tmp_path_factory.mktemp("rgworld"))
    from tools.make_demo_world import main as make_world

    make_world(["--output", world, "--style", "textured",
                "--geometry", "realistic",
                "--n_train", "160", "--n_eval", "24",
                "--image_size", "64", "--arch", "resnet14"])

    # the world really is mixed-geometry
    import pandas as pd
    from PIL import Image

    geom = pd.read_csv(os.path.join(world, "eval_geometry.csv"))
    assert len(geom) == 24
    assert geom["JPEG_Q"].between(60, 95).all()
    sizes = set()
    for f in sorted(os.listdir(os.path.join(world, "eval_images"))):
        with Image.open(os.path.join(world, "eval_images", f)) as im:
            sizes.add(im.size)
    assert len(sizes) >= 8, sizes
    assert max(max(s) for s in sizes) >= 1024  # big Flickr-like photos

    from classification.train_base import main as train_main

    train_main(["--config", os.path.join(world, "demo.yml"),
                "--max_steps", "40", "--cpu"])

    from tools.quant_study import main as study_main

    json_out = str(tmp_path / "study_rg.json")
    rc = study_main([
        "--checkpoint", os.path.join(world, "ckpt"),
        "--image_dir", os.path.join(world, "eval_images"),
        "--meta", os.path.join(world, "eval_meta.csv"),
        "--cpu", "--crops", "1", "--batch_size", "8",
        "--calib_images", "8", "--stats", "absmax",
        "--fast_decode", "--json", json_out,
    ])
    assert rc == 0
    results = json.load(open(json_out))
    assert results["n_images"] == 24
    assert results["fast_decode"] is True
    corpus = results["corpus"]
    assert corpus["n_files"] == 24
    assert corpus["distinct_shapes"] >= 8
    assert 0.0 < corpus["portrait_frac"] < 1.0
    assert sum(corpus["long_side_hist_ceil256"].values()) == 24
    assert corpus["long_side_min_med_max"][2] >= 1024
    assert "absmax@1" in results["configs"]


def test_quant_study_cli_help():
    """The study tool is a real CLI (discoverable surface)."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "quant_study.py"),
         "--help"], capture_output=True, text=True, timeout=120)
    assert out.returncode == 0
    assert "--assert_budget" in out.stdout


@pytest.mark.slow
def test_quant_study_auto_mode(trained_textured_world, tmp_path):
    """`--stats auto` (round-5): the shipped serving default measured
    end to end. The artifact records which stat the parity proxy
    picked, and the auto row's verdict is identical to that stat's own
    row (same scales by construction)."""
    world = trained_textured_world
    from tools.quant_study import main as study_main

    json_out = str(tmp_path / "auto_study.json")
    rc = study_main([
        "--checkpoint", os.path.join(world, "ckpt"),
        "--image_dir", os.path.join(world, "eval_images"),
        "--meta", os.path.join(world, "eval_meta.csv"),
        "--cpu", "--crops", "1", "--batch_size", "16",
        "--calib_images", "16", "--stats", "auto,absmax,p999,p9999",
        "--json", json_out,
    ])
    assert rc == 0
    results = json.load(open(json_out))
    auto = results["configs"]["auto@1"]
    picked = auto["picked_stat"]
    assert picked in ("absmax", "p999", "p9999")
    assert set(auto["proxy_kl"]) == {"absmax", "p999", "p9999"}
    # the pick minimizes the recorded proxy
    assert auto["proxy_kl"][picked] == min(auto["proxy_kl"].values())
    picked_row = results["configs"][f"{picked}@1"]
    assert auto["max_abs_gcd_delta_pt"] == \
        picked_row["max_abs_gcd_delta_pt"]
    assert auto["flip_rates"] == picked_row["flip_rates"]
