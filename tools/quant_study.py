"""Int8 PTQ accuracy study: flip rates + GCD table deltas vs fp32.

The int8 serving path (models/quant.py) carries the throughput headline;
this tool produces the accuracy evidence behind it (round-3, VERDICT
weak #1): over a trained checkpoint and an eval corpus it measures, for
every calibration setting in a stat x headroom grid,

  * the per-image prediction FLIP RATE vs the fp32 reference, per
    partitioning key and for the hierarchical f* prediction, and
  * the GCD threshold-accuracy table delta (percentage points) vs fp32
    at {1, 25, 200, 750, 2500} km (reference README.md:169-187 format),

and verdicts each setting against the parity budget (BASELINE.md: 0.5 pt
per cell).

Cost design: ONE fp32 sampling-calibration pass records absmax + a
pooled |x| sample at every requant site (`calibrate_samples`), so every
(stat, headroom) derives host-side with zero extra device work; the int8
net is compiled ONCE with call-time scales (`build_int8_apply_dynamic`);
images are decoded once and every config's forward runs on the same
device-resident batch. A full 6-config sweep costs 3 jit compiles total.

Usage (demo world, CPU):
  python tools/make_demo_world.py --output /tmp/qworld --style textured \
      --n_train 2048 --n_eval 512
  python -m classification.train_base --config /tmp/qworld/demo.yml
  python tools/quant_study.py --checkpoint /tmp/qworld/ckpt \
      --image_dir /tmp/qworld/eval_images --meta /tmp/qworld/eval_meta.csv
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from geoestimation_tpu.eval.metrics import (
    DEFAULT_THRESHOLDS_KM as THRESHOLDS_KM,
)


def gcd_table(pred_lat, pred_lng, true_lat, true_lng):
    """GCD threshold table via the framework's one haversine
    implementation (eval.metrics.great_circle_distance)."""
    from geoestimation_tpu.eval.metrics import great_circle_distance

    d = np.asarray(
        great_circle_distance(pred_lat, pred_lng, true_lat, true_lng))
    return {t: float((d <= t).mean()) for t in THRESHOLDS_KM}


def parse_grid(stats, headrooms):
    return [(s, h) for s in stats.split(",")
            for h in [float(x) for x in headrooms.split(",")]]


def main(argv=None):
    p = argparse.ArgumentParser(
        description="int8 PTQ flip-rate / GCD-delta study vs fp32")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--hparams", default=None)
    p.add_argument("--ref_checkpoint", default=None,
                   help="checkpoint providing the fp32 exact reference "
                        "tables (default: --checkpoint itself). Use for "
                        "distilled/fine-tuned serving checkpoints "
                        "(tools/tta_distill.py) where parity is against "
                        "the ORIGINAL model's exact predictions")
    p.add_argument("--image_dir", required=True)
    p.add_argument("--meta", required=True)
    p.add_argument("--calib_dir", default=None,
                   help="calibration images (default: --image_dir — the "
                        "standard unlabeled-domain-data PTQ setting)")
    p.add_argument("--calib_images", type=int, default=64)
    p.add_argument("--stats", default="absmax,p999,p9999")
    p.add_argument("--headrooms", default="1.0")
    p.add_argument("--crops", type=int, default=10, choices=[1, 5, 10])
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--budget", type=float, default=0.5,
                   help="per-cell GCD delta budget in percentage points "
                        "(BASELINE.md)")
    p.add_argument("--json", dest="json_out", default=None)
    p.add_argument("--fast_decode", action="store_true",
                   help="scaled-DCT JPEG decode on the host ingest path "
                        "for BOTH calibration and eval batches — studies "
                        "whether the fast decode's slightly different "
                        "pixels move the int8 accuracy verdicts "
                        "(round-4; matters on realistic mixed-resolution "
                        "corpora where scaling actually kicks in)")
    p.add_argument("--pinned_scales", action="store_true",
                   help="evaluate the checkpoint's own int8_scales.json "
                        "(e.g. QAT-trained scales, which the serving "
                        "engine pins on weights-hash for qat/distill "
                        "sources) instead of a fresh-calibration grid. "
                        "This measures exactly what serving runs: a QAT "
                        "checkpoint is only meaningful WITH its trained "
                        "scales — recalibrating on its fp32 forward "
                        "measures a configuration serving never uses "
                        "(docs/QUANTIZATION.md round-4 QAT findings)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--assert_budget", action="store_true",
                   help="exit 1 unless at least one setting keeps every "
                        "GCD cell within --budget")
    p.add_argument("--feature_tta", action="store_true",
                   help="also measure the feature-space TTA variant of "
                        "each int8 setting (suffix '+ftta' — combined "
                        "PTQ + feature-crop delta vs the exact fp32 "
                        "ten-crop reference)")
    p.add_argument("--feature_tta_levels", default="3",
                   help="with --feature_tta: comma list of crop levels "
                        "to measure (3 = crop at layer3, fastest; 2 = "
                        "crop at layer2 — layer3+4 run per crop, closer "
                        "to exact). Suffixes '+ftta' (level 3) / "
                        "'+ftta<L>' otherwise")
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    # persistent compile cache: repeat studies (and the bench, which
    # shares the dir) skip the multi-minute tunnel compiles
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from geoestimation_tpu.data.image_folder import (
        iter_image_folder,
        load_meta_csv,
    )
    from geoestimation_tpu.eval.engine import resolve_partitioning_paths
    from geoestimation_tpu.eval.infer import (
        HierarchyArrays,
        mean_tta_logits,
        predict_all,
    )
    from geoestimation_tpu.geo import Hierarchy, load_partitionings
    from geoestimation_tpu.ingest.pipeline import (
        eval_pipeline,
        eval_pipeline_s8,
    )
    from geoestimation_tpu.models.quant import (
        autoselect_scales,
        build_int8_apply_dynamic,
        calibrate_samples,
        derive_scales,
        quantize_model,
    )
    from geoestimation_tpu.train.checkpoint import load_for_inference
    from geoestimation_tpu.train.init import model_from_config

    config, state = load_for_inference(args.checkpoint,
                                       hparams_path=args.hparams)
    mp = config.model_params
    paths = resolve_partitioning_paths(
        mp.partitionings.files,
        [os.path.dirname(os.path.abspath(args.checkpoint)),
         args.checkpoint, os.getcwd()])
    parts = load_partitionings(paths, names=list(mp.partitionings.shortnames))
    harrays = HierarchyArrays.from_hierarchy(Hierarchy.build(parts))
    n_classes = tuple(len(pp) for pp in parts)
    variables = {"params": state["params"],
                 "batch_stats": state["batch_stats"]}
    model = model_from_config(config, parts)
    import dataclasses as _dc

    model = _dc.replace(model, dtype=jnp.float32)
    ref_model, ref_variables = model, variables
    if args.ref_checkpoint:
        ref_config, ref_state = load_for_inference(args.ref_checkpoint)
        if tuple(ref_config.model_params.partitionings.files) != \
                tuple(mp.partitionings.files):
            raise SystemExit(
                "--ref_checkpoint must share the partitioning files "
                "with --checkpoint (its tables are the parity target)")
        ref_variables = {"params": ref_state["params"],
                         "batch_stats": ref_state["batch_stats"]}
        ref_model = _dc.replace(
            model_from_config(ref_config, parts), dtype=jnp.float32)
    n_crops = args.crops

    # configs are (stat, headroom, mode); 'feature<L>' = feature-space
    # TTA cropping at layer L
    ft_levels = ([int(x) for x in args.feature_tta_levels.split(",")]
                 if args.feature_tta else [])
    qnet = quantize_model(variables, mp.arch)
    if args.pinned_scales:
        # evaluate the serving configuration: the checkpoint's own
        # pinned scales (no calibration pass at all), validated exactly
        # as the serving engine validates them (version/site-map/
        # weights-hash via unpack_scales) — a stale or foreign-arch
        # file must fail here, not silently certify a configuration
        # serving would reject and recalibrate
        from geoestimation_tpu.models.quant import (
            unpack_scales,
            weights_hash,
        )

        scales_path = os.path.join(args.checkpoint, "int8_scales.json")
        with open(scales_path) as f:
            doc = json.load(f)
        pinned, prov = unpack_scales(
            doc, mp.arch, expect_hash=weights_hash(qnet))
        if pinned is None:
            raise SystemExit(
                f"--pinned_scales: {scales_path} rejected: {prov}")
        label = (f"pinned:{prov.get('source', '?')}"
                 f"/{prov.get('stat', '?')}")
        n_calib = int(prov.get("n_images", 0))
        grid = [(label, float(prov.get("headroom", 1.0)), "exact")]
        grid += [(label, float(prov.get("headroom", 1.0)),
                  f"feature{lvl}") for lvl in ft_levels]
        scale_sets = {g: dict(pinned) for g in grid}
        print(f"using pinned scales from {scales_path} ({label})",
              flush=True)
    else:
        # --- calibration: one sampling pass, scales per grid point ----
        calib_dir = args.calib_dir or args.image_dir
        batches, n_calib = [], 0
        for fb in iter_image_folder(calib_dir, batch_size=32,
                                    fast_decode=args.fast_decode):
            good = fb.images[np.asarray(fb.valid)]
            take = min(args.calib_images - n_calib, len(good))
            if take:
                batches.append(good[:take])
                n_calib += take
            if n_calib >= args.calib_images:
                break
        print(f"calibrating on {n_calib} images from {calib_dir} "
              f"(one sampling pass)", flush=True)
        samples = calibrate_samples(variables, batches, arch=mp.arch,
                                    n_crops=n_crops, crop=224)
        base_grid = parse_grid(args.stats, args.headrooms)
        grid = [(s, h, "exact") for s, h in base_grid]
        for lvl in ft_levels:
            grid += [(s, h, f"feature{lvl}") for s, h in base_grid]

        # 'auto' rows measure the shipped default end to end: the same
        # selection the serving engine runs (quant.autoselect_scales,
        # parity-proxy KL on the calibration images) picks a stat, and
        # the study verdicts ITS scales like any fixed grid point. The
        # picked stat is recorded per headroom in the artifact.
        auto_picks = {}

        def scales_for(stat, h):
            if stat != "auto":
                return derive_scales(samples, stat, h)
            if h not in auto_picks:
                scales, picked, kls = autoselect_scales(
                    variables, batches, qnet, arch=mp.arch,
                    n_classes=n_classes, n_crops=n_crops, crop=224,
                    headroom=h, samples=samples)
                auto_picks[h] = {"picked": picked,
                                 "proxy_kl": {k: float(v)
                                              for k, v in kls.items()},
                                 "scales": scales}
                print(f"auto@{h:g}: picked {picked} (parity-proxy KL "
                      + ", ".join(f"{k}={v:.5f}"
                                  for k, v in kls.items()) + ")",
                      flush=True)
            return auto_picks[h]["scales"]

        scale_sets = {g: scales_for(g[0], g[1]) for g in grid}

    # --- jitted forwards: fp32 reference + ONE dynamic int8 graph ------
    def fold_predict(logits):
        logits = [mean_tta_logits(l, n_crops) for l in logits]
        preds = predict_all(logits, harrays)
        keys = sorted(preds)
        return jnp.stack([
            jnp.stack([preds[k][0].astype(jnp.float32),
                       preds[k][1].astype(jnp.float32),
                       preds[k][2].astype(jnp.float32)]) for k in keys])

    pred_keys = sorted(list(harrays.names) + ["hierarchy"])

    @jax.jit
    def fwd_fp32(images_u8):
        # NOTE: the fp32 reference comes from ref_model/ref_variables —
        # with --ref_checkpoint that is the ORIGINAL (pre-distillation)
        # model, so drift of a distilled serving checkpoint away from
        # its teacher shows up in the deltas instead of being hidden.
        x = eval_pipeline(images_u8, n_crops=n_crops, crop=224,
                          dtype=jnp.float32)
        return fold_predict(ref_model.apply(ref_variables, x, train=False))

    dyn = build_int8_apply_dynamic(qnet, n_classes=n_classes)

    @jax.jit
    def fwd_int8(images_u8, act_scales):
        x = eval_pipeline_s8(images_u8, n_crops=n_crops, crop=224)
        return fold_predict(dyn(x, act_scales))

    fwd_int8_feature = {}
    if ft_levels:
        from geoestimation_tpu.models.quant import shift_s8

        def make_ft_fwd(lvl):
            dyn_ft = build_int8_apply_dynamic(
                qnet, n_classes=n_classes,
                feature_tta={"crop": 224, "n_crops": n_crops,
                             "level": lvl})

            @jax.jit
            def fwd(images_u8, act_scales):
                return fold_predict(dyn_ft(shift_s8(images_u8),
                                           act_scales))

            return fwd

        fwd_int8_feature = {lvl: make_ft_fwd(lvl) for lvl in ft_levels}

    # --- single pass over the corpus, all configs per decoded batch ----
    meta = load_meta_csv(args.meta)
    gt = {str(r.IMG_ID): (float(r.LAT), float(r.LON))
          for r in meta.itertuples()}
    # device-resident scale pytrees, transferred once (on a tunneled
    # device every leaf transfer is a host round trip)
    dev_scales = {
        g: jax.device_put({k: np.float32(v)
                           for k, v in scale_sets[g].items()})
        for g in grid
    }
    ref_rows = []        # (K, 3, n) accumulators
    cfg_rows = {g: [] for g in grid}
    true_ll = []
    n_images = 0
    for fb in iter_image_folder(args.image_dir,
                                batch_size=args.batch_size,
                                fast_decode=args.fast_decode):
        images = jnp.asarray(fb.images)
        ref = np.asarray(fwd_fp32(images))
        outs = {
            g: np.asarray(
                (fwd_int8_feature[int(g[2][len("feature"):])]
                 if g[2].startswith("feature") else fwd_int8)(
                    images, dev_scales[g]))
            for g in grid
        }
        for i, img_id in enumerate(fb.ids):
            key = img_id if img_id in gt else os.path.splitext(img_id)[0]
            if not fb.valid[i] or key not in gt:
                continue
            ref_rows.append(ref[:, :, i])
            for g in grid:
                cfg_rows[g].append(outs[g][:, :, i])
            true_ll.append(gt[key])
            n_images += 1
        print(f"  {n_images} images evaluated", flush=True)

    ref_arr = np.stack(ref_rows, axis=-1)        # (K, 3, N)
    true_lat = np.array([t[0] for t in true_ll])
    true_lng = np.array([t[1] for t in true_ll])
    ref_tables = {k: gcd_table(ref_arr[i, 1], ref_arr[i, 2],
                               true_lat, true_lng)
                  for i, k in enumerate(pred_keys)}

    # corpus stats (round-4): the artifact records WHAT geometry the
    # verdicts were measured on — a fixed-320x280 world and a realistic
    # mixed-resolution one are different claims. Header-only reads (PIL
    # lazy open), no second decode pass.
    def corpus_stats(image_dir):
        from collections import Counter

        from PIL import Image as _Img

        from geoestimation_tpu.data.image_folder import list_images

        sizes, hist = [], Counter()
        for pth in list_images(image_dir):
            try:
                with _Img.open(pth) as im:
                    w, h = im.size
            except OSError:
                continue
            sizes.append((w, h))
            hist[int(np.ceil(max(w, h) / 256.0)) * 256] += 1
        if not sizes:
            return {}
        ws = np.array([s[0] for s in sizes], np.float64)
        hs = np.array([s[1] for s in sizes], np.float64)
        long_side = np.maximum(ws, hs)
        return {
            "n_files": len(sizes),
            "long_side_hist_ceil256": {str(k): v for k, v
                                       in sorted(hist.items())},
            "long_side_min_med_max": [int(long_side.min()),
                                      int(np.median(long_side)),
                                      int(long_side.max())],
            "portrait_frac": float((hs > ws).mean()),
            "distinct_shapes": int(len(set(sizes))),
        }

    from geoestimation_tpu.models.quant import requant_rounding_mode

    results = {"n_images": n_images, "n_calib": n_calib,
               "crops": n_crops, "budget_pt": args.budget,
               "fast_decode": bool(args.fast_decode),
               "requant_mode": requant_rounding_mode(),
               "corpus": corpus_stats(args.image_dir),
               "ref_tables": {k: {str(t): v for t, v in tb.items()}
                              for k, tb in ref_tables.items()},
               "configs": {}}
    print(f"\n== int8 PTQ study: {n_images} images, {n_crops}-crop TTA, "
          f"budget {args.budget} pt ==")
    header = (f"{'config':<16}{'max |dGCD| pt':>14}  "
              + "".join(f"{k + ' flip%':>16}" for k in pred_keys))
    print(header)
    any_pass = False
    for g in grid:
        arr = np.stack(cfg_rows[g], axis=-1)
        flips = {}
        max_delta = 0.0
        deltas = {}
        for i, k in enumerate(pred_keys):
            flips[k] = float((arr[i, 0] != ref_arr[i, 0]).mean())
            tb = gcd_table(arr[i, 1], arr[i, 2], true_lat, true_lng)
            deltas[k] = {str(t): 100 * (tb[t] - ref_tables[k][t])
                         for t in THRESHOLDS_KM}
            max_delta = max(max_delta,
                            max(abs(v) for v in deltas[k].values()))
        # Signed companion metric: worst DEGRADATION (accuracy lost vs
        # the reference). The strict verdict stays symmetric |delta| —
        # but a cell can exceed the budget by being BETTER than the
        # reference (observed in the distillation studies), and the two
        # readings answer different questions (bit-parity vs did-the-
        # optimization-hurt), so both are reported.
        max_degradation = max(
            0.0, -min(min(d.values()) for d in deltas.values()))
        # inclusive budget with a float epsilon: a cell moving by
        # EXACTLY budget pt (e.g. 5 images in 1000 = 0.500 pt vs the
        # 0.5 budget) is "within" it; without the epsilon the binary
        # representation (0.5000000000000004 from 100*(a-b)) turned
        # exact-boundary PASSes into spurious FAILs (round-5 fix,
        # caught on the realistic-world study)
        ok = max_delta <= args.budget + 1e-9
        any_pass = any_pass or ok
        if g[2] == "exact":
            suffix = ""
        elif g[2] == "feature3":
            suffix = "+ftta"
        else:
            suffix = f"+ftta{g[2][len('feature'):]}"
        name = f"{g[0]}@{g[1]:g}" + suffix
        print(f"{name:<16}{max_delta:>14.3f}  "
              + "".join(f"{100 * flips[k]:>15.2f}%" for k in pred_keys)
              + ("   PASS" if ok else "   FAIL")
              + (f"  (worst degradation {max_degradation:.3f} pt)"
                 if not ok else ""))
        results["configs"][name] = {
            "stat": g[0], "headroom": g[1], "tta": g[2],
            "max_abs_gcd_delta_pt": max_delta,
            "max_degradation_pt": max_degradation,
            "within_budget": ok,
            "flip_rates": flips,
            "gcd_deltas_pt": deltas,
        }
        if g[0] == "auto":
            results["configs"][name]["picked_stat"] = \
                auto_picks[g[1]]["picked"]
            results["configs"][name]["proxy_kl"] = \
                auto_picks[g[1]]["proxy_kl"]
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f"wrote {args.json_out}")
    if args.assert_budget and not any_pass:
        print(f"FAIL: no calibration setting kept every GCD cell within "
              f"{args.budget} pt of fp32")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
