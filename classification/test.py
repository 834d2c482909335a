"""Evaluation CLI — regenerates the README-style accuracy tables.

Reference: `python -m classification.test --checkpoint ... --image_dirs D1
D2 --meta_files M1 M2 --precision {16,32} ...` where each meta CSV has
required columns IMG_ID, LAT, LON; prints GCD threshold accuracies at
{1, 25, 200, 750, 2500} km per partitioning and for the hierarchical f*
prediction (reference README.md:136-187). This is the parity harness
(SURVEY.md §4.3).
"""

from __future__ import annotations

import argparse
import json
import os


def build_parser():
    p = argparse.ArgumentParser(
        description="GeoEstimation-TPU evaluation (GCD threshold accuracies)"
    )
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--hparams", default=None)
    p.add_argument("--image_dirs", nargs="+", required=True)
    p.add_argument("--meta_files", nargs="+", required=True)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--num_workers", type=int, default=None)
    p.add_argument("--precision", type=int, default=16,
                   choices=[8, 16, 32],
                   help="16/32 match the reference surface "
                        "(README.md:159-160); 8 = TPU int8 PTQ serving "
                        "precision (models/quant.py), calibrated on the "
                        "first eval batch")
    p.add_argument("--crops", type=int, default=10, choices=[1, 5, 10])
    p.add_argument("--json", dest="json_out", default=None,
                   help="also dump results as JSON to this path")
    p.add_argument("--gpu", action="store_true",
                   help="accepted for reference CLI compatibility; ignored")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (debug)")
    p.add_argument("--fast", action="store_true",
                   help="fold BatchNorm into conv weights at load")
    p.add_argument("--feature_tta", action="store_true",
                   help="feature-space ten-crop TTA: run the trunk once "
                        "per base image and crop at the layer3 feature "
                        "map (~4x less trunk work; approximate at crop "
                        "borders — accuracy deltas measured by "
                        "tools/quant_study.py --feature_tta)")
    p.add_argument("--feature_tta_level", type=int, default=3,
                   choices=[1, 2, 3],
                   help="with --feature_tta: backbone stage whose feature "
                        "map is cropped (3 = fastest; 2 runs layer3+4 "
                        "per crop — closer to exact, still >1.5x)")
    p.add_argument("--exact_tta", action="store_true",
                   help="torchvision-exact host ten-crop geometry")
    p.add_argument("--tta_fold", default="prob_mean",
                   choices=["prob_mean", "log_mean", "logit_mean"],
                   help="how per-crop logits combine: prob_mean = mean of "
                        "softmax probs (reference convention, default), "
                        "log_mean = geometric, logit_mean = raw logits")
    p.add_argument("--calib_dir", default=None,
                   help="with --precision 8: deterministic calibration "
                        "set (first --calib_images of this dir in sorted "
                        "order) — reported tables then never depend on "
                        "eval directory order or batch size; always "
                        "recalibrates, ignoring the scales cache")
    p.add_argument("--calib_images", type=int, default=64,
                   help="images drawn from --calib_dir")
    p.add_argument("--calib_stat", default="auto",
                   choices=["auto", "absmax", "p999", "p9999"],
                   help="activation-range statistic; 'auto' (default) "
                        "scores absmax/p999/p9999 against the fp32 "
                        "forward on the calibration images and ships "
                        "the winner (models/quant.py autoselect_scales)")
    p.add_argument("--calib_headroom", type=float, default=1.0,
                   help="scale multiplier >1 trades resolution for "
                        "clipping margin")
    p.add_argument("--recalibrate", action="store_true",
                   help="with --precision 8: ignore any cached "
                        "int8_scales.json")
    p.add_argument("--fast_decode", action="store_true",
                   help="scaled DCT JPEG decode on the host ingest path "
                        "(several times faster on large photos; slightly "
                        "different pixels — off for strict parity)")
    from geoestimation_tpu.parallel.multihost import add_coordinator_args

    add_coordinator_args(p, extra_help="Each process scores "
                         "sorted(files)[p::n] and the GCD counts merge "
                         "across processes — the printed table covers "
                         "the full directory")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if len(args.image_dirs) != len(args.meta_files):
        raise SystemExit("--image_dirs and --meta_files must pair up "
                         "(reference README.md:153-156)")
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from geoestimation_tpu.parallel.multihost import maybe_initialize

    maybe_initialize(args)
    import jax
    import jax.numpy as jnp

    proc_id, n_procs = jax.process_index(), jax.process_count()
    if n_procs > 1 and args.precision == 8 and not args.calib_dir:
        # per-process 'first_batch' calibration would fit scales to each
        # process's OWN file slice — N different quantizers under one
        # merged table. The calib_dir path reads the first
        # --calib_images of the FULL first directory in sorted order on
        # every process (engine._calib_dir_batches is unsliced), so all
        # processes derive identical scales.
        args.calib_dir = args.image_dirs[0]
        if proc_id == 0:
            print("int8 multi-process: defaulting --calib_dir to "
                  f"{args.calib_dir} so every process calibrates on the "
                  "same images", flush=True)

    from geoestimation_tpu.data.image_folder import load_meta_csv
    from geoestimation_tpu.eval.engine import (
        InferenceEngine,
        default_scales_path,
        format_accuracy_table,
    )
    from geoestimation_tpu.train.checkpoint import load_for_inference

    config, state = load_for_inference(args.checkpoint,
                                       hparams_path=args.hparams)
    engine = InferenceEngine(
        config,
        state,
        n_crops=args.crops,
        dtype=jnp.float32 if args.precision == 32 else jnp.bfloat16,
        search_dirs=[os.path.dirname(os.path.abspath(args.checkpoint)),
                     args.checkpoint, os.getcwd()],
        fast=args.fast,
        tta_mode=("feature" if args.feature_tta
                  else "host_exact" if args.exact_tta else "device"),
        tta_fold=args.tta_fold,
        feature_tta_level=args.feature_tta_level,
        int8=(args.precision == 8),
        int8_scales_path=default_scales_path(args.checkpoint),
        calib_dir=args.calib_dir,
        calib_images=args.calib_images,
        calib_stat=args.calib_stat,
        calib_headroom=args.calib_headroom,
        int8_recalibrate=args.recalibrate,
        fast_decode=args.fast_decode,
    )
    all_results = {}
    for image_dir, meta_file in zip(args.image_dirs, args.meta_files):
        meta = load_meta_csv(meta_file)
        results = engine.evaluate_dir(
            image_dir, meta, batch_size=args.batch_size,
            num_workers=args.num_workers,
            process_slice=(proc_id, n_procs) if n_procs > 1 else None,
        )
        name = os.path.basename(os.path.normpath(image_dir))
        all_results[name] = results
        if proc_id == 0:
            print(format_accuracy_table(results, dataset_name=name))
            missing = results.get("_n_images_without_meta")
            if missing:
                print(f"  ({missing} images had no meta row; excluded)")
    if args.json_out and proc_id == 0:
        with open(args.json_out, "w") as f:
            json.dump(all_results, f, indent=2)
    return all_results


if __name__ == "__main__":
    main()
