"""Batch inference CLI — surface parity with the reference.

Reference: `python -m classification.inference --checkpoint ... --hparams
... --image_dir ...` over `*.jpg/*.jpeg/*.png`, writing a CSV of
(img_id, p_key, pred_class, pred_lat, pred_lng) rows, one per partitioning
key including `hierarchy` (reference README.md:98-124). Flag names are kept
where documented; `--gpu` is accepted for compatibility and ignored (the
backend is the TPU/XLA default platform).
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser():
    p = argparse.ArgumentParser(
        description="GeoEstimation-TPU batch inference over an image dir"
    )
    p.add_argument("--checkpoint", required=True,
                   help="checkpoint directory (orbax)")
    p.add_argument("--hparams", default=None,
                   help="optional explicit hparams.yaml (default: bundled "
                        "with the checkpoint)")
    p.add_argument("--image_dir", required=True)
    p.add_argument("--output", default=None,
                   help="output CSV path (default: stdout)")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--num_workers", type=int, default=None,
                   help="host decode threads")
    p.add_argument("--crops", type=int, default=10, choices=[1, 5, 10],
                   help="TTA crops per image")
    p.add_argument("--precision", type=int, default=16,
                   choices=[8, 16, 32],
                   help="16=bfloat16 backbone, 32=float32, 8=TPU int8 "
                        "PTQ serving precision (models/quant.py; "
                        "calibrated on the first batch)")
    p.add_argument("--gpu", action="store_true",
                   help="accepted for reference CLI compatibility; ignored "
                        "(accelerator is chosen by JAX/XLA)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (debug)")
    p.add_argument("--fast", action="store_true",
                   help="fold BatchNorm into conv weights at load "
                        "(identical predictions up to bf16 rounding)")
    p.add_argument("--pallas", action="store_true",
                   help="with --fast: fused Pallas bottleneck blocks")
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
                   help="torchvision-exact host ten-crop geometry (strict "
                        "parity for imported reference checkpoints)")
    p.add_argument("--tta_fold", default="prob_mean",
                   choices=["prob_mean", "log_mean", "logit_mean"],
                   help="how per-crop logits combine: prob_mean = mean of "
                        "softmax probs (reference convention, default), "
                        "log_mean = geometric, logit_mean = raw logits")
    p.add_argument("--calib_dir", default=None,
                   help="with --precision 8: deterministic calibration "
                        "set (first --calib_images of this dir in sorted "
                        "order); always recalibrates, ignoring the "
                        "scales cache")
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

    add_coordinator_args(p, extra_help="Each process predicts "
                         "sorted(files)[p::n] and writes "
                         "<output>.part-P-of-N (concatenate the parts "
                         "for the full CSV; rows don't overlap). "
                         "Requires --output")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from geoestimation_tpu.parallel.multihost import maybe_initialize

    maybe_initialize(args)
    import jax
    import jax.numpy as jnp

    proc_id, n_procs = jax.process_index(), jax.process_count()
    if n_procs > 1 and not args.output:
        raise SystemExit("multi-process inference requires --output "
                         "(each process writes its own part file)")
    if n_procs > 1 and args.precision == 8 and not args.calib_dir:
        # per-process 'first_batch' calibration would fit scales to each
        # process's OWN file slice — N different quantizers, breaking
        # the parts-equal-single-process contract. The calib_dir path
        # reads the first --calib_images of the FULL directory in
        # sorted order on every process (engine._calib_dir_batches is
        # unsliced), so all processes derive identical scales.
        args.calib_dir = args.image_dir
        if proc_id == 0:
            print("int8 multi-process: defaulting --calib_dir to "
                  f"{args.image_dir} so every process calibrates on the "
                  "same images", flush=True)

    from geoestimation_tpu.eval.engine import (
        InferenceEngine,
        default_scales_path,
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
        use_pallas=args.pallas,
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
    df = engine.predict_dir(
        args.image_dir, batch_size=args.batch_size,
        num_workers=args.num_workers,
        process_slice=(proc_id, n_procs) if n_procs > 1 else None,
    )
    if args.output:
        out = args.output
        if n_procs > 1:
            out = f"{args.output}.part-{proc_id}-of-{n_procs}"
        os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
        df.to_csv(out, index=False)
        print(f"wrote {len(df)} rows to {out}")
    else:
        df.to_csv(sys.stdout, index=False)


if __name__ == "__main__":
    main()
