"""Feature-TTA self-distillation driver (models/tta_distill.py).

Makes the feature-TTA fast serving mode (docs/PERF_NOTES.md: 4115
img/s/chip int8 vs 1523 exact on v5e) budget-safe for a given
checkpoint: fine-tunes the network so its feature-TTA output matches
its own frozen exact ten-crop output (per-head KL on the TTA-folded
probabilities, no labels needed), then exports

  * a standard identity-BN checkpoint every CLI consumes unchanged
    (deploy THIS one with --feature_tta; keep measuring parity against
    the ORIGINAL checkpoint's exact tables), and
  * a matching int8_scales.json (source="distill") so --precision 8
    serves without a calibration pass.

Usage (demo world):
  python tools/tta_distill.py --checkpoint /tmp/qworld/ckpt \
      --image_dir /tmp/qworld/eval_images --out /tmp/qworld/ckpt_ftta \
      --steps 300 --lr 1e-3
  python tools/quant_study.py --checkpoint /tmp/qworld/ckpt_ftta \
      --ref_checkpoint /tmp/qworld/ckpt --feature_tta ...

Distillation images: any unlabeled in-domain folder (training images
work; so do the eval-adjacent calibration sets). Teacher log-probs are
precomputed once per unique batch — the loop pays only student
forward/backward.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="feature-TTA self-distillation")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--hparams", default=None)
    p.add_argument("--image_dir", required=True,
                   help="unlabeled in-domain images (decoded to the "
                        "eval base geometry)")
    p.add_argument("--out", required=True)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--optimizer", default="adam", choices=["sgd", "adam"],
                   help="adam (default) is robust to the badly scaled "
                        "per-layer gradients of a near-zero KL start; "
                        "sgd+momentum measured DIVERGING from a converged "
                        "checkpoint at lr 1e-3")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--images", type=int, default=512,
                   help="distillation set size (cycled)")
    p.add_argument("--crops", type=int, default=10, choices=[5, 10])
    p.add_argument("--level", type=int, default=3)
    p.add_argument("--crop", type=int, default=224)
    p.add_argument("--train_scope", default="all", choices=["all", "rest"],
                   help="'rest': freeze the shared trunk, train only the "
                        "per-crop stages + head")
    p.add_argument("--anchor_weight", type=float, default=1.0,
                   help="weight of the KL(teacher || student_EXACT) "
                        "anchor term; 0 disables (measured: unanchored "
                        "distillation drifts the exact path past the "
                        "parity budget)")
    p.add_argument("--tta_fold", default="prob_mean")
    p.add_argument("--calib_images", type=int, default=64)
    p.add_argument("--log_every", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    import optax

    from geoestimation_tpu.data.image_folder import iter_image_folder
    from geoestimation_tpu.eval.engine import (
        default_scales_path,
        resolve_partitioning_paths,
    )
    from geoestimation_tpu.geo import load_partitionings
    from geoestimation_tpu.models.qat import (
        fold_variables,
        unfold_to_variables,
    )
    from geoestimation_tpu.models.quant import (
        calibrate,
        pack_scales,
        quantize_model,
        weights_hash,
    )
    from geoestimation_tpu.models.tta_distill import (
        build_exact_tta_apply,
        build_ftta_apply,
        make_distill_step,
        make_eval_kl,
        teacher_log_probs,
    )
    from geoestimation_tpu.train.checkpoint import (
        load_for_inference,
        save_single,
    )

    config, state = load_for_inference(args.checkpoint,
                                       hparams_path=args.hparams)
    mp = config.model_params
    paths = resolve_partitioning_paths(
        mp.partitionings.files,
        [os.path.dirname(os.path.abspath(args.checkpoint)),
         args.checkpoint, os.getcwd()])
    parts = load_partitionings(paths,
                               names=list(mp.partitionings.shortnames))
    n_classes = tuple(len(pp) for pp in parts)
    variables = {"params": state["params"],
                 "batch_stats": state["batch_stats"]}

    # --- distillation set: fixed base batches from the folder ----------
    batches, n = [], 0
    for fb in iter_image_folder(args.image_dir,
                                batch_size=args.batch_size):
        good = fb.images[np.asarray(fb.valid)]
        if len(good) == args.batch_size:  # static shapes for jit
            batches.append(good)
            n += len(good)
        if n >= args.images:
            break
    if not batches:
        p.error(f"no full batches of {args.batch_size} decodable images "
                f"in {args.image_dir}")
    print(f"distilling on {n} images ({len(batches)} batches of "
          f"{args.batch_size}), {args.crops}-crop, level {args.level}, "
          f"scope {args.train_scope}", flush=True)

    folded = fold_variables(variables, arch=mp.arch)

    # --- teacher: frozen exact ten-crop log-probs, once per batch ------
    exact_apply = build_exact_tta_apply(mp.arch, n_classes,
                                        crop=args.crop, n_crops=args.crops)
    teacher_fn = jax.jit(lambda f, b: teacher_log_probs(
        exact_apply, f, b, args.crops, args.tta_fold))
    t0 = time.time()
    teachers = [jax.device_get(teacher_fn(folded, jnp.asarray(b)))
                for b in batches]
    print(f"teacher pass done ({time.time() - t0:.0f}s)", flush=True)

    # --- distill loop ---------------------------------------------------
    ftta_apply = build_ftta_apply(mp.arch, n_classes, level=args.level,
                                  crop=args.crop, n_crops=args.crops)
    tx = (optax.adam(args.lr) if args.optimizer == "adam"
          else optax.sgd(args.lr, momentum=args.momentum))
    opt_state = tx.init(folded)
    step_fn = jax.jit(
        make_distill_step(ftta_apply, tx, args.crops,
                          tta_fold=args.tta_fold,
                          train_scope=args.train_scope,
                          level=args.level, arch=mp.arch,
                          exact_apply=(exact_apply if args.anchor_weight
                                       else None),
                          anchor_weight=args.anchor_weight),
        donate_argnums=(0, 1))
    eval_kl_fn = jax.jit(make_eval_kl(ftta_apply, exact_apply, args.crops,
                                      tta_fold=args.tta_fold))

    def full_eval_kl(f):
        """Verdict pair (ftta KL, exact KL) averaged over the WHOLE set."""
        tot_f = tot_e = 0.0
        for b, t in zip(batches, teachers):
            kf, ke = eval_kl_fn(f, jnp.asarray(b),
                                tuple(jnp.asarray(x) for x in t))
            tot_f += float(kf)
            tot_e += float(ke)
        return tot_f / len(batches), tot_e / len(batches)

    # Best-verdict retention: at every log point the verdict pair
    # (ftta KL, exact-anchor KL) is evaluated over the WHOLE
    # distillation set (per-batch train KL is too noisy to compare
    # across log points), and the lowest-total snapshot is exported —
    # distillation from an already-good start can wander, and this makes
    # the tool strictly non-harmful.
    kf0, ke0 = full_eval_kl(folded)
    best_kl, best_folded = kf0 + ke0, jax.device_get(folded)
    print(f"start     ftta-kl {kf0:.5f}  exact-kl {ke0:.5f}", flush=True)
    t0 = time.time()
    for i in range(args.steps):
        # evaluate the DEVICE-RESIDENT params before the (donating) step
        # — snapshotting to host first would re-transfer the full model
        # per eval batch on a tunneled device
        if i and (i % args.log_every == 0 or i == args.steps - 1):
            kf, ke = full_eval_kl(folded)
            new_best = kf + ke < best_kl
            if new_best:
                best_kl, best_folded = kf + ke, jax.device_get(folded)
            print(f"step {i:5d}  ftta-kl {kf:.5f}  exact-kl {ke:.5f}  "
                  f"({time.time() - t0:.0f}s)"
                  + ("  [best]" if new_best else ""), flush=True)
        j = i % len(batches)
        folded, opt_state, _ = step_fn(
            folded, opt_state, jnp.asarray(batches[j]),
            tuple(jnp.asarray(t) for t in teachers[j]))
    # the final post-update state gets a verdict too
    kf, ke = full_eval_kl(folded)
    if kf + ke < best_kl:
        best_kl, best_folded = kf + ke, jax.device_get(folded)
    print(f"final     ftta-kl {kf:.5f}  exact-kl {ke:.5f}", flush=True)
    print(f"exporting best snapshot (total kl {best_kl:.5f})", flush=True)

    # --- export ----------------------------------------------------------
    new_vars = unfold_to_variables(best_folded, variables, arch=mp.arch)
    os.makedirs(args.out, exist_ok=True)
    save_single(args.out,
                {"params": new_vars["params"],
                 "batch_stats": new_vars["batch_stats"],
                 "step": int(args.steps)},
                config=config, step=args.steps)
    # int8 scales for the distilled weights (serving convenience; the
    # distillation set doubles as the calibration set)
    calib = [b for b in batches][:max(1, args.calib_images
                                      // args.batch_size)]
    scales = calibrate(new_vars, calib, arch=mp.arch, crop=args.crop)
    qnet = quantize_model(new_vars, arch=mp.arch)
    packed = pack_scales(scales, weights_hash=weights_hash(qnet),
                         source="distill",
                         n_images=sum(len(b) for b in calib))
    spath = default_scales_path(args.out)
    with open(spath, "w") as f:
        json.dump(packed, f, indent=1, sort_keys=True)
    print(f"wrote distilled checkpoint to {args.out} and scales to "
          f"{spath}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
