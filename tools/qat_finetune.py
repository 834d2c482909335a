"""Quantization-aware fine-tuning for the int8 serving path.

The escalation path when PTQ (the default, see docs/QUANTIZATION.md)
ever exceeds the 0.5-pt GCD parity budget on a real checkpoint: load
the checkpoint, calibrate serving activation scales once, fine-tune the
BN-folded network THROUGH the int8 fake-quantizer (models/qat.py) on
the original training data for a few hundred steps at low LR, and write

Non-harmful by construction (round 4): every --eval_every steps the
tool measures KL(fp32 teacher || student-through-quantizer) at eval
geometry on a --eval_images slice — INCLUDING step -1, the original
weights, i.e. plain PTQ — and exports the best snapshot seen. If no
fine-tune step beats the PTQ floor (the realistic-world case:
docs/QUANTIZATION.md "drift, the saturation ratchet, and snapshot
retention"), the original weights ship with an explicit message.
--anchor_weight adds a KL anchor to the frozen fp32 teacher;
--upper_ste passes gradient through the upper clip (both measured,
both documented dead ends on the realistic corpus — the ratchet and
the escalator).

  * a standard checkpoint (identity BNs) that every existing CLI and
    the bf16 path consume unchanged, and
  * the matching `int8_scales.json` (v2 provenance, source="qat") so
    `--precision 8` serves with the exact scales QAT trained against.

Usage (demo world):
  python tools/qat_finetune.py --checkpoint /tmp/qworld/ckpt \
      --out /tmp/qworld/ckpt_qat --steps 200 --lr 1e-4
  python -m classification.test --checkpoint /tmp/qworld/ckpt_qat \
      --precision 8 ...

Verification: tools/quant_study.py --checkpoint <out> measures the
post-QAT int8-vs-fp32 flip rate / GCD deltas (fp32 reference = the QAT
checkpoint itself, i.e. the study isolates residual quantization error).
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
    p = argparse.ArgumentParser(description="int8 QAT fine-tune")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--hparams", default=None)
    p.add_argument("--out", required=True,
                   help="output checkpoint directory")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--batch_size", type=int, default=None,
                   help="default: train_params.batch_size")
    p.add_argument("--anchor_weight", type=float, default=0.0,
                   help="weight of the per-head KL(teacher || student) "
                        "anchor against the FROZEN original network. "
                        "0 = plain CE fine-tuning. On corpora with high "
                        "view diversity, CE alone drifts held-out "
                        "predictions past the cross-checkpoint parity "
                        "budget within a few hundred steps; the anchor "
                        "directly optimizes the contract quant_study "
                        "measures (docs/QUANTIZATION.md round-4 "
                        "findings)")
    p.add_argument("--upper_ste", action="store_true",
                   help="pass gradient 1 through the UPPER fake-quant "
                        "clip (and both clips at the signed _y3 site) "
                        "instead of the masked-STE zero. The masked "
                        "default is a one-way saturation ratchet: "
                        "activations pushed past the ceiling never get "
                        "a recovery gradient (measured 34-38% of fp32 "
                        "activation mass above the ceiling after 400 "
                        "masked steps on the realistic world — "
                        "docs/QUANTIZATION.md round-4 findings)")
    p.add_argument("--eval_images", type=int, default=128,
                   help="size of the parity-proxy slice used for "
                        "best-snapshot retention: every --eval_every "
                        "steps the tool measures KL(teacher || student) "
                        "at EVAL geometry (center crop) on these images "
                        "and finally exports the best snapshot seen — "
                        "including step 0, i.e. if no QAT point beats "
                        "plain PTQ the ORIGINAL weights are exported "
                        "and the tool says so (the non-harmful design "
                        "tools/tta_distill.py validated). 0 disables "
                        "retention (export the last step). The slice is "
                        "drawn from the training stream, so it guards "
                        "against drift, not against memorizing the "
                        "train set — verdicts still come from "
                        "tools/quant_study.py on held-out data")
    p.add_argument("--eval_every", type=int, default=20)
    p.add_argument("--eval_dir", default=None,
                   help="image folder to draw the parity-proxy slice "
                        "from (true eval-geometry pixels through the "
                        "serving ingest; unlabeled is fine — the proxy "
                        "is a KL, not an accuracy). Default: draw from "
                        "the train stream, whose stored geometry can "
                        "hide eval-corpus diversity (mixed resolutions/"
                        "qualities) on realistic corpora")
    p.add_argument("--calib_images", type=int, default=64)
    p.add_argument("--calib_stat", default="absmax",
                   choices=["absmax", "p999", "p9999"])
    p.add_argument("--calib_headroom", type=float, default=1.0)
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

    from geoestimation_tpu.data.loader import ShardBatcher, load_label_csv
    from geoestimation_tpu.eval.engine import (
        default_scales_path,
        resolve_partitioning_paths,
    )
    from geoestimation_tpu.geo import load_partitionings
    from geoestimation_tpu.models.qat import (
        build_qat_apply,
        fold_variables,
        make_qat_train_step,
        unfold_to_variables,
    )
    from geoestimation_tpu.models.quant import (
        calibrate,
        pack_scales,
        quantize_model,
        weights_hash,
    )
    from geoestimation_tpu.train.checkpoint import (
        load_for_inference,
        save_single,
    )

    config, state = load_for_inference(args.checkpoint,
                                       hparams_path=args.hparams)
    mp, tp = config.model_params, config.train_params
    if not tp.train_shards:
        p.error("checkpoint hparams carry no train_params.train_shards — "
                "QAT needs the training data the checkpoint was built on")
    paths = resolve_partitioning_paths(
        mp.partitionings.files,
        [os.path.dirname(os.path.abspath(args.checkpoint)),
         args.checkpoint, os.getcwd()])
    parts = load_partitionings(paths,
                               names=list(mp.partitionings.shortnames))
    n_classes = tuple(len(pp) for pp in parts)
    variables = {"params": state["params"],
                 "batch_stats": state["batch_stats"]}
    batch_size = args.batch_size or tp.batch_size

    label_map = None
    if tp.train_labels:
        label_map, _ = load_label_csv(
            tp.train_labels, mp.partitionings.shortnames, with_scene=True)
    batcher = ShardBatcher(
        list(tp.train_shards),
        batch_size=batch_size,
        partitionings=None if label_map else parts,
        label_map=label_map,
        shuffle=True,
        seed=args.seed,
        repeat=True,
        num_workers=tp.num_workers,
    )
    it = iter(batcher)

    # --- calibrate serving scales (static during QAT) ------------------
    calib, n_calib = [], 0
    while n_calib < args.calib_images:
        fb = next(it)
        take = min(args.calib_images - n_calib, len(fb.images))
        calib.append(fb.images[:take])
        n_calib += take
    print(f"calibrating on {n_calib} training images "
          f"(stat={args.calib_stat}, headroom={args.calib_headroom:g})",
          flush=True)
    scales = calibrate(variables, calib, arch=mp.arch,
                       stat=args.calib_stat, headroom=args.calib_headroom,
                       crop=tp.image_size)

    # --- QAT loop ------------------------------------------------------
    folded = fold_variables(variables, arch=mp.arch)
    tx = optax.sgd(args.lr, momentum=args.momentum)
    opt_state = tx.init(folded)
    apply_fn = build_qat_apply(mp.arch, scales, n_classes=n_classes,
                               upper_ste=args.upper_ste)
    crop_scale = tuple(tp.train_crop_scale) if tp.train_crop_scale else None
    if crop_scale:
        print(f"augmenting with the checkpoint's train_crop_scale="
              f"{crop_scale}", flush=True)
    teacher_apply = teacher_folded = None
    if args.anchor_weight or args.eval_images:
        # frozen fp32 teacher: the same folded graph WITHOUT the
        # quantizer — a second fold gives an untouched copy (the
        # student tree is donated each step)
        teacher_apply = build_qat_apply(mp.arch, scales,
                                        n_classes=n_classes,
                                        fake_quant=False)
        teacher_folded = fold_variables(variables, arch=mp.arch)
    if args.anchor_weight:
        print(f"anchored QAT: KL(teacher || student) x "
              f"{args.anchor_weight:g}", flush=True)

    # --- parity-proxy slice for best-snapshot retention ----------------
    kl_fn = None
    if args.eval_images:
        from geoestimation_tpu.ingest.pipeline import eval_pipeline_s8

        ev, n_ev = [], 0
        if args.eval_dir:
            from geoestimation_tpu.data.image_folder import (
                iter_image_folder,
            )

            for fb in iter_image_folder(args.eval_dir, batch_size=32):
                good = fb.images[np.asarray(fb.valid)]
                take = min(args.eval_images - n_ev, len(good))
                if take:
                    ev.append(good[:take])
                    n_ev += take
                if n_ev >= args.eval_images:
                    break
        else:
            while n_ev < args.eval_images:
                fb = next(it)
                take = min(args.eval_images - n_ev, len(fb.images))
                ev.append(fb.images[:take])
                n_ev += take
        x_ev = eval_pipeline_s8(
            jnp.asarray(np.concatenate(ev, axis=0)), n_crops=1,
            crop=tp.image_size).astype(jnp.float32)
        t_ev = [jax.lax.stop_gradient(t)
                for t in teacher_apply(teacher_folded, x_ev)]

        from geoestimation_tpu.models.qat import teacher_student_kl

        @jax.jit
        def kl_fn(folded):
            return teacher_student_kl(t_ev, apply_fn(folded, x_ev))

        print(f"snapshot retention: {n_ev}-image parity proxy at eval "
              f"geometry, every {args.eval_every} steps", flush=True)
    step_fn = jax.jit(
        make_qat_train_step(apply_fn, tx, crop=tp.image_size,
                            label_smoothing=tp.label_smoothing,
                            crop_scale=crop_scale,
                            anchor_weight=args.anchor_weight,
                            teacher_apply=teacher_apply,
                            teacher_folded=teacher_folded),
        donate_argnums=(0, 1))
    rng = jax.random.PRNGKey(args.seed)

    t0 = time.time()
    best_kl, best_step, best_folded = None, -1, None
    if kl_fn is not None:
        # step "-1" = the original weights through the quantizer: plain
        # PTQ at these scales. QAT must beat this to export anything.
        best_kl = float(kl_fn(folded))
        best_folded = jax.device_get(folded)
        print(f"step    -1  proxy_kl {best_kl:.5f}  (PTQ floor)",
              flush=True)
    for i in range(args.steps):
        fb = next(it)
        folded, opt_state, m = step_fn(
            folded, opt_state, jnp.asarray(fb.images),
            jnp.asarray(fb.labels), rng, jnp.int32(i))
        if kl_fn is not None and (
                (i + 1) % args.eval_every == 0 or i == args.steps - 1):
            kl = float(kl_fn(folded))
            if kl < best_kl:
                best_kl, best_step = kl, i
                best_folded = jax.device_get(folded)
        if i % args.log_every == 0 or i == args.steps - 1:
            extra = (f"  anchor_kl {float(m['anchor_kl']):.4f}"
                     if "anchor_kl" in m else "")
            print(f"step {i:5d}  loss {float(m['loss']):.4f}{extra}  "
                  f"({time.time() - t0:.0f}s)", flush=True)
    del it  # abandoning the iterator stops its producer thread

    if kl_fn is not None:
        folded = jax.tree.map(jnp.asarray, best_folded)
        if best_step < 0:
            print("snapshot retention: NO QAT step improved the parity "
                  "proxy over plain PTQ — exporting the ORIGINAL "
                  f"weights (proxy_kl {best_kl:.5f}). PTQ (the grid "
                  "sweep in tools/quant_study.py) is this checkpoint's "
                  "serving answer.", flush=True)
        else:
            print(f"snapshot retention: exporting step {best_step} "
                  f"(proxy_kl {best_kl:.5f})", flush=True)

    # --- export --------------------------------------------------------
    new_vars = unfold_to_variables(folded, variables, arch=mp.arch)
    os.makedirs(args.out, exist_ok=True)
    save_single(args.out,
                {"params": new_vars["params"],
                 "batch_stats": new_vars["batch_stats"],
                 "step": int(args.steps)},
                config=config, step=args.steps)
    qnet = quantize_model(new_vars, arch=mp.arch)
    packed = pack_scales(scales, weights_hash=weights_hash(qnet),
                         source="qat", n_images=n_calib,
                         stat=args.calib_stat,
                         headroom=args.calib_headroom)
    spath = default_scales_path(args.out)
    with open(spath, "w") as f:
        json.dump(packed, f, indent=1, sort_keys=True)
    print(f"wrote QAT checkpoint to {args.out} and scales to {spath}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
