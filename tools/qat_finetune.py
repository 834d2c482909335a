"""Quantization-aware fine-tuning for the int8 serving path.

The escalation path when PTQ (the default, see docs/QUANTIZATION.md)
ever exceeds the 0.5-pt GCD parity budget on a real checkpoint: load
the checkpoint, calibrate serving activation scales once, fine-tune the
BN-folded network THROUGH the int8 fake-quantizer (models/qat.py) on
the original training data for a few hundred steps at low LR, and write

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
    apply_fn = build_qat_apply(mp.arch, scales, n_classes=n_classes)
    crop_scale = tuple(tp.train_crop_scale) if tp.train_crop_scale else None
    if crop_scale:
        print(f"augmenting with the checkpoint's train_crop_scale="
              f"{crop_scale}", flush=True)
    step_fn = jax.jit(
        make_qat_train_step(apply_fn, tx, crop=tp.image_size,
                            label_smoothing=tp.label_smoothing,
                            crop_scale=crop_scale),
        donate_argnums=(0, 1))
    rng = jax.random.PRNGKey(args.seed)

    t0 = time.time()
    for i in range(args.steps):
        fb = next(it)
        folded, opt_state, m = step_fn(
            folded, opt_state, jnp.asarray(fb.images),
            jnp.asarray(fb.labels), rng, jnp.int32(i))
        if i % args.log_every == 0 or i == args.steps - 1:
            print(f"step {i:5d}  loss {float(m['loss']):.4f}  "
                  f"({time.time() - t0:.0f}s)", flush=True)
    del it  # abandoning the iterator stops its producer thread

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
