"""Training CLI — `python -m classification.train_base --config ...`.

Reference surface (README.md:216): one YAML config carrying model hparams
and trainer params. Additional flags cover resume and quick overrides.
"""

from __future__ import annotations

import argparse
import os


def build_parser():
    p = argparse.ArgumentParser(description="Train the multi-partitioning "
                                            "geo classifier")
    p.add_argument("--config", default="configs/baseM.yml",
                   help="YAML config (reference README.md:216)")
    p.add_argument("--max_steps", type=int, default=None,
                   help="stop after N optimizer steps (smoke runs)")
    p.add_argument("--no_resume", action="store_true",
                   help="ignore existing checkpoints")
    p.add_argument("--checkpoint_dir", default=None,
                   help="override train_params.checkpoint_dir")
    p.add_argument("--profile_dir", default=None,
                   help="dump jax profiler traces here")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (debug)")
    from geoestimation_tpu.parallel.multihost import add_coordinator_args

    add_coordinator_args(p, extra_help="Run the SAME command on every "
                         "host with its own --process_id (TPU-pod launch "
                         "recipe in parallel/multihost.py)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from geoestimation_tpu.parallel.multihost import maybe_initialize

    maybe_initialize(args)

    from geoestimation_tpu.train.loop import Trainer
    from geoestimation_tpu.utils.config import load_config

    config = load_config(args.config)
    if args.checkpoint_dir:
        config.train_params.checkpoint_dir = args.checkpoint_dir
    if args.profile_dir:
        config.train_params.profile_dir = args.profile_dir
    trainer = Trainer(
        config,
        search_dirs=[os.path.dirname(os.path.abspath(args.config)),
                     os.getcwd()],
    )
    trainer.fit(max_steps=args.max_steps, resume=not args.no_resume)


if __name__ == "__main__":
    main()
