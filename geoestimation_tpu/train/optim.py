"""Optimizer + LR schedule: the reference's recipe in optax.

Reference recipe (SURVEY.md §3.1 config row `[H]`): SGD with momentum and
a multistep LR decay, weight decay, ~15 epochs. Expressed as an optax
chain; the schedule is step-based (milestone epochs x steps_per_epoch)
with optional linear warmup.
"""

from __future__ import annotations

from typing import Optional

import optax


def multistep_schedule(base_lr: float, milestones, gamma: float,
                       steps_per_epoch: int, warmup_epochs: float = 0.0):
    boundaries = {
        int(m * steps_per_epoch): gamma for m in milestones
    }
    sched = optax.piecewise_constant_schedule(base_lr, boundaries)
    if warmup_epochs > 0:
        warmup_steps = max(1, int(warmup_epochs * steps_per_epoch))
        inside = [k for k in boundaries if k <= warmup_steps]
        if inside:
            # Clamping these would fire decays right after warmup and
            # collide on one boundary key, silently losing gamma factors.
            raise ValueError(
                f"lr milestones at steps {sorted(inside)} fall inside the "
                f"{warmup_steps}-step warmup; use milestones > "
                f"warmup_epochs ({warmup_epochs})"
            )
        warmup = optax.linear_schedule(0.0, base_lr, warmup_steps)
        sched = optax.join_schedules(
            [warmup, optax.piecewise_constant_schedule(
                base_lr,
                {k - warmup_steps: v for k, v in boundaries.items()},
            )],
            [warmup_steps],
        )
    return sched


def build_optimizer(opt_cfg, sched_cfg, steps_per_epoch: int):
    """(OptimizerConfig, LRScheduleConfig) -> (optax tx, schedule fn)."""
    if sched_cfg.name == "multistep":
        schedule = multistep_schedule(
            opt_cfg.lr, sched_cfg.milestones, sched_cfg.gamma,
            steps_per_epoch, sched_cfg.warmup_epochs,
        )
    elif sched_cfg.name == "cosine":
        total = steps_per_epoch * max(sched_cfg.milestones, default=90)
        schedule = optax.cosine_decay_schedule(opt_cfg.lr, total)
    elif sched_cfg.name == "constant":
        schedule = optax.constant_schedule(opt_cfg.lr)
    else:
        raise ValueError(f"unknown lr schedule {sched_cfg.name!r}")

    if opt_cfg.name == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(opt_cfg.weight_decay)
            if opt_cfg.weight_decay else optax.identity(),
            optax.sgd(schedule, momentum=opt_cfg.momentum,
                      nesterov=opt_cfg.nesterov),
        )
    elif opt_cfg.name == "adamw":
        tx = optax.adamw(schedule, weight_decay=opt_cfg.weight_decay)
    else:
        raise ValueError(f"unknown optimizer {opt_cfg.name!r}")
    return tx, schedule
