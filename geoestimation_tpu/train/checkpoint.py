"""Orbax checkpointing with the reference's consume-side surface.

Reference behavior (SURVEY.md §5 "Checkpoint / resume"): Lightning
ModelCheckpoint monitored val_loss (released ckpt
`epoch=014-val_loss=18.4833.ckpt`, README.md:94), consumed by
inference/test via `--checkpoint` + `--hparams hparams.yaml`
(README.md:95, 105-108, 149-152).

TPU-native build: async orbax checkpoints every N steps plus
select-best-val-loss retention; the config snapshot is bundled as
`hparams.yaml` in the checkpoint root so `--checkpoint DIR` alone is
enough (an explicit `--hparams` path is still honored for surface
parity).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp
import yaml


HPARAMS_NAME = "hparams.yaml"


def _abs(path):
    return os.path.abspath(os.path.expanduser(path))


class CheckpointManager:
    """Step-indexed checkpoints of {params, batch_stats, opt_state, extra}."""

    def __init__(self, directory: str, max_to_keep: int = 3,
                 best_metric: Optional[str] = "val_loss", async_save=True):
        self.directory = _abs(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=(lambda m: m[best_metric]) if best_metric else None,
            best_mode="min",
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: dict, metrics: Optional[dict] = None,
             config: Optional[Any] = None) -> bool:
        """state: pytree dict (params/batch_stats/opt_state/step...).

        Saving a step that already exists is a no-op (returns False) —
        orbax raises StepAlreadyExistsError otherwise, and the training
        loop legitimately reaches the same step from multiple paths
        (periodic + epoch-end + final). Non-finite metric values are
        dropped: metric-less checkpoints are exempt from best-N cleanup
        (kept as resume points), so e.g. a SIGTERM checkpoint saved
        before any validation isn't garbage-collected immediately.
        """
        if step in (self._mgr.all_steps() or []):
            return False
        metrics = {
            k: float(v) for k, v in (metrics or {}).items()
            if v == v and abs(float(v)) != float("inf")
        }
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(state),
            metrics=metrics or None,
        )
        if config is not None:
            write_hparams(self.directory, config)
        return True

    def restore(self, step: Optional[int] = None, template: Any = None):
        """Restore `step` (default: latest). Returns the state pytree."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no checkpoints under {self.directory!r}"
            )
        if template is not None:
            args = ocp.args.StandardRestore(template)
        else:
            args = ocp.args.StandardRestore()
        return self._mgr.restore(step, args=args)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def write_hparams(directory: str, config: Any):
    """Write the config snapshot next to the checkpoints (hparams.yaml)."""
    from ..utils.config import Config, config_to_dict

    data = config_to_dict(config) if isinstance(config, Config) else config
    with open(os.path.join(_abs(directory), HPARAMS_NAME), "w") as f:
        yaml.safe_dump(data, f, sort_keys=False)


def read_hparams(checkpoint_dir: str, hparams_path: Optional[str] = None):
    """Load the config bundled with a checkpoint (or an explicit path —
    the reference's --hparams flag, README.md:107-108)."""
    from ..utils.config import Config, _build

    path = hparams_path or os.path.join(_abs(checkpoint_dir), HPARAMS_NAME)
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    return _build(Config, raw)


def load_for_inference(checkpoint_dir: str, step: Optional[int] = None,
                       hparams_path: Optional[str] = None):
    """One-call restore for the inference/test CLIs.

    Returns (config, state_dict) where state_dict holds at least
    {'params', 'batch_stats'}. Prefers the best (lowest val_loss) step when
    metrics were recorded, else the latest.
    """
    mgr = CheckpointManager(checkpoint_dir, async_save=False)
    if step is None:
        step = mgr.best_step() or mgr.latest_step()
    state = mgr.restore(step)
    config = read_hparams(checkpoint_dir, hparams_path)
    mgr.close()
    return config, state


def save_single(directory: str, state: dict, config: Any = None,
                step: int = 0, metrics: Optional[dict] = None):
    """Convenience: write one checkpoint synchronously (tools/tests)."""
    mgr = CheckpointManager(directory, async_save=False)
    mgr.save(step, jax.device_get(state), metrics=metrics, config=config)
    mgr.wait()
    mgr.close()
