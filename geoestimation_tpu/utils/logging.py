"""Metrics logging: stdout + CSV + optional TensorBoard.

Reference observability (SURVEY.md §5): Lightning progress bar + optional
TensorBoard logger. Build: same metrics (train loss, val_loss, GCD
threshold accuracies) logged to stdout, appended to `metrics.csv` in the
checkpoint dir, and mirrored to TensorBoard when available.
"""

from __future__ import annotations

import csv
import os
import time
from typing import Optional


class MetricsLogger:
    def __init__(self, directory: Optional[str] = None,
                 tensorboard: bool = True, stdout=print):
        self.stdout = stdout
        self._csv_path = None
        self._csv_fields = None
        self._tb = None
        if directory:
            os.makedirs(directory, exist_ok=True)
            self._csv_path = os.path.join(directory, "metrics.csv")
            if tensorboard:
                try:
                    from torch.utils.tensorboard import SummaryWriter

                    self._tb = SummaryWriter(
                        log_dir=os.path.join(directory, "tb")
                    )
                except Exception:
                    self._tb = None

    def log(self, step: int, metrics: dict, prefix: str = ""):
        metrics = {
            (f"{prefix}{k}" if prefix else k): float(v)
            for k, v in metrics.items()
        }
        parts = " ".join(f"{k} {v:.5g}" for k, v in metrics.items())
        self.stdout(f"step {step} {parts}")
        if self._csv_path:
            row = {"step": step, "time": time.time(), **metrics}
            exists = os.path.exists(self._csv_path)
            fields = self._csv_fields or list(row)
            # tolerate evolving field sets by rewriting header-compatible
            # subset rows only
            with open(self._csv_path, "a", newline="") as f:
                writer = csv.DictWriter(f, fieldnames=fields,
                                        extrasaction="ignore")
                if not exists:
                    writer.writeheader()
                    self._csv_fields = fields
                writer.writerow(row)
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, v, step)

    def close(self):
        if self._tb is not None:
            self._tb.flush()
            self._tb.close()
