"""Multi-partitioning geo classifier: backbone + one head per partitioning.

Reference: `MultiPartitioningClassifier` in `classification/train_base.py`
(SURVEY.md §3.1) — a torchvision resnet50 whose fc is replaced by a
ModuleList of Linear heads, one per S2 partitioning (coarse/middle/fine),
trained with the sum of per-head cross-entropies.

TPU-native design notes:
  * The three heads are a single fused (feat, sum_classes) matmul — one
    large MXU op instead of three small ones — split afterwards. With
    ~3.3k/7.2k/12.9k classes the fused head is a 2048 x ~23.4k matmul,
    comfortably MXU-tiled.
  * Class counts are padded to multiples of 128 lanes at the matmul level
    by XLA automatically; no manual padding needed.
  * Logits come out fp32 (softmax/CE precision), backbone runs bf16.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .resnet import build_backbone


class MultiHeadClassifier(nn.Module):
    """Fused classification heads over shared features."""

    n_classes: Sequence[int]
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features):
        total = sum(self.n_classes)
        logits = nn.Dense(
            total,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.lecun_normal(),
            name="fused_head",
        )(features.astype(jnp.float32))
        out = []
        start = 0
        for n in self.n_classes:
            out.append(logits[..., start:start + n])
            start += n
        return out


class MultiPartitioningClassifier(nn.Module):
    """Backbone + per-partitioning heads.

    __call__(images, train) -> list of per-partitioning logits, ordered
    coarse -> fine (same order as the partitioning files in the config).
    """

    n_classes: Sequence[int]
    arch: str = "resnet50"
    dtype: Any = jnp.bfloat16
    remat: bool = False

    def setup(self):
        self.backbone = build_backbone(self.arch, dtype=self.dtype,
                                       remat=self.remat)
        self.heads = MultiHeadClassifier(n_classes=tuple(self.n_classes))

    def __call__(self, images, train: bool = False):
        features = self.backbone(images, train=train)
        return self.heads(features)

    def features(self, images, train: bool = False):
        return self.backbone(images, train=train)


def multi_head_cross_entropy(logits_list, labels, label_smoothing=0.0,
                             valid=None):
    """Sum of per-head cross-entropies (the reference's training_step loss).

    Args:
      logits_list: list of (B, C_p) fp32 logits.
      labels: (P, B) or list of (B,) int labels per partitioning.
      valid: optional (P, B) or list of (B,) bool; invalid examples (label
        -1, e.g. images outside every kept cell) contribute zero loss.

    Returns (total_loss_scalar, per_head_losses list).
    """
    per_head = []
    for p, logits in enumerate(logits_list):
        y = labels[p]
        v = None if valid is None else valid[p]
        y_safe = jnp.maximum(y, 0)
        logp = jnp.take_along_axis(
            nn.log_softmax(logits, axis=-1), y_safe[:, None], axis=-1
        )[:, 0]
        if label_smoothing > 0.0:
            n = logits.shape[-1]
            smooth = nn.log_softmax(logits, axis=-1).mean(axis=-1)
            logp = (1.0 - label_smoothing) * logp + label_smoothing * smooth
        nll = -logp
        if v is None:
            v = y >= 0
        else:
            v = v & (y >= 0)
        nll = jnp.where(v, nll, 0.0)
        denom = jnp.maximum(v.sum(), 1)
        per_head.append(nll.sum() / denom)
    total = sum(per_head)
    return total, per_head
