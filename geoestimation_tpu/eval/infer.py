"""Hierarchical multi-partitioning inference — the f* rule — as pure JAX.

Reference semantics (SURVEY.md §1.3, reference README.md:118-124 output;
paper "Geolocation Estimation of Photos using a Hierarchical Model and Scene
Classification", ECCV 2018): softmax each partitioning head; for every cell
of the finest partitioning, multiply its probability with the probabilities
of its ancestor cells in each coarser partitioning; argmax over fine cells;
emit that cell's mean lat/lng.

TPU-native design: the ancestor relations are precomputed int32 gather maps
(`geo.hierarchy.Hierarchy`), so f* is two `take`s, an elementwise product,
and an argmax — all fused by XLA into a few kernels, entirely on device.
Products are computed in log space (log_softmax sums) for numerical range.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class HierarchyArrays:
    """Device-resident constants derived from a `geo.hierarchy.Hierarchy`.

    Attributes:
      maps: tuple of (n_fine,) int32 ancestor gather maps, one per
        partitioning (last is identity).
      valid: (n_fine,) bool — fine cells with ancestors in every coarser
        partitioning.
      lats, lngs: tuples of (n_classes_p,) float32 per-partitioning class
        center coordinates.
      names: partitioning short names, coarse -> fine.
    """

    maps: tuple
    valid: jnp.ndarray
    lats: tuple
    lngs: tuple
    names: tuple = field(default=())

    @classmethod
    def from_hierarchy(cls, hierarchy):
        return cls(
            maps=tuple(jnp.asarray(m, jnp.int32) for m in hierarchy.maps),
            valid=jnp.asarray(hierarchy.valid),
            lats=tuple(
                jnp.asarray(p.lat, jnp.float32) for p in hierarchy.partitionings
            ),
            lngs=tuple(
                jnp.asarray(p.lng, jnp.float32) for p in hierarchy.partitionings
            ),
            names=tuple(p.name for p in hierarchy.partitionings),
        )


def hierarchical_log_probs(logits_list, harrays: HierarchyArrays):
    """f* scores over fine cells: sum of ancestor log-probs. (B, n_fine)."""
    log_probs = [jax.nn.log_softmax(l.astype(jnp.float32), axis=-1)
                 for l in logits_list]
    total = 0.0
    for lp, m in zip(log_probs, harrays.maps):
        total = total + jnp.take(lp, m, axis=-1)
    # Fine cells lacking ancestors are excluded from the argmax.
    return jnp.where(harrays.valid[None, :], total, -jnp.inf)


def predict_hierarchical(logits_list, harrays: HierarchyArrays):
    """f* prediction: (class, lat, lng) from the finest partitioning."""
    scores = hierarchical_log_probs(logits_list, harrays)
    cls = jnp.argmax(scores, axis=-1)
    return cls, harrays.lats[-1][cls], harrays.lngs[-1][cls]


def predict_per_partitioning(logits_list, harrays: HierarchyArrays):
    """Per-head argmax predictions: list of (class, lat, lng) per
    partitioning (the reference CSV also emits one row per p_key,
    README.md:118-124)."""
    out = []
    for logits, lat, lng in zip(logits_list, harrays.lats, harrays.lngs):
        cls = jnp.argmax(logits, axis=-1)
        out.append((cls, lat[cls], lng[cls]))
    return out


def predict_all(logits_list, harrays: HierarchyArrays):
    """All predictions keyed like the reference output CSV: one entry per
    partitioning shortname plus 'hierarchy'."""
    preds = {}
    for name, (cls, lat, lng) in zip(
        harrays.names, predict_per_partitioning(logits_list, harrays)
    ):
        preds[name] = (cls, lat, lng)
    preds["hierarchy"] = predict_hierarchical(logits_list, harrays)
    return preds


TTA_FOLDS = ("prob_mean", "log_mean", "logit_mean")


def mean_tta_logits(logits, n_crops, fold: str = "prob_mean"):
    """Fold a (B*n_crops, C) logits tensor back to (B, C) log-space scores
    over the TTA crops.

    fold modes:
      * "prob_mean" (default): arithmetic mean of softmax probabilities —
        the torch reference's convention (its inference softmaxed each crop
        then averaged; torchvision's TenCrop recipe does the same), kept as
        the default so an imported reference checkpoint reproduces the
        reference's argmax exactly (docs/MIGRATION.md "parity without
        retraining"). Returned as log(mean prob), staying in log space for
        the downstream f* rule.
      * "log_mean": mean of log-probabilities (geometric mean of probs) —
        sharper; penalizes crops that disagree.
      * "logit_mean": mean of raw logits.

    All three produce (B, C) scores that downstream log_softmax normalizes;
    they are NOT argmax-equivalent on real images, hence the configurable
    knob with a reference-matching default.
    """
    x = logits.astype(jnp.float32).reshape(-1, n_crops, logits.shape[-1])
    if fold == "prob_mean":
        # log(mean_c softmax) == logsumexp_c(log_softmax) - log(n_crops)
        lp = jax.nn.log_softmax(x, axis=-1)
        return jax.nn.logsumexp(lp, axis=1) - jnp.log(float(n_crops))
    if fold == "log_mean":
        return jax.nn.log_softmax(x, axis=-1).mean(axis=1)
    if fold == "logit_mean":
        return x.mean(axis=1)
    raise ValueError(f"unknown tta fold {fold!r}; have {TTA_FOLDS}")
