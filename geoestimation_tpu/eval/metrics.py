"""Great-circle-distance metrics, computed on device.

Reference semantics (`classification/utils_global.py`, SURVEY.md §3.1): the
fraction of test images whose predicted coordinate lies within
{1, 25, 200, 750, 2500} km great-circle distance of the ground truth
(reference README.md:167). The reference computed this in torch on host;
here it is batched jnp so evaluation reductions stay on the TPU and can be
`psum`-reduced across data shards without a host round trip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EARTH_RADIUS_KM = 6371.0
DEFAULT_THRESHOLDS_KM = (1.0, 25.0, 200.0, 750.0, 2500.0)


def great_circle_distance(lat1, lng1, lat2, lng2, radius_km=EARTH_RADIUS_KM):
    """Haversine distance in km between degree coordinates; broadcasts.

    Computed in float64-free form stable enough for fp32 on TPU: haversine
    avoids the cos-dot-product formulation's catastrophic cancellation at
    small distances (which matters at the 1 km threshold).
    """
    lat1, lng1, lat2, lng2 = (
        jnp.deg2rad(jnp.asarray(x, jnp.float32)) for x in (lat1, lng1, lat2, lng2)
    )
    dlat = lat2 - lat1
    dlng = lng2 - lng1
    a = (
        jnp.sin(dlat / 2) ** 2
        + jnp.cos(lat1) * jnp.cos(lat2) * jnp.sin(dlng / 2) ** 2
    )
    # Clamp for numerical safety at antipodes.
    a = jnp.clip(a, 0.0, 1.0)
    return radius_km * 2.0 * jnp.arcsin(jnp.sqrt(a))


def gcd_threshold_counts(
    pred_lat, pred_lng, true_lat, true_lng,
    thresholds_km=DEFAULT_THRESHOLDS_KM, valid=None,
):
    """Per-threshold hit counts and total count for a batch.

    Returns (counts[T], total) as int32 — counts, not fractions, so shards
    can be summed (psum / host-side accumulate) before dividing.
    """
    d = great_circle_distance(pred_lat, pred_lng, true_lat, true_lng)
    thr = jnp.asarray(thresholds_km, jnp.float32)
    hits = d[..., None] <= thr  # (..., T)
    if valid is not None:
        v = jnp.asarray(valid, bool)
        hits = hits & v[..., None]
        total = v.sum().astype(jnp.int32)
    else:
        total = jnp.asarray(d.size, jnp.int32)
    counts = hits.reshape(-1, thr.shape[0]).sum(axis=0).astype(jnp.int32)
    return counts, total


def gcd_threshold_accuracy(
    pred_lat, pred_lng, true_lat, true_lng,
    thresholds_km=DEFAULT_THRESHOLDS_KM, valid=None,
):
    """Fractions within each threshold: shape (len(thresholds),) float32."""
    counts, total = gcd_threshold_counts(
        pred_lat, pred_lng, true_lat, true_lng, thresholds_km, valid
    )
    return counts.astype(jnp.float32) / jnp.maximum(total, 1).astype(jnp.float32)


class GcdAccumulator:
    """Host-side accumulator over batches of on-device counts."""

    def __init__(self, thresholds_km=DEFAULT_THRESHOLDS_KM):
        import numpy as np

        self.thresholds_km = tuple(thresholds_km)
        self.counts = np.zeros(len(self.thresholds_km), dtype="int64")
        self.total = 0

    def update(self, counts, total):
        self.counts = self.counts + jax.device_get(counts).astype("int64")
        self.total = self.total + int(total)

    def result(self):
        denom = max(self.total, 1)
        acc = self.counts.astype(float) / denom
        return dict(zip(self.thresholds_km, acc.tolist()))
