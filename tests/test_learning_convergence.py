"""End-to-end learning proof: the model learns location from image content.

Synthetic images whose color encodes their city cluster; after a few dozen
optimizer steps the held-out hierarchical GCD accuracy @200km must go to
~1.0 (chance ~0.25 over 4 cities). Exercises the complete loop: cells ->
labels -> augment -> model -> multi-head CE -> SGD -> f* -> GCD, with
nothing mocked. (Slow: ~3 min on the CPU mesh.)"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from geoestimation_tpu.eval import (
    HierarchyArrays,
    gcd_threshold_accuracy,
    predict_hierarchical,
)
from geoestimation_tpu.geo import Hierarchy, assign_classes, create_cells
from geoestimation_tpu.ingest.pipeline import center_crop, normalize
from geoestimation_tpu.models import MultiPartitioningClassifier
from geoestimation_tpu.train.step import create_train_state, train_step

CITIES = [(48.85, 2.35), (40.7, -74.0), (35.68, 139.65), (-33.87, 151.21)]
COLORS = [(220, 40, 40), (40, 220, 40), (40, 40, 220), (220, 220, 40)]


def make(rng, n):
    lat, lng, imgs = [], [], []
    for i in range(n):
        k = i % 4
        lat.append(CITIES[k][0] + rng.normal(0, .2))
        lng.append(CITIES[k][1] + rng.normal(0, .2))
        img = np.clip(
            np.array(COLORS[k])[None, None, :] + rng.normal(0, 30,
                                                            (64, 64, 3)),
            0, 255,
        ).astype(np.uint8)
        imgs.append(img)
    return np.array(lat), np.array(lng), np.stack(imgs)


@pytest.mark.slow
def test_learns_location_from_content():
    rng = np.random.default_rng(0)
    lat, lng, imgs = make(rng, 256)
    vlat, vlng, vimgs = make(rng, 64)
    dense_lat = np.repeat(lat, 20) + rng.normal(0, .1, 256 * 20)
    dense_lng = np.repeat(lng, 20) + rng.normal(0, .1, 256 * 20)
    parts = [
        create_cells(dense_lat, dense_lng, img_min=10, img_max=m,
                     name=nm).partitioning
        for m, nm in [(3000, "c"), (1000, "m"), (300, "f")]
    ]
    h = HierarchyArrays.from_hierarchy(Hierarchy.build(parts))
    labels = assign_classes(lat, lng, parts)

    model = MultiPartitioningClassifier(
        n_classes=tuple(len(p) for p in parts), arch="resnet50",
        dtype=jnp.bfloat16,
    )
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 56, 56, 3)),
                   train=False)
    state = create_train_state(model, v, optax.sgd(0.02, momentum=0.9))
    step = jax.jit(lambda s, i, l, r: train_step(s, i, l, r, crop=56))
    key = jax.random.PRNGKey(0)
    for _ in range(40):
        idx = rng.integers(0, 256, 32)
        state, _ = step(state, jnp.asarray(imgs[idx]),
                        jnp.asarray(labels[:, idx]), key)

    x = normalize(center_crop(jnp.asarray(vimgs), 56), jnp.bfloat16)
    logits = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        x, train=False,
    )
    _, plat, plng = predict_hierarchical(logits, h)
    acc = np.asarray(
        gcd_threshold_accuracy(plat, plng, jnp.asarray(vlat),
                               jnp.asarray(vlng))
    )
    # chance over 4 cities ~0.25; trained model must exceed 0.9 @200km
    assert acc[2] > 0.9, acc
