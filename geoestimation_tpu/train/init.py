"""Model/optimizer state initialization shared by train and tools."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..models import MultiPartitioningClassifier


def model_from_config(config, partitionings):
    mp = config.model_params
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[mp.dtype]
    n_classes = tuple(len(p) for p in partitionings)
    if mp.scene_gating:
        from ..models.isn import ISNClassifier

        return ISNClassifier(
            n_classes=n_classes, n_scenes=mp.n_scenes, arch=mp.arch,
            dtype=dtype, remat=mp.remat,
        )
    return MultiPartitioningClassifier(
        n_classes=n_classes, arch=mp.arch, dtype=dtype, remat=mp.remat,
    )


def init_model_state(config, partitionings, seed: int = 0,
                     image_size: int = 224):
    """Fresh {params, batch_stats, step} for the configured model."""
    model = model_from_config(config, partitionings)
    dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), dummy, train=False)
    return model, {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
        "step": 0,
    }
