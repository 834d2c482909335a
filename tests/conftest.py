"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Per SURVEY.md §7: `--xla_force_host_platform_device_count=8` provides the
distributed test substrate (sharding / psum equivalence) without TPU
hardware.

Environment quirk: this image's sitecustomize imports jax at interpreter
startup and forces the `axon` (tunneled TPU) platform, so jax has already
snapshotted JAX_PLATFORMS before this conftest runs. Setting the env var is
not enough — we must update jax's own config, which is still safe here
because no backend has been initialized yet. Without this, every tiny test
op round-trips through the TPU tunnel (and concurrent processes serialize
on the single chip).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("GEOESTIMATION_TPU_TEST", "1")

import jax

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU mesh, not the tunneled TPU; "
    f"got {jax.default_backend()}"
)
assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.device_count()}"
)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def geo_parts():
    """Three partitionings (coarse/middle/fine) covering a patch around
    (48-49N, 2-3E) plus background noise — shared by loader/train tests."""
    from geoestimation_tpu.geo import create_cells

    rng = np.random.default_rng(123)
    lat = np.concatenate([rng.uniform(47.5, 49.5, 4000),
                          rng.uniform(-60, 70, 1000)])
    lng = np.concatenate([rng.uniform(1.5, 3.5, 4000),
                          rng.uniform(-180, 180, 1000)])
    out = []
    for img_max, name in [(2500, "coarse"), (900, "middle"), (350, "fine")]:
        out.append(
            create_cells(lat, lng, img_min=5, img_max=img_max,
                         name=name).partitioning
        )
    return out
