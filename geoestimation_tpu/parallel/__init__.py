"""Parallelism: device mesh layout and shardings (SURVEY.md §3.3)."""

from .mesh import DATA_AXIS, MODEL_AXIS, MeshLayout, make_mesh, shard_batch_arrays
