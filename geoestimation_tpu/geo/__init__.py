"""Geo core: S2 cell math, partitionings, hierarchy (SURVEY.md layer L0)."""

from . import s2
from .create_cells import assign_classes, create_cells
from .hierarchy import Hierarchy, ancestor_map
from .partitioning import Partitioning, load_partitionings

__all__ = [
    "s2",
    "create_cells",
    "assign_classes",
    "Hierarchy",
    "ancestor_map",
    "Partitioning",
    "load_partitionings",
]
