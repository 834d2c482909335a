"""Ingest: host decode + XLA-resident image pipeline (layer L2, device half)."""

from . import native
from .decode import (
    DEFAULT_BASE,
    DEFAULT_RESIZE,
    IMAGENET_MEAN,
    IMAGENET_STD,
    decode_batch,
    decode_pil,
    read_files,
)
from .pipeline import (
    center_crop,
    eval_pipeline,
    five_crop,
    make_crops,
    normalize,
    random_crop_flip,
    ten_crop,
    train_pipeline,
)
