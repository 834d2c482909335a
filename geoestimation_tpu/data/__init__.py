"""Data: shards, loaders, image-folder datasets (layers L1/L2 host half)."""

from . import image_folder, loader, shards
