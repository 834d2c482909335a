"""Models: ResNet backbones + multi-partitioning classifier (layer L3)."""

from .classifier import (
    MultiHeadClassifier,
    MultiPartitioningClassifier,
    multi_head_cross_entropy,
)
from .resnet import ARCHS, FEATURE_DIM, ResNet, build_backbone, resnet50, resnet101
