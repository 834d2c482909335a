"""Custom TPU ops: Pallas kernels + XLA reference implementations."""

from .fused_bottleneck import (
    fold_bn,
    fused_bottleneck,
    xla_bottleneck_reference,
)
