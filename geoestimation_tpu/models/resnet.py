"""ResNet backbones in Flax, laid out for TPU.

The reference used torchvision's CUDA ResNet50 (reference README.md:54, 79)
and the original paper used ResNet101 (README.md:76). This is a fresh Flax
implementation with TPU-first choices:

  * NHWC layout end to end — the native layout for TPU convolutions.
  * bfloat16 compute / float32 params and batch stats (mixed precision);
    the MXU consumes bf16 directly.
  * Bottleneck v1.5 geometry (stride on the 3x3, as in torchvision) so the
    documented training recipe transfers unchanged.
  * `jax.checkpoint`-friendly: pure apply, no Python side effects; stage
    boundaries are natural remat points (see `train/step.py`).

The final fc is intentionally absent: heads live in
`models/classifier.py` (one per partitioning, reference README.md:190).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1(expand 4x) residual block."""

    features: int
    strides: int = 1
    expansion: int = 4
    dtype: Any = jnp.bfloat16
    norm: ModuleDef = nn.BatchNorm

    @nn.compact
    def __call__(self, x):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32)
        norm = self.norm
        out_features = self.features * self.expansion

        residual = x
        y = conv(self.features, (1, 1), name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.features, (3, 3), strides=(self.strides, self.strides),
                 padding=[(1, 1), (1, 1)], name="conv2")(y)
        y = norm(name="bn2")(y)
        y = nn.relu(y)
        y = conv(out_features, (1, 1), name="conv3")(y)
        # Zero-init the last BN scale of each block: residual branches start
        # as identity, which stabilizes large-batch training.
        y = norm(name="bn3", scale_init=nn.initializers.zeros)(y)

        if residual.shape[-1] != out_features or self.strides != 1:
            residual = conv(out_features, (1, 1),
                            strides=(self.strides, self.strides),
                            name="downsample_conv")(residual)
            residual = norm(name="downsample_bn")(residual)

        return nn.relu(y + residual.astype(y.dtype))


class ResNet(nn.Module):
    """ResNet-{50,101,152} feature extractor. Returns (B, 2048) features."""

    stage_sizes: Sequence[int]
    dtype: Any = jnp.bfloat16
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    # Rematerialize each residual block on the backward pass: trades ~30%
    # more FLOPs for O(depth) less activation HBM — the knob that lets
    # ResNet101 x large global batches fit (jax.checkpoint under the hood).
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_epsilon,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        block_cls = nn.remat(Bottleneck) if self.remat else Bottleneck
        for stage, num_blocks in enumerate(self.stage_sizes):
            features = 64 * (2 ** stage)
            for block in range(num_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = block_cls(
                    features=features,
                    strides=strides,
                    dtype=self.dtype,
                    norm=norm,
                    name=f"layer{stage + 1}_block{block}",
                )(x)

        # Global average pool -> fp32 features for the heads.
        x = jnp.mean(x, axis=(1, 2))
        return x.astype(jnp.float32)


def resnet14(dtype=jnp.bfloat16, **kw):
    """Tiny 4-stage bottleneck net (one block per stage). Not a reference
    architecture — exists so tests and the driver's multi-chip dry run can
    exercise the full stem/4-stage/head topology (and hence the real
    sharding layout) at a fraction of the compile time."""
    return ResNet(stage_sizes=(1, 1, 1, 1), dtype=dtype, **kw)


def resnet50(dtype=jnp.bfloat16, **kw):
    return ResNet(stage_sizes=(3, 4, 6, 3), dtype=dtype, **kw)


def resnet101(dtype=jnp.bfloat16, **kw):
    return ResNet(stage_sizes=(3, 4, 23, 3), dtype=dtype, **kw)


def resnet152(dtype=jnp.bfloat16, **kw):
    return ResNet(stage_sizes=(3, 8, 36, 3), dtype=dtype, **kw)


ARCHS: dict = {
    "resnet14": resnet14,
    "resnet50": resnet50,
    "resnet101": resnet101,
    "resnet152": resnet152,
}

# Canonical stage sizes — the single source for anything that walks block
# names (fast inference path, torch checkpoint importer).
STAGE_SIZES: dict = {
    "resnet14": (1, 1, 1, 1),
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}

FEATURE_DIM = 2048


def build_backbone(arch: str, dtype=jnp.bfloat16, **kw) -> ResNet:
    if arch not in ARCHS:
        raise ValueError(f"unknown arch {arch!r}; have {sorted(ARCHS)}")
    return ARCHS[arch](dtype=dtype, **kw)
