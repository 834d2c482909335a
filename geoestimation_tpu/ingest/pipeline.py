"""XLA-resident image pipeline: crops, flips, normalization on device.

Everything downstream of JPEG decode runs inside jit (BASELINE north star:
"XLA-resident image ingest path fusing ... resize, center/ten-crop,
ImageNet normalization"). The host hands the device a uint8
(B, base, base, 3) tensor; these functions run fused into the model's
first convolution by XLA, so the normalize/crop math costs ~zero extra HBM
traffic.

Crop semantics: ten-crop = 4 corners + center of the base image at
`crop` resolution, plus the horizontal flips of all five — the torchvision
TenCrop recipe the reference's eval used (SURVEY.md §3.1; crop count per
BASELINE: ten-crop, kept configurable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .decode import IMAGENET_MEAN, IMAGENET_STD


def normalize(images, dtype=jnp.bfloat16):
    """uint8 (..., H, W, 3) -> ImageNet-normalized `dtype` tensor.

    The affine runs on a (..., W*3)-flattened view with the per-channel
    mean/std tiled across lanes: with C=3 as the minor (lane) dim the VPU
    uses 3 of 128 lanes per op, and this elementwise pass measured ~2.3 ms
    of pure lane waste at batch 640 on v5e (tools notes in
    docs/PERF_NOTES.md round 2). Identical values — the affine is
    elementwise, so layout is free to choose.
    """
    mean = jnp.tile(jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0,
                    images.shape[-2])
    std = jnp.tile(jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0,
                   images.shape[-2])
    flat = images.reshape(images.shape[:-2] + (-1,)).astype(jnp.float32)
    x = (flat - mean) / std
    return x.astype(dtype).reshape(images.shape)


def center_crop(images, crop=224):
    """(B, H, W, 3) -> (B, crop, crop, 3) center crop."""
    h, w = images.shape[-3], images.shape[-2]
    top = (h - crop) // 2
    left = (w - crop) // 2
    return images[..., top:top + crop, left:left + crop, :]


def five_crop(images, crop=224):
    """(B, H, W, 3) -> (B, 5, crop, crop, 3): 4 corners + center."""
    h, w = images.shape[-3], images.shape[-2]
    tl = images[..., :crop, :crop, :]
    tr = images[..., :crop, w - crop:, :]
    bl = images[..., h - crop:, :crop, :]
    br = images[..., h - crop:, w - crop:, :]
    cc = center_crop(images, crop)
    return jnp.stack([tl, tr, bl, br, cc], axis=-4)


def ten_crop(images, crop=224):
    """(B, H, W, 3) -> (B, 10, crop, crop, 3): five-crop + h-flips."""
    five = five_crop(images, crop)
    flipped = jnp.flip(five, axis=-2)
    return jnp.concatenate([five, flipped], axis=-4)


def make_crops(images, n_crops=10, crop=224):
    """Dispatch on crop count: 1 (center), 5, or 10. Returns
    (B, n_crops, crop, crop, 3)."""
    if n_crops == 1:
        return center_crop(images, crop)[:, None]
    if n_crops == 5:
        return five_crop(images, crop)
    if n_crops == 10:
        return ten_crop(images, crop)
    raise ValueError(f"n_crops must be 1, 5 or 10; got {n_crops}")


def eval_pipeline(images_u8, n_crops=10, crop=224, dtype=jnp.bfloat16):
    """uint8 (B, base, base, 3) -> normalized (B*n_crops, crop, crop, 3).

    The crop axis folds into batch so the backbone sees one large batch —
    the ten-crop TTA axis shards across the data mesh like any other batch
    element (SURVEY.md §5 long-context note).

    Normalization runs FIRST, on the (smaller) base image, then crops/flips
    copy bf16 — normalize/crop/flip are an elementwise op and slices, so
    they commute exactly, and this order measured 7.4 -> 5.0 ms at batch
    640 on v5e (uint8 C-minor copies vectorize worse than bf16 ones).
    """
    x = normalize(images_u8, dtype)
    crops = make_crops(x, n_crops, crop)
    return crops.reshape((-1,) + crops.shape[-3:])


def eval_pipeline_s8(images_u8, n_crops=10, crop=224):
    """uint8 (B, base, base, 3) -> (pixel - 128) int8 crops
    (B*n_crops, crop, crop, 3) for the int8 serving path
    (models/quant.py). Normalization lives INSIDE the int8 stem conv, so
    crops stay integer — half the HBM ingest traffic of the bf16 path."""
    x = (images_u8.astype(jnp.int16) - 128).astype(jnp.int8)
    crops = make_crops(x, n_crops, crop)
    return crops.reshape((-1,) + crops.shape[-3:])


def random_crop_flip(rng, images_u8, crop=224, flip=True):
    """Training augmentation: random crop + horizontal flip, on device.

    A batched random crop with static output shape: one crop offset per
    image via dynamic_slice under vmap; flips via jnp.where on a bernoulli
    mask. (The reference trained with torchvision RandomResizedCrop-style
    augmentation in loader workers [H]; here augmentation is on-device so
    host workers only decode.)
    """
    b, h, w, _ = images_u8.shape
    k1, k2, k3 = jax.random.split(rng, 3)
    tops = jax.random.randint(k1, (b,), 0, h - crop + 1)
    lefts = jax.random.randint(k2, (b,), 0, w - crop + 1)

    def one(img, top, left):
        return jax.lax.dynamic_slice(img, (top, left, 0), (crop, crop, 3))

    out = jax.vmap(one)(images_u8, tops, lefts)
    if flip:
        do = jax.random.bernoulli(k3, 0.5, (b,))
        out = jnp.where(do[:, None, None, None], jnp.flip(out, axis=2), out)
    return out


def random_resized_crop_flip(rng, images_u8, crop=224, scale=(0.66, 1.0),
                             n_sizes=8):
    """RandomResizedCrop-style augmentation with static shapes.

    torchvision's per-image continuous scale sampling is shape-dynamic;
    the TPU-native equivalent picks ONE crop size per step from `n_sizes`
    discrete sizes spanning sqrt(scale)·base (a `lax.switch` over static
    branches: dynamic_slice at per-image offsets, then bilinear resize to
    `crop`), plus per-image random flips. Per-step size + per-image
    position jitter preserves the recipe's augmentation strength while
    every branch stays statically shaped.
    """
    b, h, w, _ = images_u8.shape
    base = min(h, w)
    lo = max(1, int(np.floor(base * float(scale[0]) ** 0.5)))
    hi = min(base, int(np.ceil(base * float(scale[1]) ** 0.5)))
    sizes = sorted({int(round(s)) for s in np.linspace(lo, hi, n_sizes)})

    k_size, k_off, k_flip = jax.random.split(rng, 3)

    def branch(s):
        def fn(args):
            imgs, off_u = args
            tops = (off_u[:, 0] * (h - s + 1)).astype(jnp.int32)
            lefts = (off_u[:, 1] * (w - s + 1)).astype(jnp.int32)

            def one(img, top, left):
                window = jax.lax.dynamic_slice(img, (top, left, 0),
                                               (s, s, 3))
                return jax.image.resize(
                    window.astype(jnp.float32), (crop, crop, 3), "bilinear"
                )

            return jax.vmap(one)(imgs, tops, lefts)
        return fn

    idx = jax.random.randint(k_size, (), 0, len(sizes))
    off_u = jax.random.uniform(k_off, (b, 2))
    out = jax.lax.switch(idx, [branch(s) for s in sizes],
                         (images_u8, off_u))
    do = jax.random.bernoulli(k_flip, 0.5, (b,))
    out = jnp.where(do[:, None, None, None], jnp.flip(out, axis=2), out)
    return jnp.clip(out, 0.0, 255.0)


def train_pipeline(rng, images_u8, crop=224, dtype=jnp.bfloat16,
                   crop_scale=None):
    """uint8 (B, base, base, 3) -> augmented normalized (B, crop, crop, 3).

    crop_scale: optional (min, max) area-scale range enabling
    RandomResizedCrop-style jitter (the reference training recipe,
    config train_params.train_crop_scale); None = plain random crop.
    """
    if crop_scale is not None and tuple(crop_scale) != (1.0, 1.0):
        aug = random_resized_crop_flip(rng, images_u8, crop,
                                       scale=tuple(crop_scale))
        return normalize(aug, dtype)
    return normalize(random_crop_flip(rng, images_u8, crop), dtype)
