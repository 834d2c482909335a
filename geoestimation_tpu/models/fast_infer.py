"""Fast inference path: folded-BN ResNet with Pallas fused blocks.

Builds, from a trained `MultiPartitioningClassifier` variables dict, a pure
`apply(images) -> [logits]` function where:

  * every conv's BatchNorm is algebraically folded into its weights
    (inference running stats) — zero elementwise BN cost;
  * stride-1 bottleneck blocks in the HBM-bound 56x56 and 28x28 stages run
    through the fused Pallas kernel (`ops/fused_bottleneck.py`);
  * the stem, stride-2 stage entries, and the 14x14/7x7 stages (measured at
    ~94% MXU under XLA) stay on XLA;
  * the fused multi-head matmul runs in bf16 with fp32 accumulation.

Numerics: identical math to `model.apply(..., train=False)` up to bf16
rounding (BN folding is exact in fp32; tests assert prediction agreement).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fused_bottleneck import fold_bn, fused_bottleneck, fused_bottleneck_s2


def _fold_block(params, stats, eps=1e-5):
    """Fold one bottleneck block's convs+BNs. Returns dict of arrays."""
    out = {}
    for conv, bn in (("conv1", "bn1"), ("conv2", "bn2"), ("conv3", "bn3")):
        k, b = fold_bn(
            np.asarray(params[conv]["kernel"], np.float32),
            np.asarray(params[bn]["scale"], np.float32),
            np.asarray(params[bn]["bias"], np.float32),
            np.asarray(stats[bn]["mean"], np.float32),
            np.asarray(stats[bn]["var"], np.float32),
            eps,
        )
        out[conv] = (k, b)
    if "downsample_conv" in params:
        k, b = fold_bn(
            np.asarray(params["downsample_conv"]["kernel"], np.float32),
            np.asarray(params["downsample_bn"]["scale"], np.float32),
            np.asarray(params["downsample_bn"]["bias"], np.float32),
            np.asarray(stats["downsample_bn"]["mean"], np.float32),
            np.asarray(stats["downsample_bn"]["var"], np.float32),
            eps,
        )
        out["downsample"] = (k, b)
    return out


def _xla_block(x, fb, stride, mirror=False):
    """Folded bottleneck on XLA (any stride).

    Everything stays bf16 end to end (the MXU still accumulates bf16 convs
    in fp32 internally). Hardware A/B (tools/bench_kernels.py e2e): an
    earlier fp32-output variant (preferred_element_type=f32 + fp32 bias/
    relu) materialized fp32 activations in the HBM-bound stages and ran the
    full model at 106 ms/step vs flax's 61 — layout/width of what hits HBM
    dominates everything else here.

    mirror=True applies the W-mirrored layer (kernels pre-flipped at fold
    time): for a conv with taps k, stride s, left-pad pl on width W -> W',
    the mirrored left pad is plM = s*W' - W + k - s - pl (see
    build_fast_apply mirror docs). Stride-1 3x3 stays (1,1); stride-2 3x3
    becomes (0,1); the stride-2 1x1 downsample becomes (-1,0) (XLA supports
    negative conv padding). H padding never changes — flips are horizontal.
    """
    w1, b1 = fb["conv1"]
    w2, b2 = fb["conv2"]
    w3, b3 = fb["conv3"]

    def conv(v, k, bias, s=1, pad="VALID"):
        return jax.lax.conv_general_dilated(
            v.astype(jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
            window_strides=(s, s), padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias.astype(jnp.bfloat16)

    pad2 = ((1, 1), (0, 1) if (mirror and stride == 2) else (1, 1))
    padd = ((0, 0), (-1, 0)) if (mirror and stride == 2) else "VALID"
    y = jnp.maximum(conv(x, w1, b1), 0)
    y = jnp.maximum(conv(y, w2, b2, s=stride, pad=pad2), 0)
    y = conv(y, w3, b3)
    if "downsample" in fb:
        wd, bd = fb["downsample"]
        res = conv(x, wd, bd, s=stride, pad=padd)
    else:
        res = x.astype(jnp.bfloat16)
    return jnp.maximum(y + res, 0)


def _pallas_block(x, fb, images_per_tile, stride=1, logical_w=None):
    w1, b1 = fb["conv1"]
    w2, b2 = fb["conv2"]
    w3, b3 = fb["conv3"]
    wd, bd = fb.get("downsample", (None, None))
    if stride == 2:
        return fused_bottleneck_s2(
            x,
            w1.reshape(w1.shape[-2], w1.shape[-1]), b1,
            w2, b2,
            w3.reshape(w3.shape[-2], w3.shape[-1]), b3,
            wd.reshape(wd.shape[-2], wd.shape[-1]), bd,
            images_per_tile=images_per_tile,
        )
    return fused_bottleneck(
        x,
        w1.reshape(w1.shape[-2], w1.shape[-1]), b1,
        w2, b2,
        w3.reshape(w3.shape[-2], w3.shape[-1]), b3,
        wd=None if wd is None else wd.reshape(wd.shape[-2], wd.shape[-1]),
        bd=bd,
        images_per_tile=images_per_tile,
        logical_w=logical_w,
    )


from .resnet import STAGE_SIZES

# Stages whose stride-1 blocks go through the Pallas kernel, with the
# images-per-tile for each (plane size -> tall-matmul folding).
PALLAS_STAGES = {0: 1, 1: 2}


def build_fast_apply(variables, arch="resnet50", n_classes=None,
                     use_pallas=True, use_pallas_s2=False, eps=1e-5,
                     pallas_stages=None, mirror=False):
    """Returns `apply(images_u8_or_f32) -> [per-head fp32 logits]`.

    `images` must already be normalized (use ingest.pipeline); shape
    (B, H, W, 3). If `n_classes` is given, the fused head output is split
    per partitioning like the linen model.

    `pallas_stages`: {stage_index: images_per_tile} overriding
    PALLAS_STAGES — which stages' stride-1 blocks run the fused kernel
    (hardware A/B knob; see tools/bench_kernels.py).

    `mirror=True` builds the W-MIRRORED network: netM(x) == flip_W(
    net(flip_W(x))) layer by layer, exactly — conv kernels flipped along
    their width-tap axis and strided layers' width padding shifted to
    plM = s*W' - W + k - s - pl (elementwise ops commute with flips;
    derivation in the module docs). Because the backbone ends in a global
    average pool, features(netM(crop)) == features(net(flip(crop))) —
    which turns ten-crop TTA into five-crop x {net, netM} with ZERO input
    flipping and half the ingest traffic (see build_mirror_tta_apply).
    """
    stage_npi = PALLAS_STAGES if pallas_stages is None else pallas_stages
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    bb_p, bb_s = params["backbone"], stats["backbone"]
    stage_sizes = STAGE_SIZES[arch]

    # Fold everything once, host-side.
    stem_k, stem_b = fold_bn(
        np.asarray(bb_p["conv1"]["kernel"], np.float32),
        np.asarray(bb_p["bn1"]["scale"], np.float32),
        np.asarray(bb_p["bn1"]["bias"], np.float32),
        np.asarray(bb_s["bn1"]["mean"], np.float32),
        np.asarray(bb_s["bn1"]["var"], np.float32),
        eps,
    )
    if mirror:
        # flip the width-tap axis of every spatial kernel (HWIO axis 1);
        # 1x1 convs are tap-free on W and stay as folded
        stem_k = stem_k[:, ::-1]
    stages = []
    for stage, n_blocks in enumerate(stage_sizes):
        blocks = []
        for bidx in range(n_blocks):
            name = f"layer{stage + 1}_block{bidx}"
            fb = _fold_block(bb_p[name], bb_s[name], eps)
            if mirror:
                k2, b2 = fb["conv2"]
                fb["conv2"] = (k2[:, ::-1], b2)
            stride = 2 if stage > 0 and bidx == 0 else 1
            pallas_ok = use_pallas and (
                (stride == 1 and stage in stage_npi)
                or (stride == 2 and use_pallas_s2 and not mirror)
            )
            blocks.append((fb, stride, pallas_ok,
                           stage_npi.get(stage, 1) if stride == 1
                           else 1))
        stages.append(blocks)

    # Heads: base classifier has a single fused head; ISN carries a scene
    # head plus per-scene geo heads and hard-routes by scene argmax.
    isn = "scene_head" in params
    if isn:
        scene_kernel = jnp.asarray(params["scene_head"]["kernel"],
                                   jnp.bfloat16)
        scene_bias = jnp.asarray(params["scene_head"]["bias"], jnp.float32)
        head_kernel = jnp.asarray(params["scene_geo_heads"]["kernel"],
                                  jnp.bfloat16)
        head_bias = jnp.asarray(params["scene_geo_heads"]["bias"],
                                jnp.float32)
        n_scenes = scene_kernel.shape[-1]
    else:
        head_kernel = jnp.asarray(params["heads"]["fused_head"]["kernel"],
                                  jnp.bfloat16)
        head_bias = jnp.asarray(params["heads"]["fused_head"]["bias"],
                                jnp.float32)
    stem_k = jnp.asarray(stem_k, jnp.bfloat16)
    stem_b = jnp.asarray(stem_b, jnp.float32)
    stages = [
        [(jax.tree.map(jnp.asarray, fb), stride, pallas_ok, npi)
         for fb, stride, pallas_ok, npi in blocks]
        for blocks in stages
    ]

    # Mirrored width paddings: plM = s*W' - W + k - s - pl, pr covering the
    # last read (H padding untouched). Stem 7x7 s2 on 224: (3,3) -> (2,3);
    # maxpool 3x3 s2 on 112: (1,1) -> (0,1).
    stem_pad_w = (2, 3) if mirror else (3, 3)
    pool_pad_w = (0, 1) if mirror else (1, 1)

    import os as _os

    pool_mode = _os.environ.get("GEO_POOL_MODE", "reduce_window")

    def stem_fn(images):
        x = images.astype(jnp.bfloat16)
        x = jax.lax.conv_general_dilated(
            x, stem_k, window_strides=(2, 2),
            padding=((3, 3), stem_pad_w),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + stem_b.astype(jnp.bfloat16)
        x = jnp.maximum(x, 0).astype(jnp.bfloat16)
        if pool_mode == "slices" and not mirror:
            from .quant import max_pool_3x3_s2

            return max_pool_3x3_s2(x, mode="slices").astype(jnp.bfloat16)
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), pool_pad_w, (0, 0)),
        ).astype(jnp.bfloat16)

    def make_stage_fn(blocks):
        def stage_fn(x):
            # stride-2 stage entry runs unpadded (Pallas s2 when enabled)
            fb, stride, pallas_ok, npi = blocks[0]
            if stride == 2 and pallas_ok and x.shape[0] % npi == 0 \
                    and x.shape[2] % 8 == 0:
                x = _pallas_block(x, fb, npi, stride=2)
                rest = blocks[1:]
            elif stride == 2:
                x = _xla_block(x, fb, 2, mirror=mirror)
                rest = blocks[1:]
            else:
                rest = blocks
            if not rest:
                return x
            # stride-1 body: when the plane width isn't a multiple of 8
            # (layer2's 28), carry the stage at padded width — pad once,
            # run every fused block at logical_w, slice once
            # (PERF_NOTES round-2 #3; ops/fused_bottleneck.py carry mode).
            w = x.shape[2]
            npi0 = rest[0][3]
            fuse_stage = (rest[0][2] and x.shape[0] % npi0 == 0)
            if fuse_stage and w % 8:
                wbuf = -(-(w + 2) // 8) * 8
                x = jnp.pad(x, ((0, 0), (0, 0), (0, wbuf - w), (0, 0)))
                for fb, stride, _, npi in rest:
                    x = _pallas_block(x, fb, npi, stride=1, logical_w=w)
                x = x[:, :, :w, :]
            elif fuse_stage:
                for fb, stride, _, npi in rest:
                    x = _pallas_block(x, fb, npi, stride=1)
            else:
                for fb, stride, _, npi in rest:
                    x = _xla_block(x, fb, stride)
            return x
        return stage_fn

    stage_fns = [stem_fn] + [make_stage_fn(blocks) for blocks in stages]

    def head_logits(x):
        feats = jnp.mean(x, axis=(1, 2), dtype=jnp.float32)
        logits = jax.lax.dot_general(
            feats.astype(jnp.bfloat16), head_kernel,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + head_bias
        if isn:
            # hard scene routing, same semantics as ISNClassifier.__call__
            scene_logits = jax.lax.dot_general(
                feats.astype(jnp.bfloat16), scene_kernel,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + scene_bias
            gate = jax.nn.one_hot(jnp.argmax(scene_logits, -1), n_scenes,
                                  dtype=jnp.float32)
            per_scene = logits.reshape(logits.shape[0], n_scenes, -1)
            logits = jnp.einsum("bsc,bs->bc", per_scene, gate)
        if n_classes is None:
            return logits
        out, start = [], 0
        for n in n_classes:
            out.append(logits[:, start:start + n])
            start += n
        return out

    def apply(images):
        x = images
        for fn in stage_fns:
            x = fn(x)
        return head_logits(x)

    apply.stage_fns = stage_fns  # cut points for tools/bench_stages.py
    apply.head_logits = head_logits  # reused by build_feature_tta_apply
    return apply


def ftta_mirror_concat(base, n_crops):
    """Trunk input for feature-space TTA: the base batch, plus its
    horizontal mirror appended on the batch axis for n_crops=10
    (flip(crop(x)) windows == same-offset windows of trunk(flip(x)) —
    the five-crop offset set is mirror-closed). Shared by the bf16
    (here), int8 (models/quant.py) and distillation
    (models/tta_distill.py) feature-TTA paths — ONE geometry."""
    if n_crops == 10:
        return jnp.concatenate([base, base[:, :, ::-1, :]], axis=0)
    return base


def ftta_windows(feats, b, s, crop, n_crops, level):
    """Crop-aligned windows of a trunk feature map, folded into batch:
    (b or 2b, g, g, C) -> (b * n_crops, w, w, C).

    `feats` is the shared trunk's output on `ftta_mirror_concat`'s
    batch, at feature stride s // g. Raises unless the pixel crop grid
    lands exactly on the feature grid (crop and s - crop aligned to 2x
    the stride). Window order: the five corner/center offsets,
    unflipped five first — a fixed within-image permutation of the
    exact path's crop order, which every TTA fold is invariant to.
    The single source of the feature-TTA geometry (see
    ftta_mirror_concat)."""
    g = feats.shape[1]
    stride = s // g
    if crop % stride or (s - crop) % (2 * stride):
        raise ValueError(
            f"feature TTA needs crop {crop} and base {s} aligned to "
            f"2x the layer{level} stride ({stride})")
    w = crop // stride
    m = g - w
    offs = [(0, 0), (0, m), (m, 0), (m, m), (m // 2, m // 2)]
    u = feats[:b]
    windows = [u[:, r:r + w, c:c + w] for r, c in offs]
    if n_crops == 10:
        f = feats[b:]
        windows += [f[:, r:r + w, c:c + w] for r, c in offs]
    xc = jnp.stack(windows, axis=1)
    return xc.reshape((b * n_crops,) + xc.shape[2:])


def build_feature_tta_apply(variables, arch="resnet50", n_classes=None,
                            use_pallas=False, crop=224, n_crops=10,
                            eps=1e-5, level=3):
    """Feature-space ten-crop TTA, bf16: `apply(base_norm) -> logits
    (B * n_crops, C)` where `base_norm` is the NORMALIZED square base
    image (B, S, S, 3), not crops.

    Runs stem..layer{level} once on the base (plus once on its
    horizontal mirror for n_crops=10), crops the crop-aligned windows
    from that stage's feature map (crop-grid pixel offsets are exact
    multiples of the feature stride), and runs the remaining stages +
    head per window. At level=3 (default) only layer4 runs per crop —
    ten-crop trunk work drops ~4x. APPROXIMATE at crop borders (features
    see real neighbors instead of crop padding); lower levels crop
    earlier features (stride 8 at level 2), so the later stages see
    exactly the per-crop geometry and only the small-receptive-field
    early features carry border context. Measured (docs/QUANTIZATION.md,
    docs/quant_study_r3b.json): level 2 does NOT reduce the accuracy
    delta vs level 3 — the border damage lives in the shared layer1/2
    receptive fields — and it is slower, so level 3 is the only
    sensible setting; the knob exists to make that measurable. The int8
    twin is quant.build_int8_apply(feature_tta=...)."""
    if n_crops not in (5, 10):
        raise ValueError("feature TTA n_crops must be 5 or 10")
    inner = build_fast_apply(variables, arch, n_classes=n_classes,
                             use_pallas=use_pallas, eps=eps)
    n_stages = len(inner.stage_fns) - 1
    if not 1 <= level <= n_stages - 1:
        raise ValueError(
            f"feature TTA level must be in [1, {n_stages - 1}] "
            f"(got {level})")
    trunk = inner.stage_fns[:1 + level]
    rest_stages = inner.stage_fns[1 + level:]

    def apply(base_norm):
        b, s, s2_, _ = base_norm.shape
        if s != s2_:
            raise ValueError("feature TTA expects square base images")
        x = ftta_mirror_concat(base_norm, n_crops)
        for fn in trunk:
            x = fn(x)
        xc = ftta_windows(x, b, s, crop, n_crops, level)
        for fn in rest_stages:
            xc = fn(xc)
        return inner.head_logits(xc)

    return apply


def build_mirror_tta_apply(variables, arch="resnet50", n_classes=None,
                           use_pallas=True, pallas_stages=None, crop=224,
                           n_crops=10, dtype=jnp.bfloat16):
    """Flip-free ten-crop TTA: `apply(base_u8) -> [per-head logits]` with
    logits shaped (B*n_crops, C) in the (B, crops) order `mean_tta_logits`
    expects.

    Ten-crop = five crops + their horizontal flips. Because the backbone
    ends in a global average pool, net(flip(c)) has the same pooled
    features as netM(c) where netM is the width-mirrored network (see
    build_fast_apply mirror docs) — so instead of materializing 10 crops
    (2x the ingest HBM traffic, and uint8/bf16 C=3-minor copies measured
    as the single most roofline-distant stage), this runs the 5 unflipped
    crops through net and netM. Same math, half the ingest.

    n_crops=5/1 skip the mirrored pass (plain five/center crop).
    """
    from ..ingest.pipeline import make_crops, normalize

    heads = build_fast_apply(variables, arch, n_classes=n_classes,
                             use_pallas=use_pallas,
                             pallas_stages=pallas_stages)
    mirrored = None
    if n_crops == 10:
        mirrored = build_fast_apply(
            variables, arch, n_classes=n_classes, use_pallas=use_pallas,
            pallas_stages=pallas_stages, mirror=True)

    def apply(images_u8):
        b = images_u8.shape[0]
        x = normalize(images_u8, dtype)
        crops = make_crops(x, 5 if n_crops == 10 else n_crops, crop)
        crops = crops.reshape((-1,) + crops.shape[-3:])
        la = heads(crops)
        single = not isinstance(la, (list, tuple))
        if n_crops != 10:
            return la
        lm = mirrored(crops)
        if single:
            la, lm = [la], [lm]
        out = [
            jnp.concatenate(
                [a.reshape(b, 5, a.shape[-1]),
                 m.reshape(b, 5, m.shape[-1])], axis=1,
            ).reshape(b * 10, a.shape[-1])
            for a, m in zip(la, lm)
        ]
        return out[0] if single else out

    return apply
