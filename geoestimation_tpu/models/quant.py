"""Int8 post-training-quantized inference path (TPU serving precision).

The reference exposes eval precision as a knob (`--precision {32,16}`,
reference README.md:159-160); this module adds the TPU-native third
option: **int8**, the v5e MXU's double-rate format. Measured on hardware
(docs/PERF_NOTES.md round 2): int8 bottleneck stages run ~1.4x faster
than bf16 across every ResNet50 stage — the MXU doubles its rate AND the
HBM-bound 56x56/28x28 stages halve their activation traffic.

Scheme (standard TensorRT-style PTQ, re-derived for XLA/TPU):

  * BatchNorm folded into conv weights first (exact, fp32 — shared with
    models/fast_infer.py).
  * Weights: symmetric per-output-channel int8
    (`s_w[o] = absmax(w[..., o]) / 127`).
  * Activations: symmetric per-tensor int8 with calibrated scales
    (absmax or percentile over a calibration set run in fp32).
  * Convs run s8 x s8 -> s32 on the MXU
    (`preferred_element_type=int32`); the int32 output is rescaled,
    biased, relu'd and requantized in fp32 **inside the conv's consumer
    fusion** — only int8 ever hits HBM between blocks.
  * Residual adds happen in the fp32 rescale domain, then requantize.
  * Post-relu activations are zero-at-zero, so XLA's zero conv padding
    is exact for every 3x3 conv.

The stem additionally folds ImageNet normalization INTO the conv: with
`w' = w / (255 * std)` and the mean/shift absorbed into the bias, the
network consumes raw (pixel - 128) int8 data — the input carries ZERO
quantization error (uint8 pixels are the true data). Borders are padded
explicitly with the per-channel value `round(mean255 - 128)` so that
padding means "pixel = dataset mean" exactly as zero-padding does in
normalized space (max error 0.5/255 of a pixel step, below bf16 eps).

Capability parity note: the reference had no int8 path (CUDA GPUs of its
era served fp16 — README.md:159-160); this is the beyond-parity serving
mode. Accuracy evidence: tests/test_quant.py asserts block-level error
bounds and end-to-end prediction agreement on a trained model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ingest.decode import IMAGENET_MEAN, IMAGENET_STD
from .fast_infer import _fold_block
from .resnet import STAGE_SIZES
from ..ops.fused_bottleneck import fold_bn

_QMAX = 127.0


def requant_rounding_mode():
    """Serving rounding mode for activation requantization.

    'half_up' (default): q = clip(floor(y + 0.5), lo, 127). The +0.5
    folds into each requant's constant bias term, and at the lo=0
    post-relu sites the f32->s8 convert's truncation performs the floor
    — one fewer VPU op per element on the layer1/2 requant chains the
    int8 roofline pins as VPU-bound, INCLUDING the residual-tail
    requants (4x the elements of the mid-block sites), which the trunc
    probe (+4.5%) never touched (docs/PERF_NOTES.md "Int8 roofline";
    measured +12.5% end-to-end ten-crop throughput, 1524.7 -> 1714.9
    img/s/chip vs RNE). 'rne'
    restores round-to-nearest-even. The two differ only on exact .5
    f32 ties; table deltas under the serving mode are what
    tools/quant_study.py measures. Weight quantization (offline,
    `_quant_weight`) stays RNE in both modes — the weight grid and the
    QAT STE grid are unaffected. QAT's activation fake-quant
    (models/qat.py) reads this same knob so training-time grids match
    serving.
    """
    import os

    return os.environ.get("GEO_REQUANT_MODE", "half_up")


def round_like_serving(y, mode=None):
    """Round `y` exactly as the serving requant chain does under
    `mode` (default: current `requant_rounding_mode()`). Used by QAT's
    fake-quant so the training-time grid is bit-matched to serving."""
    if mode is None:
        mode = requant_rounding_mode()
    if mode == "half_up":
        return jnp.floor(y + 0.5)
    return jnp.round(y)


def weight_qmax():
    """Weight-grid ceiling: 2^(bits-1) - 1 with bits from
    GEO_WEIGHT_BITS (default 8 -> 127, the shipped serving grid).

    Sub-8-bit weights still ship as int8 carriers on the MXU — the grid
    simply uses fewer levels — so every downstream path (requant
    multipliers, scales caches, weights_hash) works unchanged; the hash
    covers the quantized bytes, so grids at different bit widths can
    never silently share a scales cache. The knob exists (a) to
    CONSTRUCT genuine weight-grid PTQ failures for the QAT escalation
    demo — at 8 bits every synthetic corpus measured rounds 3-4 has
    negligible true weight-grid error — and (b) as the int4-weights
    lever for future serving studies. QAT's weight fake-quant
    (models/qat.py) reads the same knob, so training-time and serving
    grids stay bit-matched at any width."""
    import os

    bits = int(os.environ.get("GEO_WEIGHT_BITS", "8"))
    if not 2 <= bits <= 8:
        raise ValueError(f"GEO_WEIGHT_BITS={bits} outside [2, 8]")
    return float((1 << (bits - 1)) - 1)


def _quant_weight(k):
    """Per-output-channel symmetric int8. k: (..., O) fp32 numpy.

    Returns (k_q int8, s_w fp32 (O,)). Grid ceiling: `weight_qmax()`
    (127 by default; fewer levels under GEO_WEIGHT_BITS)."""
    wq = weight_qmax()
    s = np.max(np.abs(k.reshape(-1, k.shape[-1])), axis=0) / wq
    s = np.where(s == 0, 1.0, s).astype(np.float32)
    q = np.clip(np.round(k / s), -wq, wq).astype(np.int8)
    return q, s


def _conv_s8(x, k_q, s=1, pad="VALID"):
    return jax.lax.conv_general_dilated(
        x, k_q, window_strides=(s, s), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def shift_s8(images_u8):
    """uint8 pixels -> (pixel - 128) int8. Exact; the int8 net's input."""
    return (images_u8.astype(jnp.int16) - 128).astype(jnp.int8)


def max_pool_3x3_s2(y, mode="reduce_window"):
    """3x3/stride-2 SAME max-pool, two formulations (bit-identical).

    'reduce_window': the canonical XLA op — but it is a fusion barrier
    (the stem's requant cannot fuse past it; docs/PERF_NOTES.md measured
    stem+pool at ~4.4 ms of the 43 ms int8 step). 'slices': an
    elementwise max over the 9 strided window taps of the -128-padded
    input — pure slice+max, so XLA may fuse it with the stem's requant
    producer. Hardware A/B knob: GEO_POOL_MODE."""
    if mode == "reduce_window":
        pad = jnp.asarray(-jnp.inf if jnp.issubdtype(y.dtype, jnp.floating)
                          else jnp.iinfo(y.dtype).min, y.dtype)
        return jax.lax.reduce_window(
            y, pad, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)))
    if mode != "slices":
        raise ValueError(f"unknown pool mode {mode!r}")
    b, h, w, c = y.shape
    ho, wo = (h + 1) // 2, (w + 1) // 2
    fill = (-jnp.inf if jnp.issubdtype(y.dtype, jnp.floating)
            else jnp.iinfo(y.dtype).min)
    yp = jnp.pad(y, ((0, 0), (1, 2), (1, 2), (0, 0)),
                 constant_values=fill)
    out = None
    for i in range(3):
        for j in range(3):
            tap = yp[:, i:i + 2 * ho - 1:2, j:j + 2 * wo - 1:2]
            out = tap if out is None else jnp.maximum(out, tap)
    return out


def quantize_model(variables, arch="resnet50", eps=1e-5):
    """Host-side fold + quantize. Returns the static quantized net dict
    (no activation scales yet — see `calibrate`)."""
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    bb_p, bb_s = params["backbone"], stats["backbone"]
    stage_sizes = STAGE_SIZES[arch]

    stem_k, stem_b = fold_bn(
        np.asarray(bb_p["conv1"]["kernel"], np.float32),
        np.asarray(bb_p["bn1"]["scale"], np.float32),
        np.asarray(bb_p["bn1"]["bias"], np.float32),
        np.asarray(bb_s["bn1"]["mean"], np.float32),
        np.asarray(bb_s["bn1"]["var"], np.float32),
        eps,
    )
    # Fold ImageNet normalization into the stem conv (module docs):
    #   conv(norm(u8)) == conv_w'(u8 - 128) + b''  with
    #   w'[t,c,o] = w[t,c,o] / std255_c
    #   b''[o]    = b[o] + sum_{t,c} w'[t,c,o] * (128 - mean255_c)
    mean255 = np.asarray(IMAGENET_MEAN, np.float32) * 255.0
    std255 = np.asarray(IMAGENET_STD, np.float32) * 255.0
    wp = stem_k / std255[None, None, :, None]
    bpp = stem_b + np.einsum("hwco,c->o", wp, 128.0 - mean255)
    stem_q, stem_sw = _quant_weight(wp)
    # explicit border pad value: "pixel == dataset mean", rounded
    pad_val = np.clip(np.round(mean255 - 128.0), -128, 127).astype(np.int8)

    blocks = {}
    for stage, n_blocks in enumerate(stage_sizes):
        for bidx in range(n_blocks):
            name = f"layer{stage + 1}_block{bidx}"
            fb = _fold_block(bb_p[name], bb_s[name], eps)
            qb = {}
            for cname in ("conv1", "conv2", "conv3"):
                k, b = fb[cname]
                kq, sw = _quant_weight(k)
                qb[cname] = (kq, sw, b.astype(np.float32))
            if "downsample" in fb:
                k, b = fb["downsample"]
                kq, sw = _quant_weight(k)
                qb["downsample"] = (kq, sw, b.astype(np.float32))
            blocks[name] = qb

    # Heads stay bf16: keep ONLY the head subtrees (the full fp32 param
    # tree would pin a duplicate ~100 MB backbone copy in the apply
    # closure for the life of the process).
    isn = "scene_head" in params
    heads = {
        k: params[k]
        for k in (("scene_head", "scene_geo_heads") if isn else ("heads",))
    }
    return {
        "arch": arch,
        "stage_sizes": stage_sizes,
        "stem": (stem_q, stem_sw, bpp.astype(np.float32)),
        "stem_pad_val": pad_val,
        "blocks": blocks,
        "isn": isn,
        "heads": heads,
    }


def site_names(stage_sizes):
    """Every activation-scale site the int8 net requires: stem, three
    per block, plus the standalone conv3 requant site (`_y3`) in each
    stage-entry (downsample) block. Used to validate cached scale files
    before trusting them."""
    names = ["stem"]
    for stage, n_blocks in enumerate(stage_sizes):
        for bidx in range(n_blocks):
            p = f"layer{stage + 1}_block{bidx}"
            names += [f"{p}_m1", f"{p}_m2", f"{p}_out"]
            if bidx == 0:
                names.append(f"{p}_y3")
    return names


def scales_valid(scales, arch="resnet50") -> bool:
    """True iff `scales` is a complete, sane site->scale mapping for
    `arch` (exact key set, positive finite floats)."""
    if not isinstance(scales, dict):
        return False
    expect = set(site_names(STAGE_SIZES[arch]))
    if set(scales) != expect:
        return False
    try:
        return all(np.isfinite(v) and v > 0 for v in scales.values())
    except TypeError:
        return False


def weights_hash(qnet) -> str:
    """Short stable identity of the quantized network's integer weights.

    Stored in the scales cache so a checkpoint swapped/fine-tuned in the
    same directory (or a regenerated bench model) can never silently
    reuse activation scales calibrated for DIFFERENT weights — the
    classic stale-calibration accuracy bug. Hashes the int8 weight bytes
    only (scales of the weights are derived from them; fp32 biases add
    nothing to identity)."""
    import hashlib

    h = hashlib.sha256()
    h.update(qnet["arch"].encode())
    h.update(np.ascontiguousarray(qnet["stem"][0]).tobytes())
    for name in sorted(qnet["blocks"]):
        qb = qnet["blocks"][name]
        for cname in sorted(qb):
            h.update(np.ascontiguousarray(qb[cname][0]).tobytes())
    return h.hexdigest()[:16]


def pack_scales(scales, *, weights_hash, source, n_images, stat="absmax",
                headroom=1.0, calib_fingerprint=None, **extra):
    """Wrap raw {site: scale} into the versioned on-disk format (v2).

    Provenance records HOW the scales were made — calibration source
    ('calib_dir' | 'first_batch' | 'synthetic'), the number of distinct
    images, the statistic, the headroom, optionally a fingerprint of the
    calibration file set — plus the weights hash that ties them to one
    exact set of quantized weights. Any `extra` keyword (non-None,
    JSON-serializable) is recorded verbatim — the engine uses this for
    pixel-pipeline identity (fast_decode, crop, n_crops) so a cache
    calibrated under a different decode/crop geometry is not silently
    trusted by a --calib_dir run."""
    prov = {
        "weights_hash": weights_hash,
        "source": source,
        "n_images": int(n_images),
        "stat": stat,
        "headroom": float(headroom),
    }
    if calib_fingerprint is not None:
        prov["calib_fingerprint"] = calib_fingerprint
    prov.update({k: v for k, v in extra.items() if v is not None})
    return {
        "version": 2,
        "scales": {k: float(v) for k, v in scales.items()},
        "provenance": prov,
    }


def unpack_scales(obj, arch, expect_hash=None):
    """Validate a loaded scales file; returns (scales, provenance) or
    (None, reason:str).

    Accepts only the v2 provenance format — legacy flat {site: scale}
    files (round 2) carry no weights identity and are rejected so they
    recalibrate once and upgrade. When `expect_hash` is given, a
    mismatching weights_hash rejects the file (checkpoint changed under
    the cache)."""
    if not isinstance(obj, dict):
        return None, "not a dict"
    if obj.get("version") != 2:
        return None, "legacy/unknown scales format (expected version 2)"
    scales = obj.get("scales")
    if not scales_valid(scales, arch):
        return None, f"site map invalid for arch {arch!r}"
    prov = obj.get("provenance")
    if not isinstance(prov, dict):
        return None, "missing provenance"
    if expect_hash is not None and prov.get("weights_hash") != expect_hash:
        return None, (f"weights hash mismatch (file "
                      f"{prov.get('weights_hash')!r} != model "
                      f"{expect_hash!r})")
    return scales, prov


def _stat_fn(stat):
    """Reduction recorded at each calibration site.

    'absmax' (default): exact max-of-|x| — robust on small calibration
    sets but sensitive to a single activation outlier on large ones.
    'p999' / 'p9999': approximate 99.9/99.99th percentile of |x| via a
    deterministic stride-subsample to <=2^20 elements (sorting the full
    514M-element layer1 tensor would dominate compile/runtime; the tail
    estimate from 1M samples is plenty for a scale). Percentile scales
    trade a little clipping for finer resolution — the standard PTQ
    lever when absmax shows drift on real data."""
    if stat == "absmax":
        return lambda x: jnp.max(jnp.abs(x))
    if stat in ("p999", "p9999"):
        q = 0.999 if stat == "p999" else 0.9999

        def f(x):
            flat = jnp.abs(x.reshape(-1))
            step = max(1, flat.shape[0] // (1 << 20))
            return jnp.quantile(flat[::step], q)

        return f
    raise ValueError(f"unknown calibration stat {stat!r}")


def make_calibration_fn(variables, arch="resnet50", eps=1e-5,
                        stat="absmax"):
    """Returns jittable `f(images_norm_f32) -> {site: stat(|x|)}` running
    the folded net in fp32 and recording the chosen statistic (see
    `_stat_fn`) at every requant site. Feed it
    `ingest.pipeline.eval_pipeline(..., dtype=jnp.float32)` crops;
    batch-combining semantics are documented on `calibrate`."""
    return _make_traversal_fn(variables, arch, eps, _stat_fn(stat))


def _make_traversal_fn(variables, arch, eps, record):
    """Shared fp32 folded-net traversal: `record(x)` is evaluated at
    every requant site; returns a jittable images->records fn."""
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    bb_p, bb_s = params["backbone"], stats["backbone"]
    stage_sizes = STAGE_SIZES[arch]
    stem_k, stem_b = fold_bn(
        np.asarray(bb_p["conv1"]["kernel"], np.float32),
        np.asarray(bb_p["bn1"]["scale"], np.float32),
        np.asarray(bb_p["bn1"]["bias"], np.float32),
        np.asarray(bb_s["bn1"]["mean"], np.float32),
        np.asarray(bb_s["bn1"]["var"], np.float32),
        eps,
    )
    folded = {
        name: _fold_block(bb_p[f"layer{s + 1}_block{b}"],
                          bb_s[f"layer{s + 1}_block{b}"], eps)
        for s, n in enumerate(stage_sizes)
        for b in range(n)
        for name in [f"layer{s + 1}_block{b}"]
    }

    def conv(v, k, bias, s=1, pad="VALID"):
        return jax.lax.conv_general_dilated(
            v, jnp.asarray(k, jnp.float32), window_strides=(s, s),
            padding=pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.asarray(bias, jnp.float32)

    def f(images):
        rec = {}
        x = conv(images.astype(jnp.float32), stem_k, stem_b, s=2,
                 pad=((3, 3), (3, 3)))
        x = jnp.maximum(x, 0.0)
        rec["stem"] = record(x)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)))
        for stage, n_blocks in enumerate(stage_sizes):
            for bidx in range(n_blocks):
                name = f"layer{stage + 1}_block{bidx}"
                fb = folded[name]
                stride = 2 if stage > 0 and bidx == 0 else 1
                w1, b1 = fb["conv1"]
                w2, b2 = fb["conv2"]
                w3, b3 = fb["conv3"]
                y = jnp.maximum(conv(x, w1, b1), 0.0)
                rec[f"{name}_m1"] = record(y)
                y = jnp.maximum(
                    conv(y, w2, b2, s=stride, pad=((1, 1), (1, 1))), 0.0)
                rec[f"{name}_m2"] = record(y)
                y = conv(y, w3, b3)
                if "downsample" in fb:
                    # entry blocks: conv3 requantizes standalone (site
                    # _y3) so its s32 output never hits HBM — record its
                    # pre-add symmetric range
                    rec[f"{name}_y3"] = record(y)
                    wd, bd = fb["downsample"]
                    res = conv(x, wd, bd, s=stride)
                else:
                    res = x
                x = jnp.maximum(y + res, 0.0)
                rec[f"{name}_out"] = record(x)
        return rec

    return f


def calibrate(variables, batches_u8, arch="resnet50", eps=1e-5,
              n_crops=10, crop=224, headroom=1.0, stat="absmax"):
    """Run the fp32 folded net over uint8 base-image batches and return
    `{site: scale}` activation scales (stat(|x|) / 127 * headroom).

    `batches_u8`: iterable of (B, H, W, 3) uint8 arrays (base images;
    ten-crop applied internally so scales match serving exactly).
    `stat`: 'absmax' (default) or 'p999'/'p9999' percentile clipping —
    see `_stat_fn`; `headroom`: scale multiplier (>1 trades resolution
    for clipping margin).

    Multi-batch combining: 'absmax' takes the max over batches (exact —
    max of maxes IS the global max). Percentile stats take the MEAN of
    per-batch percentile estimates: with i.i.d. calibration batches each
    batch's p999 is an unbiased-ish estimate of the population tail, and
    averaging converges to it — whereas max-of-percentiles would drift
    back toward absmax as batches accumulate, eroding exactly the
    clipping the percentile option exists for."""
    from ..ingest.pipeline import eval_pipeline

    f = jax.jit(make_calibration_fn(variables, arch, eps, stat=stat))
    acc = None
    n_batches = 0
    for u8 in batches_u8:
        crops = eval_pipeline(jnp.asarray(u8), n_crops=n_crops, crop=crop,
                              dtype=jnp.float32)
        rec = jax.device_get(f(crops))
        n_batches += 1
        if acc is None:
            acc = dict(rec)
        elif stat == "absmax":
            acc = {k: max(acc[k], rec[k]) for k in rec}
        else:
            acc = {k: acc[k] + rec[k] for k in rec}
    if acc is None:
        raise ValueError("calibrate() needs at least one batch")
    if stat != "absmax" and n_batches > 1:
        acc = {k: v / n_batches for k, v in acc.items()}
    return {k: float(v) / _QMAX * headroom if v > 0 else 1.0
            for k, v in acc.items()}


def build_int8_apply(qnet, act_scales, n_classes=None, feature_tta=None):
    """Returns `apply(images_s8) -> [per-head fp32 logits]`.

    `images_s8`: `(pixel - 128)` int8 crops, (B, 224, 224, 3) — use
    `shift_s8` / `ingest.pipeline.eval_pipeline_s8`. `qnet` from
    `quantize_model`, `act_scales` from `calibrate` (site -> fp32 scale).

    All requant multipliers are prefolded host-side; on device each conv
    is s8 x s8 -> s32 followed by one fused multiply-add-clip-round.

    feature_tta (dict {"crop": 224, "n_crops": 10|5, "level": 3|2|1} or
    None): the feature-space TTA mode — `apply` then takes the
    (B, base, base, 3) BASE image (shift_s8'd, not cropped) and runs
    stem..layer{level} ONCE on it (plus once on its mirror for
    n_crops=10), crops crop-aligned windows from that stage's feature
    map (e.g. level 3, stride 16: pixel offsets {0, 16, 32} are exactly
    feature offsets {0, 1, 2}), and runs the remaining stages + head per
    crop. At level 3 (default) ten-crop trunk work drops ~4x (2 base
    passes at 256^2 replace 10 crop passes at 224^2). APPROXIMATE by
    construction: features within a receptive field of a crop border see
    real neighboring pixels instead of the crop's padding — the exact
    ten-crop path remains the default. Level 2 crops the stride-8
    layer2 map instead, so layer3+layer4 run per crop on exact crop
    geometry and only the small-receptive-field early features carry
    border context: measurably closer to exact at a smaller speedup.
    Accuracy deltas per level are measured by tools/quant_study.py
    --feature_tta. Returned logits are (B * n_crops, C), crops
    contiguous per image, ready for `eval.infer.mean_tta_logits`.
    """
    stage_sizes = qnet["stage_sizes"]
    params = qnet["heads"]

    import os as _os_req

    # GEO_REQUANT_PROBE: hardware perf probes for the requant VPU chain
    # (docs/PERF_NOTES.md "Int8 roofline"), NEVER for serving — both are
    # numerically approximate. 'trunc' drops the round (1 of ~7 VPU
    # ops); 'bf16' runs the multiply-add in bf16 (s32->bf16 loses
    # accumulator precision). If step time tracks the removed op count,
    # layers 1-2 are VPU-bound on this chain as the roofline analysis
    # claims.
    _req_probe = _os_req.environ.get("GEO_REQUANT_PROBE", "")
    _req_mode = requant_rounding_mode()

    def requant(y32, mult, bias_over_s, lo=0.0):
        # y_q = clip(round(y32 * mult + bias_over_s), lo, 127)
        if _req_probe == "trunc":
            y = y32.astype(jnp.float32) * mult + bias_over_s
            return jnp.clip(y, lo, _QMAX).astype(jnp.int8)
        if _req_probe == "bf16":
            y = (y32.astype(jnp.bfloat16)
                 * jnp.asarray(mult, jnp.bfloat16)
                 + jnp.asarray(bias_over_s, jnp.bfloat16))
            return jnp.clip(jnp.round(y), lo, _QMAX).astype(jnp.int8)
        if _req_mode == "half_up":
            # round-half-up: +0.5 folds into the (constant) bias term,
            # so at the lo=0 post-relu sites the f32->s8 convert's
            # truncation IS the rounding — one fewer VPU op per element
            # on the chain the int8 roofline pins as VPU-bound. The
            # signed _y3 site needs an explicit floor (truncation rounds
            # toward zero, which is wrong for negatives).
            y = y32.astype(jnp.float32) * mult + (bias_over_s + 0.5)
            if lo < 0:
                return jnp.clip(jnp.floor(y), lo, _QMAX).astype(jnp.int8)
            return jnp.clip(y, lo, _QMAX).astype(jnp.int8)
        y = y32.astype(jnp.float32) * mult + bias_over_s
        return jnp.clip(jnp.round(y), lo, _QMAX).astype(jnp.int8)

    def requant_residual(out):
        # residual-add tail: clip(round(out), 0, 127); half-up's +0.5 is
        # folded into the add chain's constant by the callers below.
        if _req_mode == "half_up":
            return jnp.clip(out, 0.0, _QMAX).astype(jnp.int8)
        return jnp.clip(jnp.round(out), 0.0, _QMAX).astype(jnp.int8)

    _res_half = 0.5 if _req_mode == "half_up" else 0.0

    # --- stem (space-to-depth formulation) ---
    # The direct 7x7 s2 conv puts C=3 on lanes (125/128 wasted) and
    # measured 9.1 ms standalone at batch 640 on v5e; folding 2x2 pixel
    # blocks into channels (zero-pad taps 7x7 -> 8x8, kernel becomes
    # 4x4x12 stride 1 in block space) is bit-identical int math and
    # measured 7.3 ms. Same integer weights, same scales.
    stem_q, stem_sw, stem_b = qnet["stem"]
    s_stem = act_scales["stem"]
    stem_mult = jnp.asarray(stem_sw / s_stem, jnp.float32)
    stem_bias = jnp.asarray(stem_b / s_stem, jnp.float32)
    k8 = np.zeros((8, 8) + stem_q.shape[2:], np.int8)
    k8[:7, :7] = stem_q
    stem_k4 = jnp.asarray(
        k8.reshape(4, 2, 4, 2, *stem_q.shape[2:])
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(4, 4, 2 * 2 * stem_q.shape[2], stem_q.shape[3]))
    pad_val = jnp.asarray(qnet["stem_pad_val"])  # (3,) int8

    import os as _os

    pool_mode = _os.environ.get("GEO_POOL_MODE", "reduce_window")

    def stem_fn(x_s8):
        b, h, w, c = x_s8.shape
        if h % 2 or w % 2:
            raise ValueError(
                f"int8 stem requires even crop dims (got {h}x{w}): the "
                "space-to-depth formulation folds 2x2 pixel blocks into "
                "channels, so h+8 and w+8 must be even")
        # explicit border pad (3 px of "pixel == dataset mean"), plus 2
        # trailing zero rows/cols so block space is even — those are only
        # read by the zero-padded taps 7
        buf = jnp.broadcast_to(pad_val, (b, h + 8, w + 8, c)).astype(
            jnp.int8)
        buf = jax.lax.dynamic_update_slice(buf, x_s8, (0, 3, 3, 0))
        hb, wb = (h + 8) // 2, (w + 8) // 2
        x2 = buf.reshape(b, hb, 2, wb, 2, c).transpose(0, 1, 3, 2, 4, 5) \
            .reshape(b, hb, wb, 2 * 2 * c)
        h_out, w_out = (h - 1) // 2 + 1, (w - 1) // 2 + 1
        y = _conv_s8(x2, stem_k4)[:, :h_out, :w_out]
        y = requant(y, stem_mult, stem_bias)
        return max_pool_3x3_s2(y, mode=pool_mode)

    # --- blocks: prefold every multiplier ---
    stages = []
    for stage, n_blocks in enumerate(stage_sizes):
        blocks = []
        for bidx in range(n_blocks):
            name = f"layer{stage + 1}_block{bidx}"
            blocks.append((name, qnet["blocks"][name],
                           2 if stage > 0 and bidx == 0 else 1))
        stages.append(blocks)

    # block input scale = previous block's out scale (stem for the first)
    chain = []
    prev = "stem"
    for stage, n_blocks in enumerate(stage_sizes):
        for bidx in range(n_blocks):
            name = f"layer{stage + 1}_block{bidx}"
            chain.append((name, prev))
            prev = f"{name}_out"
    in_site = dict(chain)

    def make_block(name, qb, stride):
        s_in = act_scales[in_site[name]]
        s1 = act_scales[f"{name}_m1"]
        s2 = act_scales[f"{name}_m2"]
        s_out = act_scales[f"{name}_out"]
        k1, sw1, b1 = qb["conv1"]
        k2, sw2, b2 = qb["conv2"]
        k3, sw3, b3 = qb["conv3"]
        m1 = jnp.asarray(s_in * sw1 / s1, jnp.float32)
        a1 = jnp.asarray(b1 / s1, jnp.float32)
        m2 = jnp.asarray(s1 * sw2 / s2, jnp.float32)
        a2 = jnp.asarray(b2 / s2, jnp.float32)
        k1j, k2j, k3j = map(jnp.asarray, (k1, k2, k3))
        if "downsample" in qb:
            # Entry blocks: conv3 and the downsample conv both feed the
            # residual add; if both arrive as s32, XLA fuses the add into
            # one conv and MATERIALIZES the other's int32 output (2 GB at
            # layer1 — profiled at +3.4 ms). Requantize conv3 standalone
            # to s8 at its own symmetric site, then let the downsample
            # conv host the add+relu+requant fusion.
            s_y3 = act_scales[f"{name}_y3"]
            m3 = jnp.asarray(s2 * sw3 / s_y3, jnp.float32)
            a3 = jnp.asarray(b3 / s_y3, jnp.float32)
            g3 = jnp.asarray(s_y3 / s_out, jnp.float32)
            kd, swd, bd = qb["downsample"]
            md = jnp.asarray(s_in * swd / s_out, jnp.float32)
            ad = jnp.asarray(bd / s_out + _res_half, jnp.float32)
            kdj = jnp.asarray(kd)

            def block(x):
                y = requant(_conv_s8(x, k1j), m1, a1)
                y = requant(
                    _conv_s8(y, k2j, s=stride, pad=((1, 1), (1, 1))),
                    m2, a2)
                y3q = requant(_conv_s8(y, k3j), m3, a3, lo=-_QMAX)
                r = _conv_s8(x, kdj, s=stride).astype(jnp.float32) * md \
                    + ad
                out = y3q.astype(jnp.float32) * g3 + r
                return requant_residual(out)
        else:
            # identity blocks: conv2+conv3+add+relu+requant fuse into one
            # pass; only s8 hits HBM
            m3 = jnp.asarray(s2 * sw3 / s_out, jnp.float32)
            a3 = jnp.asarray(b3 / s_out + _res_half, jnp.float32)
            md = jnp.asarray(s_in / s_out, jnp.float32)

            def block(x):
                y = requant(_conv_s8(x, k1j), m1, a1)
                y = requant(
                    _conv_s8(y, k2j, s=stride, pad=((1, 1), (1, 1))),
                    m2, a2)
                y3 = _conv_s8(y, k3j).astype(jnp.float32) * m3 + a3
                out = y3 + x.astype(jnp.float32) * md
                return requant_residual(out)

        return block

    block_fns = [[make_block(name, qb, stride) for name, qb, stride in bl]
                 for bl in stages]

    # --- heads (bf16, identical to fast_infer) ---
    isn = qnet["isn"]
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
    last = f"layer{len(stage_sizes)}_block{stage_sizes[-1] - 1}_out"
    s_last = jnp.asarray(act_scales[last], jnp.float32)

    def head_logits(x):
        feats = jnp.mean(x.astype(jnp.float32), axis=(1, 2)) * s_last
        logits = jax.lax.dot_general(
            feats.astype(jnp.bfloat16), head_kernel,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + head_bias
        if isn:
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

    def apply(images_s8):
        x = stem_fn(images_s8)
        for blocks in block_fns:
            for blk in blocks:
                x = blk(x)
        return head_logits(x)

    if feature_tta is None:
        return apply

    ft_crop = int(feature_tta.get("crop", 224))
    ft_n = int(feature_tta.get("n_crops", 10))
    ft_level = int(feature_tta.get("level", 3))
    if ft_n not in (5, 10):
        raise ValueError("feature_tta n_crops must be 5 or 10")
    if not 1 <= ft_level <= len(block_fns) - 1:
        raise ValueError(
            f"feature_tta level must be in [1, {len(block_fns) - 1}] "
            f"(got {ft_level})")

    def apply_feature(base_s8):
        from .fast_infer import ftta_mirror_concat, ftta_windows

        b, s, s2_, _ = base_s8.shape
        if s != s2_:
            raise ValueError("feature TTA expects square base images")
        x = stem_fn(ftta_mirror_concat(base_s8, ft_n))
        for blocks in block_fns[:ft_level]:
            for blk in blocks:
                x = blk(x)
        xc = ftta_windows(x, b, s, ft_crop, ft_n, ft_level)
        for blocks in block_fns[ft_level:]:
            for blk in blocks:
                xc = blk(xc)
        return head_logits(xc)

    return apply_feature


def unify_stage_out_scales(scales, stage_sizes):
    """Set every block's `_out` scale within a stage to the stage max.

    With equal residual-chain scales, each identity block's residual
    multiplier `md = s_in / s_out` becomes exactly 1.0 — a constant XLA
    folds out of the requant chain (the HBM-bound layer1/2 tails run ~9
    VPU ops/element; docs/PERF_NOTES.md). Costs some resolution in
    blocks whose activations are smaller than the stage max; accuracy
    impact is measurable with tools/quant_study.py by transforming the
    scales it derives."""
    out = dict(scales)
    for stage, n_blocks in enumerate(stage_sizes):
        keys = [f"layer{stage + 1}_block{b}_out" for b in range(n_blocks)]
        m = max(out[k] for k in keys)
        for k in keys:
            out[k] = m
    return out


def build_int8_apply_dynamic(qnet, n_classes=None, feature_tta=None):
    """Like `build_int8_apply`, but activation scales are a CALL-TIME
    argument: returns `apply(images_s8, act_scales)` with `act_scales` a
    {site: f32 scalar} dict (jit pytree). The requant multipliers become
    a handful of on-device scalar ops — negligible next to the convs —
    and ONE compiled graph serves every calibration setting. This is what
    lets the quantization study sweep stat x headroom without paying a
    multi-minute XLA compile per configuration (and lets a server
    hot-swap scales without recompiling)."""

    def apply(images_s8, act_scales):
        scales = {k: jnp.asarray(v, jnp.float32)
                  for k, v in act_scales.items()}
        return build_int8_apply(qnet, scales, n_classes=n_classes,
                                feature_tta=feature_tta)(images_s8)

    return apply


def make_sampling_calibration_fn(variables, arch="resnet50", eps=1e-5,
                                 n_cap=1 << 17):
    """Jittable `f(images_norm_f32) -> {site: (absmax, sample_vec)}`:
    one fp32 calibration pass records BOTH the exact absmax and a
    deterministic stride-subsample of |x| (<= n_cap elements) at every
    requant site. Host code then derives absmax/p999/p9999 scales at any
    headroom from the SAME records (`derive_scales`) — one compile for
    the whole statistic sweep, vs one per stat with `calibrate`."""

    def record(x):
        flat = jnp.abs(x.reshape(-1))
        step = max(1, flat.shape[0] // n_cap)
        return (jnp.max(flat), flat[::step])

    return _make_traversal_fn(variables, arch, eps, record)


def calibrate_samples(variables, batches_u8, arch="resnet50", eps=1e-5,
                      n_crops=10, crop=224, n_cap=1 << 17,
                      pool_cap=1 << 20):
    """Run the sampling calibration over uint8 base-image batches.

    Returns `{site: (absmax float, pooled |x| sample np.ndarray)}`.
    Per-site pools are capped at `pool_cap` elements by stride-halving
    (deterministic), so memory stays bounded for any calibration-set
    size while percentiles remain estimates of the GLOBAL distribution
    across all batches."""
    from ..ingest.pipeline import eval_pipeline

    f = jax.jit(make_sampling_calibration_fn(variables, arch, eps,
                                             n_cap=n_cap))
    amax: dict = {}
    pools: dict = {}
    for u8 in batches_u8:
        crops = eval_pipeline(jnp.asarray(u8), n_crops=n_crops, crop=crop,
                              dtype=jnp.float32)
        rec = jax.device_get(f(crops))
        for k, (m, vec) in rec.items():
            amax[k] = max(amax.get(k, 0.0), float(m))
            pool = np.concatenate([pools[k], vec]) if k in pools else vec
            while pool.size > pool_cap:
                pool = pool[::2]
            pools[k] = pool
    if not amax:
        raise ValueError("calibrate_samples() needs at least one batch")
    return {k: (amax[k], pools[k]) for k in amax}


def derive_scales(samples, stat="absmax", headroom=1.0):
    """{site: (absmax, pooled sample)} -> {site: scale} for one
    (stat, headroom) setting. 'absmax' uses the exact recorded max;
    percentiles come from the pooled cross-batch sample."""
    if stat == "absmax":
        vals = {k: m for k, (m, _) in samples.items()}
    elif stat in ("p999", "p9999"):
        q = 0.999 if stat == "p999" else 0.9999
        vals = {k: float(np.quantile(pool, q)) if pool.size else 0.0
                for k, (_, pool) in samples.items()}
    else:
        raise ValueError(f"unknown calibration stat {stat!r}")
    return {k: v / _QMAX * headroom if v > 0 else 1.0
            for k, v in vals.items()}


AUTO_CANDIDATE_STATS = ("absmax", "p999", "p9999")


def autoselect_scales(variables, batches_u8, qnet=None, *, arch="resnet50",
                      n_classes=None, n_crops=10, crop=224, headroom=1.0,
                      candidates=AUTO_CANDIDATE_STATS, samples=None,
                      eps=1e-5):
    """Pick the calibration stat whose int8 forward best matches the
    fp32 forward on the calibration images themselves.

    No fixed stat is safe across corpora: the round-3/4 studies
    (docs/QUANTIZATION.md) measured the stat ranking INVERTING between
    fixed-geometry and mixed-geometry worlds (absmax passes both
    textured studies but fails the realistic corpus at 1.2 pt, where
    only p999 passes). `--calib_stat auto` therefore scores each
    candidate grid point at calibration time and ships the winner,
    instead of shipping any fixed default the builder's own studies
    reject somewhere.

    Scoring = summed per-head KL(fp32 teacher ‖ int8 student) on the
    calibration crops — the exact parity proxy QAT snapshot retention
    uses (models/qat.py teacher_student_kl), so the selection metric
    and the escalation tool's verdict metric cannot diverge.

    Cost: ONE fp32 sampling pass supplies every candidate's scales
    (calibrate_samples/derive_scales, reused via `samples` when the
    caller already has them); ONE dynamic-scales int8 graph scores all
    of them (build_int8_apply_dynamic). Two extra compiles total over a
    fixed stat (the fp32 teacher + the dynamic student), both at
    calibration-batch shape.

    Returns (scales, picked_stat, {stat: mean_kl}).
    """
    # function-level import: qat imports quant (round_like_serving), so a
    # module-level import here would be circular
    from .qat import build_qat_apply, fold_variables, teacher_student_kl
    from ..ingest.pipeline import eval_pipeline_s8

    if qnet is None:
        qnet = quantize_model(variables, arch=arch, eps=eps)
    batches = [np.asarray(b) for b in batches_u8]
    if samples is None:
        samples = calibrate_samples(variables, batches, arch=arch, eps=eps,
                                    n_crops=n_crops, crop=crop)
    cand_scales = {s: derive_scales(samples, s, headroom)
                   for s in candidates}

    folded = fold_variables(variables, arch=arch, eps=eps)
    teacher = jax.jit(build_qat_apply(
        arch, cand_scales[candidates[0]],  # scales unused w/o fake_quant
        n_classes=n_classes, fake_quant=False))
    student = jax.jit(build_int8_apply_dynamic(qnet, n_classes=n_classes))
    kl_fn = jax.jit(teacher_student_kl)
    dev_scales = {s: jax.device_put(
        {k: np.float32(v) for k, v in cand_scales[s].items()})
        for s in candidates}

    kl_sum = {s: 0.0 for s in candidates}
    n_total = 0
    for u8 in batches:
        x_s8 = eval_pipeline_s8(jnp.asarray(u8), n_crops=n_crops, crop=crop)
        t_logits = [jax.lax.stop_gradient(t)
                    for t in teacher(folded, x_s8.astype(jnp.float32))]
        w = int(u8.shape[0])
        n_total += w
        for s in candidates:
            kl_sum[s] += w * float(kl_fn(t_logits,
                                         student(x_s8, dev_scales[s])))
    if n_total == 0:
        raise ValueError("autoselect_scales() needs at least one image")
    kls = {s: kl_sum[s] / n_total for s in candidates}
    # deterministic: first candidate wins exact ties
    picked = min(candidates, key=lambda s: (kls[s], candidates.index(s)))
    return cand_scales[picked], picked, kls


def build_int8_pipeline(variables, calib_batches_u8, arch="resnet50",
                        n_classes=None, eps=1e-5, n_crops=10, crop=224,
                        stat="absmax"):
    """One-call serving build: calibrate + quantize + return
    `apply(images_u8_base) -> [per-head logits]` (ten-crop applied
    inside on int8 data — half the ingest traffic of the bf16 path)."""
    from ..ingest.pipeline import eval_pipeline_s8

    scales = calibrate(variables, calib_batches_u8, arch=arch, eps=eps,
                       n_crops=n_crops, crop=crop, stat=stat)
    qnet = quantize_model(variables, arch=arch, eps=eps)
    int8_apply = build_int8_apply(qnet, scales, n_classes=n_classes)

    def apply(images_u8):
        crops = eval_pipeline_s8(images_u8, n_crops=n_crops, crop=crop)
        return int8_apply(crops)

    apply.scales = scales
    return apply
