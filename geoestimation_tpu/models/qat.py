"""Quantization-aware training (QAT) for the int8 serving path.

PTQ (models/quant.py) is the default: the round-3 study
(docs/QUANTIZATION.md) measured it inside the 0.5-pt GCD parity budget
on every calibration setting tested. QAT is the escalation path when a
real-data checkpoint ever drifts past that budget: fine-tune the
network THROUGH the serving quantizer so the weights move to int8-robust
minima, then export a standard checkpoint any existing CLI consumes.

TPU-native scheme (all jittable, no data-dependent control flow):

  * Operates on the **BN-folded** network — the exact graph the int8
    serving path quantizes (fold first, then quantize, matching
    `quantize_model`). BN is frozen by construction: deploy-time QAT
    fine-tunes a converged checkpoint, where folding is exact.
  * The stem carries the ImageNet-normalization fold and consumes
    (pixel - 128) inputs, so the fake-quant grid matches the serving
    stem's integer grid bit for bit.
  * Weights: per-output-channel symmetric fake-quant with the
    straight-through estimator (STE) — identical grid to
    `quant._quant_weight` (scale = absmax/127, recomputed from the
    live weights each step under `stop_gradient`).
  * Activations: per-tensor fake-quant at EXACTLY the serving requant
    sites (`quant.site_names`): stem, per-block m1/m2/out, and the
    standalone conv3 site (`_y3`) in stage-entry blocks. Scales are the
    calibrated serving scales, static during QAT (the standard
    calibrate-then-QAT recipe). Clipped activations get zero gradient
    (the [lo, 127] pass-through mask), un-clipped ones gradient 1.
  * Export: `unfold_to_variables` writes the fine-tuned folded weights
    back into a standard checkpoint with IDENTITY BatchNorms
    (scale=1, mean=0, var=1-eps, bias=folded bias), so
    `quantize_model` / the bf16 path / the CLIs all consume the result
    with zero new surface area. Refolding an identity BN reproduces the
    trained weights exactly (g = 1/sqrt((1-eps)+eps) = 1).

Parity note: the reference has no quantization at all (fp32/fp16 eval
only — reference README.md:159-160); QAT is part of the beyond-parity
int8 serving subsystem. Use via tools/qat_finetune.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ingest.decode import IMAGENET_MEAN, IMAGENET_STD
from .fast_infer import _fold_block
from .resnet import STAGE_SIZES
from ..ops.fused_bottleneck import fold_bn
from .quant import _QMAX

# ---------------------------------------------------------------------------
# fake-quant primitives (STE)
# ---------------------------------------------------------------------------


def fake_quant_weight(k):
    """Per-output-channel symmetric int8 fake-quant, STE gradient.

    Matches `quant._quant_weight`'s grid exactly: scale is
    absmax/weight_qmax() over all but the last (output-channel) axis,
    zero channels get scale 1 (weight_qmax() = 127 by default; fewer
    levels under GEO_WEIGHT_BITS — the same knob serving reads, so the
    QAT grid is bit-matched at any width). The scale is a function of
    the live weights but is excluded from the gradient
    (`stop_gradient`) — the standard QAT formulation; gradients flow
    straight through the round."""
    from .quant import weight_qmax

    wq = weight_qmax()
    s = jax.lax.stop_gradient(
        jnp.max(jnp.abs(k.reshape(-1, k.shape[-1])), axis=0) / wq)
    s = jnp.where(s == 0, 1.0, s)
    q = jnp.clip(jnp.round(k / s), -wq, wq) * s
    return k + jax.lax.stop_gradient(q - k)


def fake_quant_act(x, scale, lo=0.0, upper_ste=False):
    """Per-tensor fake-quant at a serving requant site, STE gradient.

    Simulates `quant.build_int8_apply`'s requant in the dequantized
    domain: q = clip(round(x/s), lo, 127) * s, with the rounding
    function bit-matched to the serving mode
    (`quant.requant_rounding_mode`: half-up by default, RNE under
    GEO_REQUANT_MODE=rne). `lo=0` sites fold the relu into the clip
    exactly as serving does; the `_y3` site uses lo=-127
    (pre-residual, signed).

    Gradient: 1 inside the pass-through region, 0 below `lo` at the
    relu (lo=0) sites — that side is a real relu. The UPPER clip's
    gradient is the `upper_ste` knob. The masked default (0 above
    127*s) is the textbook rule, but it is a one-way RATCHET: an
    activation pushed past the ceiling by updates elsewhere can never
    receive a gradient pulling it back. Measured on the realistic
    world (docs/QUANTIZATION.md round-4): 400 masked-STE steps drove
    34% of fp32 activation mass above the ceiling (0% before QAT) and
    broke the exported checkpoint's fp32 path. `upper_ste=True` passes
    gradient 1 through the upper clip (and through both clips at the
    signed `_y3` site, where the lower bound is also quantizer-imposed,
    not a relu) so saturation stays loss-coupled."""
    from .quant import round_like_serving

    y = x / scale
    q = jnp.clip(round_like_serving(y), lo, _QMAX) * scale
    if upper_ste:
        mask = (y >= lo) if lo == 0.0 else jnp.full(y.shape, True)
    else:
        mask = (y >= lo) & (y <= _QMAX)
    return jnp.where(mask, x + jax.lax.stop_gradient(q - x),
                     jax.lax.stop_gradient(q))


def teacher_student_kl(t_logits, s_logits):
    """Sum over heads of batch-mean KL(teacher ‖ student).

    THE parity quantity of the QAT subsystem — the anchor term in
    `make_qat_train_step`, the snapshot-retention proxy in
    tools/qat_finetune.py, and the tests all call this one function so
    the training objective and the retention decision cannot silently
    diverge (reduction, temperature, ...)."""
    kl = 0.0
    for t, s in zip(t_logits, s_logits):
        p = jax.nn.softmax(t, axis=-1)
        kl += jnp.mean(jnp.sum(
            p * (jax.nn.log_softmax(t, axis=-1)
                 - jax.nn.log_softmax(s, axis=-1)), axis=-1))
    return kl


# ---------------------------------------------------------------------------
# fold / unfold
# ---------------------------------------------------------------------------


def fold_variables(variables, arch="resnet50", eps=1e-5):
    """Checkpoint variables -> trainable folded pytree.

    Mirrors the host-side folding in `quant.quantize_model` (BN into
    convs; ImageNet normalization into the stem) but keeps fp32 floats:
    this pytree IS what QAT optimizes. Structure:

      {"stem": {"kernel", "bias"},              # normalization folded in
       "blocks": {name: {"conv1"|"conv2"|"conv3"|"downsample":
                         {"kernel", "bias"}}},
       "heads": <params["heads"] subtree, trained jointly>}

    ISN checkpoints (models/isn.py) fold the same way; "heads" then
    holds {"scene_head", "scene_geo_heads"}. The scene gate is FROZEN
    during QAT (the argmax route passes no gradient, and the loss has
    no scene term, so the scene head's gradient is structurally zero —
    `build_qat_apply` additionally stop-gradients it, and the training
    step leaves it bit-identical); only the trunk and the per-scene geo
    heads move to int8-robust minima.
    """
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
    mean255 = np.asarray(IMAGENET_MEAN, np.float32) * 255.0
    std255 = np.asarray(IMAGENET_STD, np.float32) * 255.0
    wp = stem_k / std255[None, None, :, None]
    bpp = stem_b + np.einsum("hwco,c->o", wp, 128.0 - mean255)

    blocks = {}
    for stage, n_blocks in enumerate(stage_sizes):
        for bidx in range(n_blocks):
            name = f"layer{stage + 1}_block{bidx}"
            fb = _fold_block(bb_p[name], bb_s[name], eps)
            blocks[name] = {
                cname: {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}
                for cname, (k, b) in fb.items()
            }
    if "scene_head" in params:
        heads = jax.tree.map(jnp.asarray, {
            "scene_head": params["scene_head"],
            "scene_geo_heads": params["scene_geo_heads"],
        })
    else:
        heads = jax.tree.map(jnp.asarray, params["heads"])
    return {
        "stem": {"kernel": jnp.asarray(wp), "bias": jnp.asarray(bpp)},
        "blocks": blocks,
        "heads": heads,
    }


def unfold_to_variables(folded, variables, arch="resnet50", eps=1e-5):
    """Folded pytree -> standard checkpoint variables (identity BNs).

    Every conv kernel takes the fine-tuned folded value; every BN
    becomes the exact identity under refolding (scale=1, mean=0,
    var=1-eps, bias=folded bias): g = scale/sqrt(var+eps) = 1, so
    `quantize_model`/`fast_infer` on the result reproduce the trained
    folded weights. The stem's ImageNet fold is inverted (kernel *
    std255, bias shift removed) because the bf16 path normalizes in
    ingest. `variables` supplies the structure/dtype template."""
    params = jax.tree.map(np.asarray, jax.device_get(variables["params"]))
    stats = jax.tree.map(np.asarray,
                         jax.device_get(variables["batch_stats"]))
    folded = jax.device_get(folded)
    stage_sizes = STAGE_SIZES[arch]
    bb_p, bb_s = params["backbone"], stats["backbone"]

    def identity_bn(p_bn, s_bn, bias):
        c = p_bn["scale"].shape[0]
        p_bn["scale"] = np.ones(c, np.float32)
        p_bn["bias"] = np.asarray(bias, np.float32)
        s_bn["mean"] = np.zeros(c, np.float32)
        s_bn["var"] = np.full(c, 1.0 - eps, np.float32)

    mean255 = np.asarray(IMAGENET_MEAN, np.float32) * 255.0
    std255 = np.asarray(IMAGENET_STD, np.float32) * 255.0
    wp = np.asarray(folded["stem"]["kernel"], np.float32)
    bpp = np.asarray(folded["stem"]["bias"], np.float32)
    stem_k = wp * std255[None, None, :, None]
    stem_b = bpp - np.einsum("hwco,c->o", wp, 128.0 - mean255)
    bb_p["conv1"]["kernel"] = stem_k
    identity_bn(bb_p["bn1"], bb_s["bn1"], stem_b)

    for stage, n_blocks in enumerate(stage_sizes):
        for bidx in range(n_blocks):
            name = f"layer{stage + 1}_block{bidx}"
            fb = folded["blocks"][name]
            for cname, bn in (("conv1", "bn1"), ("conv2", "bn2"),
                              ("conv3", "bn3")):
                bb_p[name][cname]["kernel"] = np.asarray(
                    fb[cname]["kernel"], np.float32)
                identity_bn(bb_p[name][bn], bb_s[name][bn],
                            fb[cname]["bias"])
            if "downsample" in fb:
                bb_p[name]["downsample_conv"]["kernel"] = np.asarray(
                    fb["downsample"]["kernel"], np.float32)
                identity_bn(bb_p[name]["downsample_bn"],
                            bb_s[name]["downsample_bn"],
                            fb["downsample"]["bias"])
    if "scene_geo_heads" in folded["heads"]:
        params["scene_head"] = jax.tree.map(
            np.asarray, folded["heads"]["scene_head"])
        params["scene_geo_heads"] = jax.tree.map(
            np.asarray, folded["heads"]["scene_geo_heads"])
    else:
        params["heads"] = jax.tree.map(np.asarray, folded["heads"])
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# the QAT forward
# ---------------------------------------------------------------------------


def build_qat_apply(arch, act_scales, n_classes=None, fake_quant=True,
                    taps=False, upper_ste=False):
    """Returns `apply(folded, x) -> [per-head fp32 logits]`.

    `x`: (B, H, W, 3) float32 in the (pixel - 128) domain — integer
    pixel values, exactly the int8 serving input (`quant.shift_s8`
    cast to f32). The forward simulates `quant.build_int8_apply`
    value-for-value in fp32: same explicit stem border pad ("pixel ==
    dataset mean"), same fake-quant grid per weight, same requant-site
    placement (m1/m2/out + entry-block `_y3`), same clip bounds. Heads
    run un-quantized fp32 (serving keeps them bf16). Differentiable
    end to end via the STE primitives above.

    `fake_quant=False` builds the same graph WITHOUT the quantizer
    (plain weights, relu instead of the clipped grid): the exact folded
    fp32 forward of the original network, used as the frozen TEACHER
    for the anchored QAT loss (`make_qat_train_step(anchor_weight=)`)
    and by the saturation probe.

    `taps=True` makes apply return `(logits, sat)` where `sat` maps
    each activation site to the fraction of values ABOVE the site's
    clip ceiling (y/scale > 127) — the clip-saturation diagnostic. With
    `fake_quant=False` it measures what the fp32 forward WOULD clip,
    i.e. how far the weights have ratcheted into the quantizer's
    saturated region where the STE mask passes no recovery gradient."""
    stage_sizes = STAGE_SIZES[arch]
    mean255 = np.asarray(IMAGENET_MEAN, np.float32) * 255.0
    if fake_quant:
        pad_val = jnp.asarray(
            np.clip(np.round(mean255 - 128.0), -128, 127), jnp.float32)
    else:
        # teacher mode pads with the exact (unquantized) dataset mean —
        # the original model's zero in the normalized domain
        pad_val = jnp.asarray(mean255 - 128.0, jnp.float32)
    scales = {k: jnp.float32(v) for k, v in act_scales.items()}
    fq_w = fake_quant_weight if fake_quant else (lambda k: k)

    def conv(v, k, s=1, pad="VALID"):
        return jax.lax.conv_general_dilated(
            v, k, window_strides=(s, s), padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def apply(folded, x):
        sat = {}

        def act(v, site, lo=0.0):
            if taps:
                sat[site] = jnp.mean(
                    (v / scales[site] > _QMAX).astype(jnp.float32))
            if fake_quant:
                return fake_quant_act(v, scales[site], lo=lo,
                                      upper_ste=upper_ste)
            # teacher: the original nonlinearity at this site — relu at
            # the lo=0 (post-relu) sites, identity at the signed _y3
            return jnp.maximum(v, 0.0) if lo == 0.0 else v

        # --- stem: explicit per-channel border pad, 7x7 s2, relu via
        # the lo=0 fake-quant clip, s8-domain max-pool ---
        xp = jnp.pad(x - pad_val, ((0, 0), (3, 3), (3, 3), (0, 0))) \
            + pad_val
        y = conv(xp, fq_w(folded["stem"]["kernel"]), s=2) \
            + folded["stem"]["bias"]
        y = act(y, "stem", lo=0.0)
        # 3x3/s2 SAME max-pool, same values as quant.max_pool_3x3_s2 on
        # f32. The init value MUST be a python literal: an array init
        # demotes XLA's reduce_window_max (which has an autodiff rule)
        # to the generic reduce_window primitive, which fails
        # reverse-mode AD under jit.
        y = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)))

        for stage, n_blocks in enumerate(stage_sizes):
            for bidx in range(n_blocks):
                name = f"layer{stage + 1}_block{bidx}"
                fb = folded["blocks"][name]
                stride = 2 if stage > 0 and bidx == 0 else 1
                h = act(conv(y, fq_w(fb["conv1"]["kernel"]))
                        + fb["conv1"]["bias"], f"{name}_m1", lo=0.0)
                h = act(conv(h, fq_w(fb["conv2"]["kernel"]),
                             s=stride, pad=((1, 1), (1, 1)))
                        + fb["conv2"]["bias"], f"{name}_m2", lo=0.0)
                h3 = conv(h, fq_w(fb["conv3"]["kernel"])) \
                    + fb["conv3"]["bias"]
                if "downsample" in fb:
                    # entry block: conv3 requants standalone (signed)
                    h3 = act(h3, f"{name}_y3", lo=-_QMAX)
                    res = conv(
                        y, fq_w(fb["downsample"]["kernel"]),
                        s=stride) + fb["downsample"]["bias"]
                else:
                    res = y
                y = act(h3 + res, f"{name}_out", lo=0.0)

        feats = jnp.mean(y, axis=(1, 2))
        heads = folded["heads"]
        if "scene_geo_heads" in heads:
            # ISN: FROZEN scene gate — the argmax route passes no
            # gradient and the scene head itself is stop-gradiented, so
            # QAT moves only the trunk + per-scene geo heads; routing
            # matches quant.build_int8_apply's serving behavior
            # (predicted scene, hard one-hot select).
            sk = jax.lax.stop_gradient(heads["scene_head"]["kernel"])
            sb = jax.lax.stop_gradient(heads["scene_head"]["bias"])
            scene_logits = feats @ sk + sb
            n_scenes = sk.shape[-1]
            gate = jax.nn.one_hot(jnp.argmax(scene_logits, -1), n_scenes,
                                  dtype=jnp.float32)
            flat = feats @ heads["scene_geo_heads"]["kernel"] \
                + heads["scene_geo_heads"]["bias"]
            per_scene = flat.reshape(flat.shape[0], n_scenes, -1)
            logits = jnp.einsum("bsc,bs->bc", per_scene, gate)
        else:
            hk = heads["fused_head"]["kernel"]
            hb = heads["fused_head"]["bias"]
            logits = feats @ hk + hb
        if n_classes is None:
            return (logits, sat) if taps else logits
        out, start = [], 0
        for n in n_classes:
            out.append(logits[:, start:start + n])
            start += n
        return (out, sat) if taps else out

    return apply


# ---------------------------------------------------------------------------
# training step
# ---------------------------------------------------------------------------


def make_qat_train_step(apply_fn, tx, crop=224, label_smoothing=0.0,
                        crop_scale=None, anchor_weight=0.0,
                        teacher_apply=None, teacher_folded=None):
    """Returns jittable
    `step(folded, opt_state, images_u8, labels, rng, step_no)
       -> (folded, opt_state, metrics)`.

    Augmentation matches the recipe the checkpoint was TRAINED with —
    pass the checkpoint's `train_params.train_crop_scale` as
    `crop_scale` to get the same RandomResizedCrop-style view
    distribution (None = plain random crop). Fine-tuning through a
    different view distribution than training shifts the BN-folded
    feature statistics and inflates the starting loss before QAT has
    done anything. Augmented pixels then shift to the (pixel - 128)
    domain the QAT forward consumes. Loss is the reference's summed
    multi-head CE.

    `anchor_weight > 0` adds per-head
    `KL(teacher || student)` against the FROZEN original network
    (`teacher_apply` = `build_qat_apply(..., fake_quant=False)`,
    `teacher_folded` = the pre-QAT folded weights, captured under
    stop_gradient). The anchor is the same load-bearing term
    tools/tta_distill.py needed (docs/QUANTIZATION.md): CE on train
    labels alone lets a few hundred fine-tune steps drift the
    checkpoint's held-out predictions past the cross-checkpoint parity
    budget — the anchor directly optimizes the contract quant_study
    measures (int8 vs the ORIGINAL's fp32 tables)."""
    from ..ingest.pipeline import random_crop_flip, random_resized_crop_flip
    from .classifier import multi_head_cross_entropy

    if anchor_weight and (teacher_apply is None or teacher_folded is None):
        raise ValueError("anchor_weight > 0 needs teacher_apply and "
                         "teacher_folded")

    def step(folded, opt_state, images_u8, labels, rng, step_no):
        step_rng = jax.random.fold_in(rng, step_no)
        if crop_scale is not None and tuple(crop_scale) != (1.0, 1.0):
            x = random_resized_crop_flip(step_rng, images_u8, crop=crop,
                                         scale=tuple(crop_scale))
        else:
            x = random_crop_flip(step_rng, images_u8, crop=crop)
        x = x.astype(jnp.float32) - 128.0

        if anchor_weight:
            t_logits = [jax.lax.stop_gradient(t)
                        for t in teacher_apply(teacher_folded, x)]

        def loss_fn(f):
            logits = apply_fn(f, x)
            total, per_head = multi_head_cross_entropy(
                logits, labels, label_smoothing=label_smoothing)
            anchor = 0.0
            if anchor_weight:
                anchor = teacher_student_kl(t_logits, logits)
                total = total + anchor_weight * anchor
            return total, (per_head, anchor)

        (loss, (per_head, anchor)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(folded)
        updates, opt_state = tx.update(grads, opt_state, folded)
        folded = jax.tree.map(lambda p, u: p + u, folded, updates)
        metrics = {"loss": loss,
                   **{f"loss_head{i}": l
                      for i, l in enumerate(per_head)}}
        if anchor_weight:
            metrics["anchor_kl"] = anchor
        return folded, opt_state, metrics

    return step


def quantize_folded(folded, arch="resnet50"):
    """Folded pytree -> the `quantize_model` qnet dict (int8 weights).

    The direct export path for a QAT result (the indirect path —
    `unfold_to_variables` then `quantize_model` — produces the same
    integers; tests pin the equivalence). Shares `quant._quant_weight`
    so the grids cannot diverge."""
    from .quant import _quant_weight

    folded = jax.device_get(folded)
    stage_sizes = STAGE_SIZES[arch]
    mean255 = np.asarray(IMAGENET_MEAN, np.float32) * 255.0
    pad_val = np.clip(np.round(mean255 - 128.0), -128, 127).astype(np.int8)
    stem_q, stem_sw = _quant_weight(
        np.asarray(folded["stem"]["kernel"], np.float32))
    blocks = {}
    for stage, n_blocks in enumerate(stage_sizes):
        for bidx in range(n_blocks):
            name = f"layer{stage + 1}_block{bidx}"
            fb = folded["blocks"][name]
            qb = {}
            for cname in fb:
                kq, sw = _quant_weight(
                    np.asarray(fb[cname]["kernel"], np.float32))
                qb[cname] = (kq, sw,
                             np.asarray(fb[cname]["bias"], np.float32))
            blocks[name] = qb
    isn = "scene_geo_heads" in folded["heads"]
    heads = (jax.tree.map(np.asarray, folded["heads"]) if isn
             else {"heads": jax.tree.map(np.asarray, folded["heads"])})
    return {
        "arch": arch,
        "stage_sizes": stage_sizes,
        "stem": (stem_q, stem_sw,
                 np.asarray(folded["stem"]["bias"], np.float32)),
        "stem_pad_val": pad_val,
        "blocks": blocks,
        "isn": isn,
        "heads": heads,
    }
