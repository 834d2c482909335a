"""Feature-TTA self-distillation: make the fast TTA mode budget-safe.

Feature-space ten-crop TTA (`fast_infer.build_feature_tta_apply`, int8
twin in models/quant.py) runs the trunk once per base image instead of
once per crop — measured 4115 img/s/chip int8 on v5e vs 1523 exact
(docs/PERF_NOTES.md) — but is APPROXIMATE at crop borders: trunk
features see real neighbor pixels where the exact path sees crop
padding. The measured accuracy delta is checkpoint-dependent (0.4-1.0
pt, docs/QUANTIZATION.md), which keeps the mode opt-in.

This module closes that gap the same way models/qat.py closes the int8
gap: **fine-tune the checkpoint so the approximate forward matches the
exact forward** — self-distillation, no labels needed. The student is
the feature-TTA forward; the teacher is the exact ten-crop forward of
the FROZEN initial weights; the loss is the per-head KL divergence of
the TTA-folded probabilities (the exact quantity the f* rule consumes).
Export is a standard identity-BN checkpoint (`qat.unfold_to_variables`)
that every CLI consumes unchanged; deploy it for `--feature_tta`
serving while parity continues to be measured against the ORIGINAL
checkpoint's exact tables (tools/quant_study.py --ref_checkpoint).

Both forwards here are differentiable re-implementations over the
folded pytree of models/qat.py (`fold_variables`), in the same
(pixel - 128) input domain with the same explicit paddings as the
serving paths; `build_exact_tta_apply` is pinned against the flax model
and the two applies are pinned against EACH OTHER at base == crop size
(where feature-TTA is exact by construction) in tests/test_tta_distill.py.

Reference context: the reference has no TTA acceleration at all (its
eval ran every crop through the full network, SURVEY.md §4.2-4.3);
feature-TTA + distillation is a beyond-parity TPU serving optimization.
Use via tools/tta_distill.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ingest.decode import IMAGENET_MEAN
from ..ingest.pipeline import make_crops
from .resnet import STAGE_SIZES


def _conv(v, k, s=1, pad="VALID"):
    return jax.lax.conv_general_dilated(
        v, k, window_strides=(s, s), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _stem_pad_val():
    # border pixels == dataset mean, exactly like the serving paths
    # (quant.build_int8_apply stem_pad_val; zero in normalized domain)
    mean255 = np.asarray(IMAGENET_MEAN, np.float32) * 255.0
    return jnp.asarray(np.clip(np.round(mean255 - 128.0), -128, 127),
                       jnp.float32)


def folded_stem(folded, x):
    """(B, S, S, 3) f32 in the (pixel - 128) domain -> pooled stem out."""
    pad_val = _stem_pad_val()
    xp = jnp.pad(x - pad_val, ((0, 0), (3, 3), (3, 3), (0, 0))) + pad_val
    y = _conv(xp, folded["stem"]["kernel"], s=2) + folded["stem"]["bias"]
    y = jnp.maximum(y, 0.0)
    # literal init value keeps reduce_window on the AD-capable max variant
    # (see models/qat.py note)
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))


def folded_stage(folded, y, stage, n_blocks):
    """One ResNet stage (torchvision layout) over the folded pytree."""
    for bidx in range(n_blocks):
        name = f"layer{stage + 1}_block{bidx}"
        fb = folded["blocks"][name]
        stride = 2 if stage > 0 and bidx == 0 else 1
        h = jnp.maximum(
            _conv(y, fb["conv1"]["kernel"]) + fb["conv1"]["bias"], 0.0)
        h = jnp.maximum(
            _conv(h, fb["conv2"]["kernel"], s=stride, pad=((1, 1), (1, 1)))
            + fb["conv2"]["bias"], 0.0)
        h3 = _conv(h, fb["conv3"]["kernel"]) + fb["conv3"]["bias"]
        if "downsample" in fb:
            res = _conv(y, fb["downsample"]["kernel"], s=stride) \
                + fb["downsample"]["bias"]
        else:
            res = y
        y = jnp.maximum(h3 + res, 0.0)
    return y


def folded_head(folded, y, n_classes):
    feats = jnp.mean(y, axis=(1, 2))
    logits = feats @ folded["heads"]["fused_head"]["kernel"] \
        + folded["heads"]["fused_head"]["bias"]
    if n_classes is None:
        return logits
    out, start = [], 0
    for n in n_classes:
        out.append(logits[:, start:start + n])
        start += n
    return out


def build_exact_tta_apply(arch, n_classes, crop=224, n_crops=10):
    """`apply(folded, base_m128) -> [per-head logits (B*n_crops, C_p)]`.

    The exact path: pixel-level crops of the (B, S, S, 3) base (same
    geometry as ingest.pipeline.make_crops), full network per crop."""
    stage_sizes = STAGE_SIZES[arch]

    def apply(folded, base_m128):
        crops = make_crops(base_m128, n_crops, crop)
        x = crops.reshape((-1,) + crops.shape[-3:])
        y = folded_stem(folded, x)
        for stage, nb in enumerate(stage_sizes):
            y = folded_stage(folded, y, stage, nb)
        return folded_head(folded, y, n_classes)

    return apply


def build_ftta_apply(arch, n_classes, level=3, crop=224, n_crops=10):
    """`apply(folded, base_m128) -> [per-head logits (B*n_crops, C_p)]`.

    The feature-TTA student: trunk (stem + stages 1..level) runs once on
    the base (+ its W-mirror for n_crops=10); crop-aligned windows are
    taken from the level's feature map; the remaining stages + head run
    per window. Same geometry as fast_infer.build_feature_tta_apply;
    within-image crop order is a fixed permutation of the exact path's
    (identical when base == crop), which the TTA fold is invariant to."""
    stage_sizes = STAGE_SIZES[arch]
    if n_crops not in (5, 10):
        raise ValueError("feature TTA n_crops must be 5 or 10")
    if not 1 <= level <= len(stage_sizes) - 1:
        raise ValueError(f"level must be in [1, {len(stage_sizes) - 1}]")

    def apply(folded, base_m128):
        from .fast_infer import ftta_mirror_concat, ftta_windows

        b, s, s2_, _ = base_m128.shape
        if s != s2_:
            raise ValueError("feature TTA expects square base images")
        y = folded_stem(folded, ftta_mirror_concat(base_m128, n_crops))
        for stage in range(level):
            y = folded_stage(folded, y, stage, stage_sizes[stage])
        xc = ftta_windows(y, b, s, crop, n_crops, level)
        for stage in range(level, len(stage_sizes)):
            xc = folded_stage(folded, xc, stage, stage_sizes[stage])
        return folded_head(folded, xc, n_classes)

    return apply


def teacher_log_probs(exact_apply, folded, base_u8, n_crops,
                      tta_fold="prob_mean"):
    """Frozen-teacher per-head TTA-folded log-probs for one base batch.

    Computed ONCE per unique batch by the distillation driver (the
    teacher never changes), so the train step pays only the student
    forward + backward."""
    from ..eval.infer import mean_tta_logits

    x = base_u8.astype(jnp.float32) - 128.0
    logits = exact_apply(folded, x)
    return tuple(
        jax.nn.log_softmax(mean_tta_logits(l, n_crops, tta_fold), axis=-1)
        for l in logits)


def _fold_log_probs(logits, n_crops, tta_fold):
    from ..eval.infer import mean_tta_logits

    return [jax.nn.log_softmax(
        mean_tta_logits(l, n_crops, tta_fold), axis=-1) for l in logits]


def _kl_terms(teacher_lp, student_lp):
    kls, agrees = [], []
    for t, s_ in zip(teacher_lp, student_lp):
        pt = jnp.exp(t)
        kls.append(jnp.mean(jnp.sum(pt * (t - s_), axis=-1)))
        agrees.append(jnp.mean(
            (jnp.argmax(t, -1) == jnp.argmax(s_, -1))
            .astype(jnp.float32)))
    return kls, agrees


def make_distill_step(ftta_apply, tx, n_crops, tta_fold="prob_mean",
                      train_scope="all", level=3, arch="resnet50",
                      exact_apply=None, anchor_weight=1.0):
    """Returns jittable `step(folded, opt_state, base_u8, teacher_lp)
    -> (folded, opt_state, metrics)`.

    Loss: sum over heads of KL(teacher || student_ftta), plus — when
    `exact_apply` is given — `anchor_weight` x KL(teacher ||
    student_exact). The anchor term is essential: without it the weights
    drift to match feature-TTA on the distillation images while the
    EXACT path's predictions walk away from the original teacher
    (measured: a passing exact path pushed past the parity budget by an
    unanchored distill). With it, the loss is exactly the pair of
    quantities the parity verdict measures. All terms are TTA-folded
    probabilities — what the downstream f* rule consumes.
    metrics: kl (ftta), kl_anchor, per-head kl, per-head post-fold
    argmax agreement.

    train_scope: 'all' (default) fine-tunes everything; 'rest' freezes
    the shared trunk (stem + stages 1..level) and trains only the
    per-crop stages + head."""
    if train_scope not in ("all", "rest"):
        raise ValueError("train_scope must be 'all' or 'rest'")
    frozen_blocks = set()
    if train_scope == "rest":
        for stage in range(level):
            for bidx in range(STAGE_SIZES[arch][stage]):
                frozen_blocks.add(f"layer{stage + 1}_block{bidx}")

    def freeze_mask(grads):
        if train_scope == "all":
            return grads
        zero = lambda t: jax.tree.map(jnp.zeros_like, t)  # noqa: E731
        blocks = {name: (zero(g) if name in frozen_blocks else g)
                  for name, g in grads["blocks"].items()}
        return {"stem": zero(grads["stem"]), "blocks": blocks,
                "heads": grads["heads"]}

    def step(folded, opt_state, base_u8, teacher_lp):
        x = base_u8.astype(jnp.float32) - 128.0

        def loss_fn(f):
            s_lp = _fold_log_probs(ftta_apply(f, x), n_crops, tta_fold)
            kls, agrees = _kl_terms(teacher_lp, s_lp)
            loss = sum(kls)
            anchor = jnp.float32(0.0)
            if exact_apply is not None:
                e_lp = _fold_log_probs(exact_apply(f, x), n_crops,
                                       tta_fold)
                a_kls, _ = _kl_terms(teacher_lp, e_lp)
                anchor = sum(a_kls)
                loss = loss + anchor_weight * anchor
            return loss, (kls, agrees, anchor)

        (_, (kls, agrees, anchor)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(folded)
        grads = freeze_mask(grads)
        updates, opt_state = tx.update(grads, opt_state, folded)
        folded = jax.tree.map(lambda p, u: p + u, folded, updates)
        metrics = {"kl": sum(kls), "kl_anchor": anchor}
        for i, (k, a) in enumerate(zip(kls, agrees)):
            metrics[f"kl_head{i}"] = k
            metrics[f"agree_head{i}"] = a
        return folded, opt_state, metrics

    return step


def make_eval_kl(ftta_apply, exact_apply, n_crops, tta_fold="prob_mean"):
    """Returns jittable `eval_kl(folded, base_u8, teacher_lp) ->
    (kl_ftta, kl_exact)` — the full verdict pair on one batch, no grad.
    The distillation driver averages it over the WHOLE distillation set
    at log points and snapshots the best: per-batch train KL is too
    noisy a criterion (different batches at different log points)."""

    def eval_kl(folded, base_u8, teacher_lp):
        x = base_u8.astype(jnp.float32) - 128.0
        s_lp = _fold_log_probs(ftta_apply(folded, x), n_crops, tta_fold)
        kls, _ = _kl_terms(teacher_lp, s_lp)
        e_lp = _fold_log_probs(exact_apply(folded, x), n_crops, tta_fold)
        e_kls, _ = _kl_terms(teacher_lp, e_lp)
        return sum(kls), sum(e_kls)

    return eval_kl
