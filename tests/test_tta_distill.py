"""Feature-TTA self-distillation (models/tta_distill.py).

Pins the contracts the distillation rests on:
  1. the differentiable folded exact forward matches the flax model,
  2. the student (feature-TTA) forward equals the exact forward when
     base == crop (the split-at-level arithmetic is exact there),
  3. distillation learns: KL decreases and post-fold argmax agreement
     does not regress on a toy net,
  4. the exported checkpoint flows through the real feature-TTA engine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geoestimation_tpu.eval.infer import mean_tta_logits
from geoestimation_tpu.ingest.pipeline import eval_pipeline
from geoestimation_tpu.models.qat import fold_variables, unfold_to_variables
from geoestimation_tpu.models.tta_distill import (
    build_exact_tta_apply,
    build_ftta_apply,
    make_distill_step,
    teacher_log_probs,
)

from .test_qat import N_CLASSES, _noisy_variables

ARCH = "resnet14"


@pytest.fixture(scope="module")
def tiny():
    model, variables = _noisy_variables(seed=1)
    folded = fold_variables(variables, arch=ARCH)
    rng = np.random.default_rng(5)
    images_u8 = rng.integers(0, 256, (3, 64, 64, 3), dtype=np.uint8)
    return {"model": model, "variables": variables, "folded": folded,
            "images": images_u8}


class TestFoldedForwards:
    def test_exact_apply_matches_flax_model(self, tiny):
        """The folded (pixel-128)-domain exact forward == the flax model
        on normalized crops (fp32, tight tolerance)."""
        apply = build_exact_tta_apply(ARCH, N_CLASSES, crop=48, n_crops=5)
        x = jnp.asarray(tiny["images"], jnp.float32) - 128.0
        got = apply(tiny["folded"], x)

        crops = eval_pipeline(jnp.asarray(tiny["images"]), n_crops=5,
                              crop=48, dtype=jnp.float32)
        want = tiny["model"].apply(tiny["variables"], crops, train=False)
        for g, w in zip(got, want):
            assert g.shape == w.shape
            # fp32 accumulation-order differences through BN folding:
            # logits of magnitude ~30 agree to ~2e-2
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=2e-3, atol=5e-2)

    def test_ftta_equals_exact_when_base_equals_crop(self, tiny):
        """With base == crop there is exactly one window (m = 0), so the
        feature split must reproduce the exact path bit-for-bit-ish —
        this pins the stage-split arithmetic AND the window ordering."""
        exact = build_exact_tta_apply(ARCH, N_CLASSES, crop=64, n_crops=10)
        ftta = build_ftta_apply(ARCH, N_CLASSES, level=2, crop=64,
                                n_crops=10)
        x = jnp.asarray(tiny["images"], jnp.float32) - 128.0
        ge, gf = exact(tiny["folded"], x), ftta(tiny["folded"], x)
        for e, f in zip(ge, gf):
            np.testing.assert_allclose(np.asarray(e), np.asarray(f),
                                       rtol=1e-4, atol=1e-4)

    def test_ftta_alignment_rejected(self, tiny):
        ftta = build_ftta_apply(ARCH, N_CLASSES, level=2, crop=48,
                                n_crops=5)
        # base 56: (56 - 48) % (2*8) != 0 -> center crop misaligned
        with pytest.raises(ValueError, match="aligned"):
            ftta(tiny["folded"], jnp.zeros((1, 56, 56, 3), jnp.float32))


class TestDistillation:
    def test_kl_decreases_and_agreement_holds(self, tiny):
        import optax

        exact = build_exact_tta_apply(ARCH, N_CLASSES, crop=48, n_crops=10)
        ftta = build_ftta_apply(ARCH, N_CLASSES, level=2, crop=48,
                                n_crops=10)
        base = jnp.asarray(tiny["images"])
        teacher = teacher_log_probs(exact, tiny["folded"], base, 10)
        # adam: the random-init toy net has wildly scaled gradients that
        # blow up plain SGD; real fine-tunes (tools/tta_distill.py) start
        # from converged checkpoints where SGD at low LR is fine
        tx = optax.adam(1e-3)
        folded = tiny["folded"]
        opt_state = tx.init(folded)
        step = jax.jit(make_distill_step(ftta, tx, 10, level=2, arch=ARCH))
        kls = []
        for _ in range(12):
            folded, opt_state, m = step(folded, opt_state, base, teacher)
            kls.append(float(m["kl"]))
        assert all(np.isfinite(kls)), kls
        assert kls[-1] < kls[0] * 0.7, kls

    def test_rest_scope_freezes_trunk(self, tiny):
        import optax

        exact = build_exact_tta_apply(ARCH, N_CLASSES, crop=48, n_crops=10)
        ftta = build_ftta_apply(ARCH, N_CLASSES, level=2, crop=48,
                                n_crops=10)
        base = jnp.asarray(tiny["images"])
        teacher = teacher_log_probs(exact, tiny["folded"], base, 10)
        tx = optax.sgd(5e-3, momentum=0.9)
        folded = tiny["folded"]
        opt_state = tx.init(folded)
        step = jax.jit(make_distill_step(ftta, tx, 10, train_scope="rest",
                                         level=2, arch=ARCH))
        new_folded, _, _ = step(folded, opt_state, base, teacher)
        # trunk (stem + stages 1..2) untouched; later stages moved
        np.testing.assert_array_equal(
            np.asarray(new_folded["stem"]["kernel"]),
            np.asarray(folded["stem"]["kernel"]))
        np.testing.assert_array_equal(
            np.asarray(new_folded["blocks"]["layer1_block0"]["conv1"]
                       ["kernel"]),
            np.asarray(folded["blocks"]["layer1_block0"]["conv1"]
                       ["kernel"]))
        assert not np.array_equal(
            np.asarray(new_folded["blocks"]["layer3_block0"]["conv1"]
                       ["kernel"]),
            np.asarray(folded["blocks"]["layer3_block0"]["conv1"]
                       ["kernel"]))
        assert not np.array_equal(
            np.asarray(new_folded["heads"]["fused_head"]["kernel"]),
            np.asarray(folded["heads"]["fused_head"]["kernel"]))

    def test_export_runs_through_feature_tta_engine(self, tiny):
        """unfold -> standard variables -> fast_infer feature-TTA path
        still runs and tracks the distilled folded forward."""
        from geoestimation_tpu.models.fast_infer import (
            build_feature_tta_apply,
        )
        from geoestimation_tpu.ingest.pipeline import normalize

        new_vars = unfold_to_variables(tiny["folded"], tiny["variables"],
                                       arch=ARCH)
        apply = build_feature_tta_apply(new_vars, ARCH,
                                        n_classes=N_CLASSES, crop=48,
                                        n_crops=10, level=2)
        base_norm = normalize(jnp.asarray(tiny["images"]),
                              dtype=jnp.float32)
        got = apply(base_norm)
        ftta = build_ftta_apply(ARCH, N_CLASSES, level=2, crop=48,
                                n_crops=10)
        want = ftta(tiny["folded"],
                    jnp.asarray(tiny["images"], jnp.float32) - 128.0)
        for g, w in zip(got, want):
            # fast_infer runs bf16 internally; agreement on folded argmax
            gf = mean_tta_logits(g, 10)
            wf = mean_tta_logits(w, 10)
            agree = np.mean(np.argmax(np.asarray(gf), -1)
                            == np.argmax(np.asarray(wf), -1))
            assert agree == 1.0

    def test_anchored_step_and_eval_kl(self, tiny):
        """The anchor term: exact-path KL is exactly 0 at init (student
        == teacher), stays finite through a step, and make_eval_kl
        reports the verdict pair."""
        import optax

        from geoestimation_tpu.models.tta_distill import make_eval_kl

        exact = build_exact_tta_apply(ARCH, N_CLASSES, crop=48, n_crops=10)
        ftta = build_ftta_apply(ARCH, N_CLASSES, level=2, crop=48,
                                n_crops=10)
        base = jnp.asarray(tiny["images"])
        teacher = teacher_log_probs(exact, tiny["folded"], base, 10)
        eval_kl = jax.jit(make_eval_kl(ftta, exact, 10))
        kf0, ke0 = eval_kl(tiny["folded"], base, teacher)
        assert float(ke0) == pytest.approx(0.0, abs=1e-5)
        assert float(kf0) >= 0.0

        tx = optax.adam(1e-4)
        step = jax.jit(make_distill_step(
            ftta, tx, 10, level=2, arch=ARCH, exact_apply=exact,
            anchor_weight=1.0))
        folded, _, m = step(tiny["folded"], tx.init(tiny["folded"]),
                            base, teacher)
        assert float(m["kl_anchor"]) == pytest.approx(0.0, abs=1e-5)
        assert np.isfinite(float(m["kl"]))
        assert not np.array_equal(
            np.asarray(folded["heads"]["fused_head"]["kernel"]),
            np.asarray(tiny["folded"]["heads"]["fused_head"]["kernel"]))
