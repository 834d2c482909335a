"""f* hierarchical rule vs a numpy oracle on a toy class stack
(SURVEY.md §7: "hierarchical f* rule on a toy 3/2/1-class stack vs numpy
oracle")."""

import jax.numpy as jnp
import numpy as np
import pytest

from geoestimation_tpu.eval import (
    HierarchyArrays,
    hierarchical_log_probs,
    mean_tta_logits,
    predict_all,
    predict_hierarchical,
)

RNG = np.random.default_rng(3)


def toy_harrays(valid=None):
    # coarse: 2 classes, middle: 3, fine: 5
    # fine->middle: [0,0,1,2,2], fine->coarse: [0,0,0,1,1]
    n_fine = 5
    maps = (
        jnp.array([0, 0, 0, 1, 1], jnp.int32),
        jnp.array([0, 0, 1, 2, 2], jnp.int32),
        jnp.arange(n_fine, dtype=jnp.int32),
    )
    lats = (jnp.array([10.0, 20.0]), jnp.array([1.0, 2.0, 3.0]),
            jnp.arange(5, dtype=jnp.float32) * 100)
    lngs = (jnp.array([-10.0, -20.0]), jnp.array([-1.0, -2.0, -3.0]),
            jnp.arange(5, dtype=jnp.float32) * -100)
    if valid is None:
        valid = jnp.ones(n_fine, bool)
    return HierarchyArrays(maps=maps, valid=valid, lats=lats, lngs=lngs,
                           names=("coarse", "middle", "fine"))


def np_softmax(x):
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def oracle_fstar(lc, lm, lf, f2c, f2m):
    pc, pm, pf = np_softmax(lc), np_softmax(lm), np_softmax(lf)
    return pf * pm[:, f2m] * pc[:, f2c]


class TestFStar:
    def test_matches_numpy_oracle(self):
        B = 16
        lc = RNG.normal(size=(B, 2)).astype(np.float32)
        lm = RNG.normal(size=(B, 3)).astype(np.float32)
        lf = RNG.normal(size=(B, 5)).astype(np.float32)
        h = toy_harrays()
        scores = np.asarray(
            hierarchical_log_probs([jnp.array(lc), jnp.array(lm),
                                    jnp.array(lf)], h)
        )
        expect = oracle_fstar(lc, lm, lf, np.array([0, 0, 0, 1, 1]),
                              np.array([0, 0, 1, 2, 2]))
        np.testing.assert_allclose(np.exp(scores), expect, rtol=1e-3)

    def test_argmax_and_latlng(self):
        B = 8
        lc = RNG.normal(size=(B, 2)).astype(np.float32)
        lm = RNG.normal(size=(B, 3)).astype(np.float32)
        lf = RNG.normal(size=(B, 5)).astype(np.float32)
        h = toy_harrays()
        cls, lat, lng = predict_hierarchical(
            [jnp.array(lc), jnp.array(lm), jnp.array(lf)], h
        )
        expect_cls = oracle_fstar(
            lc, lm, lf, np.array([0, 0, 0, 1, 1]), np.array([0, 0, 1, 2, 2])
        ).argmax(-1)
        np.testing.assert_array_equal(np.asarray(cls), expect_cls)
        np.testing.assert_allclose(np.asarray(lat), expect_cls * 100.0)
        np.testing.assert_allclose(np.asarray(lng), expect_cls * -100.0)

    def test_invalid_cells_excluded(self):
        # Force the otherwise-best fine cell invalid; argmax must avoid it.
        lf = np.full((1, 5), -5.0, np.float32)
        lf[0, 3] = 10.0
        lf[0, 1] = 5.0
        lc = np.zeros((1, 2), np.float32)
        lm = np.zeros((1, 3), np.float32)
        h = toy_harrays(valid=jnp.array([True, True, True, False, True]))
        cls, _, _ = predict_hierarchical(
            [jnp.array(lc), jnp.array(lm), jnp.array(lf)], h
        )
        assert int(cls[0]) == 1

    def test_predict_all_keys(self):
        h = toy_harrays()
        B = 4
        logits = [jnp.array(RNG.normal(size=(B, n)).astype(np.float32))
                  for n in (2, 3, 5)]
        preds = predict_all(logits, h)
        assert set(preds) == {"coarse", "middle", "fine", "hierarchy"}
        for name, n in zip(("coarse", "middle", "fine"), (2, 3, 5)):
            cls, lat, lng = preds[name]
            np.testing.assert_array_equal(
                np.asarray(cls), np.asarray(logits[["coarse", "middle",
                                                    "fine"].index(name)]).argmax(-1)
            )

    def test_hierarchy_differs_from_fine_when_ancestors_disagree(self):
        # Fine head slightly prefers cell 4, but coarse strongly prefers
        # coarse class 0 (cells 0-2): f* must flip the decision.
        lf = np.array([[0.0, 0.0, 1.0, 0.0, 1.2]], np.float32)
        lm = np.zeros((1, 3), np.float32)
        lc = np.array([[8.0, -8.0]], np.float32)
        h = toy_harrays()
        logits = [jnp.array(lc), jnp.array(lm), jnp.array(lf)]
        fine_cls = int(np.asarray(logits[2]).argmax(-1)[0])
        fstar_cls, _, _ = predict_hierarchical(logits, h)
        assert fine_cls == 4
        assert int(fstar_cls[0]) == 2


class TestTTA:
    """Pins every fold mode against a numpy oracle. The default MUST stay
    prob_mean — the torch reference softmaxed each crop then averaged the
    probabilities, and argmax parity of imported checkpoints depends on
    matching that convention (VERDICT r1 weak #2)."""

    def test_default_fold_is_prob_mean(self):
        B, crops, C = 3, 10, 7
        logits = RNG.normal(size=(B * crops, C)).astype(np.float32)
        out = np.asarray(mean_tta_logits(jnp.array(logits), crops))
        assert out.shape == (B, C)
        probs = np_softmax(logits).reshape(B, crops, C)
        np.testing.assert_allclose(
            np.exp(out), probs.mean(1), rtol=1e-4, atol=1e-6
        )

    def test_log_mean_fold(self):
        B, crops, C = 3, 5, 7
        logits = RNG.normal(size=(B * crops, C)).astype(np.float32)
        out = np.asarray(
            mean_tta_logits(jnp.array(logits), crops, fold="log_mean")
        )
        lp = np.log(np_softmax(logits)).reshape(B, crops, C)
        np.testing.assert_allclose(out, lp.mean(1), rtol=1e-4, atol=1e-5)

    def test_logit_mean_fold(self):
        B, crops, C = 2, 5, 4
        logits = RNG.normal(size=(B * crops, C)).astype(np.float32)
        out = np.asarray(
            mean_tta_logits(jnp.array(logits), crops, fold="logit_mean")
        )
        np.testing.assert_allclose(
            out, logits.reshape(B, crops, C).mean(1), rtol=1e-5, atol=1e-6
        )

    def test_unknown_fold_rejected(self):
        with pytest.raises(ValueError):
            mean_tta_logits(jnp.zeros((10, 4)), 5, fold="median")

    def test_folds_can_disagree_on_argmax(self):
        # Class 1 wins two crops decisively but one crop assigns it
        # near-zero probability: the geometric mean (log_mean) vetoes it,
        # the arithmetic mean (prob_mean) keeps it. The knob is not
        # cosmetic — parity requires the reference's fold.
        crops, C = 3, 2
        logits = np.array(
            [[0.0, 5.0], [0.0, 5.0], [0.0, -20.0]], np.float32
        ).reshape(crops, C)
        pm = np.asarray(
            mean_tta_logits(jnp.array(logits), crops, fold="prob_mean")
        ).argmax(-1)
        lm = np.asarray(
            mean_tta_logits(jnp.array(logits), crops, fold="log_mean")
        ).argmax(-1)
        assert pm[0] == 1 and lm[0] == 0
