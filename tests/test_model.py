"""Model tests: shapes/dtypes, loss, gradient sanity (SURVEY.md §7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geoestimation_tpu.models import (
    MultiPartitioningClassifier,
    build_backbone,
    multi_head_cross_entropy,
)

N_CLASSES = (7, 13, 29)


@pytest.fixture(scope="module")
def tiny_model():
    model = MultiPartitioningClassifier(n_classes=N_CLASSES, arch="resnet50")
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables


class TestForward:
    def test_logit_shapes_and_dtype(self, tiny_model):
        model, variables = tiny_model
        x = jnp.ones((2, 64, 64, 3), jnp.float32)
        logits = model.apply(variables, x, train=False)
        assert len(logits) == 3
        for l, n in zip(logits, N_CLASSES):
            assert l.shape == (2, n)
            assert l.dtype == jnp.float32

    def test_param_dtypes_fp32(self, tiny_model):
        _, variables = tiny_model
        for leaf in jax.tree.leaves(variables["params"]):
            assert leaf.dtype == jnp.float32

    def test_batch_stats_exist(self, tiny_model):
        _, variables = tiny_model
        assert "batch_stats" in variables

    def test_train_mode_updates_stats(self, tiny_model):
        model, variables = tiny_model
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
        _, mutated = model.apply(variables, x, train=True,
                                 mutable=["batch_stats"])
        before = variables["batch_stats"]["backbone"]["bn1"]["mean"]
        after = mutated["batch_stats"]["backbone"]["bn1"]["mean"]
        assert not np.allclose(np.asarray(before), np.asarray(after))

    def test_resnet101_depth(self):
        # 101 = 1 + 3*(3+4+23+3) + 1 conv layers; just check distinct param
        # counts vs resnet50.
        m50 = build_backbone("resnet50")
        m101 = build_backbone("resnet101")
        x = jnp.zeros((1, 64, 64, 3))
        v50 = m50.init(jax.random.PRNGKey(0), x)
        v101 = m101.init(jax.random.PRNGKey(0), x)
        c50 = sum(p.size for p in jax.tree.leaves(v50["params"]))
        c101 = sum(p.size for p in jax.tree.leaves(v101["params"]))
        assert c101 > c50 * 1.5
        # known torchvision param counts (backbone only, no fc):
        # resnet50 = 23,508,032; resnet101 = 42,500,160
        assert c50 == 23_508_032
        assert c101 == 42_500_160

    def test_feature_dim(self, tiny_model):
        model, variables = tiny_model
        x = jnp.ones((2, 64, 64, 3))
        feats = model.apply(variables, x, train=False, method="features")
        assert feats.shape == (2, 2048)
        assert feats.dtype == jnp.float32


class TestLoss:
    def test_matches_numpy_ce(self):
        rng = np.random.default_rng(0)
        logits = [jnp.array(rng.normal(size=(8, n)).astype(np.float32))
                  for n in N_CLASSES]
        labels = jnp.array(
            np.stack([rng.integers(0, n, 8) for n in N_CLASSES])
        )
        total, per_head = multi_head_cross_entropy(logits, labels)

        def np_ce(lg, y):
            lg = np.asarray(lg)
            m = lg - lg.max(-1, keepdims=True)
            logp = m - np.log(np.exp(m).sum(-1, keepdims=True))
            return -logp[np.arange(len(y)), np.asarray(y)].mean()

        expect = sum(np_ce(lg, y) for lg, y in zip(logits, labels))
        np.testing.assert_allclose(float(total), expect, rtol=1e-5)
        assert len(per_head) == 3

    def test_invalid_labels_masked(self):
        rng = np.random.default_rng(1)
        logits = [jnp.array(rng.normal(size=(4, n)).astype(np.float32))
                  for n in N_CLASSES]
        labels_full = jnp.array(
            np.stack([rng.integers(0, n, 4) for n in N_CLASSES])
        )
        # Mask example 3 in every head via label -1.
        labels_masked = labels_full.at[:, 3].set(-1)
        total_m, _ = multi_head_cross_entropy(logits, labels_masked)
        sub_logits = [l[:3] for l in logits]
        total_s, _ = multi_head_cross_entropy(sub_logits, labels_full[:, :3])
        np.testing.assert_allclose(float(total_m), float(total_s), rtol=1e-6)

    def test_all_invalid_no_nan(self):
        logits = [jnp.ones((2, n)) for n in N_CLASSES]
        labels = jnp.full((3, 2), -1)
        total, _ = multi_head_cross_entropy(logits, labels)
        assert np.isfinite(float(total))
        assert float(total) == 0.0

    def test_gradients_flow(self, tiny_model):
        model, variables = tiny_model
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 3))
        labels = jnp.array([[1, 2], [3, 4], [5, 6]])

        def loss_fn(params):
            logits, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            total, _ = multi_head_cross_entropy(logits, labels)
            return total

        grads = jax.grad(loss_fn)(variables["params"])
        gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
        assert np.isfinite(gnorm) and gnorm > 0
