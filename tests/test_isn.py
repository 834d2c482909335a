"""ISN scene-gated classifier tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geoestimation_tpu.models.isn import ISNClassifier, isn_loss

N_CLASSES = (5, 9, 17)
RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def isn():
    model = ISNClassifier(n_classes=N_CLASSES, n_scenes=3, arch="resnet50")
    x = jnp.zeros((2, 48, 48, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables


class TestISNForward:
    def test_call_contract_matches_base(self, isn):
        model, variables = isn
        x = jnp.asarray(RNG.normal(size=(4, 48, 48, 3)), jnp.float32)
        logits = model.apply(variables, x, train=False)
        assert len(logits) == 3
        for l, n in zip(logits, N_CLASSES):
            assert l.shape == (4, n)

    def test_with_scene_shapes(self, isn):
        model, variables = isn
        x = jnp.asarray(RNG.normal(size=(4, 48, 48, 3)), jnp.float32)
        scene_logits, heads = model.apply(variables, x, train=False,
                                          method="with_scene")
        assert scene_logits.shape == (4, 3)
        for h, n in zip(heads, N_CLASSES):
            assert h.shape == (4, 3, n)

    def test_gating_selects_correct_scene_head(self, isn):
        model, variables = isn
        x = jnp.asarray(RNG.normal(size=(4, 48, 48, 3)), jnp.float32)
        scene_logits, heads = model.apply(variables, x, train=False,
                                          method="with_scene")
        forced = jnp.array([0, 1, 2, 1])
        gated = model.apply(variables, x, train=False, scene=forced)
        for h, g in zip(heads, gated):
            expect = np.stack([np.asarray(h)[b, int(forced[b])]
                               for b in range(4)])
            np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-5,
                                       atol=1e-6)

    def test_default_routing_is_scene_argmax(self, isn):
        model, variables = isn
        x = jnp.asarray(RNG.normal(size=(4, 48, 48, 3)), jnp.float32)
        scene_logits, heads = model.apply(variables, x, train=False,
                                          method="with_scene")
        route = np.asarray(scene_logits).argmax(-1)
        gated = model.apply(variables, x, train=False)
        for h, g in zip(heads, gated):
            expect = np.stack([np.asarray(h)[b, route[b]] for b in range(4)])
            np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-5,
                                       atol=1e-6)


class TestISNLoss:
    def test_loss_components(self, isn):
        model, variables = isn
        x = jnp.asarray(RNG.normal(size=(4, 48, 48, 3)), jnp.float32)
        scene_logits, heads = model.apply(variables, x, train=False,
                                          method="with_scene")
        geo = jnp.asarray(np.stack([RNG.integers(0, n, 4)
                                    for n in N_CLASSES]).astype(np.int32))
        scenes = jnp.array([0, 1, 2, -1])
        total, comps = isn_loss(scene_logits, heads, geo, scenes)
        assert np.isfinite(float(total))
        assert float(total) == pytest.approx(
            float(comps["geo_loss"]) + float(comps["scene_loss"]), rel=1e-5
        )

    def test_scene_gradients_flow(self, isn):
        model, variables = isn
        x = jnp.asarray(RNG.normal(size=(2, 48, 48, 3)), jnp.float32)
        geo = jnp.asarray(np.stack([RNG.integers(0, n, 2)
                                    for n in N_CLASSES]).astype(np.int32))
        scenes = jnp.array([0, 2])

        def loss_fn(params):
            scene_logits, heads = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                x, train=False, method="with_scene",
            )
            total, _ = isn_loss(scene_logits, heads, geo, scenes)
            return total

        grads = jax.grad(loss_fn)(variables["params"])
        g_scene = jnp.abs(
            grads["scene_head"]["kernel"]
        ).sum()
        g_geo = jnp.abs(grads["scene_geo_heads"]["kernel"]).sum()
        assert float(g_scene) > 0
        assert float(g_geo) > 0

    def test_only_routed_head_gets_gradient(self, isn):
        # With all examples routed to scene 0, scene-1/2 head columns get
        # zero gradient.
        model, variables = isn
        x = jnp.asarray(RNG.normal(size=(2, 48, 48, 3)), jnp.float32)
        geo = jnp.asarray(np.stack([RNG.integers(0, n, 2)
                                    for n in N_CLASSES]).astype(np.int32))
        scenes = jnp.array([0, 0])

        def loss_fn(params):
            scene_logits, heads = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                x, train=False, method="with_scene",
            )
            _, comps = isn_loss(scene_logits, heads, geo, scenes)
            return comps["geo_loss"]

        grads = jax.grad(loss_fn)(variables["params"])
        gk = np.asarray(grads["scene_geo_heads"]["kernel"])
        total = sum(N_CLASSES)
        gk = gk.reshape(-1, 3, total)
        assert np.abs(gk[:, 0]).sum() > 0
        assert np.abs(gk[:, 1]).sum() == 0
        assert np.abs(gk[:, 2]).sum() == 0


class TestISNWithFStar:
    def test_isn_feeds_hierarchy(self, isn):
        from geoestimation_tpu.eval.infer import (
            HierarchyArrays,
            predict_hierarchical,
        )

        model, variables = isn
        x = jnp.asarray(RNG.normal(size=(2, 48, 48, 3)), jnp.float32)
        logits = model.apply(variables, x, train=False)
        maps = (
            jnp.asarray(np.sort(RNG.integers(0, 5, 17)), jnp.int32),
            jnp.asarray(np.sort(RNG.integers(0, 9, 17)), jnp.int32),
            jnp.arange(17, dtype=jnp.int32),
        )
        h = HierarchyArrays(
            maps=maps, valid=jnp.ones(17, bool),
            lats=tuple(jnp.zeros(n) for n in N_CLASSES),
            lngs=tuple(jnp.zeros(n) for n in N_CLASSES),
            names=("coarse", "middle", "fine"),
        )
        cls, lat, lng = predict_hierarchical(logits, h)
        assert cls.shape == (2,)
