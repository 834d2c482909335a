"""Remat (jax.checkpoint) option and mesh-sharded evaluation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geoestimation_tpu.models import MultiPartitioningClassifier
from geoestimation_tpu.parallel.mesh import make_mesh

N_CLASSES = (3, 5, 7)


class TestRemat:
    def test_remat_same_forward_and_grads(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 48, 48, 3))
        labels = jnp.array([[0, 1], [2, 3], [4, 5]])

        outs = {}
        for remat in (False, True):
            model = MultiPartitioningClassifier(
                n_classes=N_CLASSES, arch="resnet50", dtype=jnp.float32,
                remat=remat,
            )
            variables = model.init(jax.random.PRNGKey(1), x, train=False)

            def loss_fn(params):
                from geoestimation_tpu.models import (
                    multi_head_cross_entropy,
                )

                logits = model.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    x, train=False,
                )
                total, _ = multi_head_cross_entropy(logits, labels)
                return total

            loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
            outs[remat] = (float(loss), grads)

        assert outs[False][0] == pytest.approx(outs[True][0], rel=1e-6)
        for a, b in zip(jax.tree.leaves(outs[False][1]),
                        jax.tree.leaves(outs[True][1])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)

    def test_remat_config_plumbing(self):
        from geoestimation_tpu.train.init import model_from_config
        from geoestimation_tpu.utils.config import Config

        c = Config()
        c.model_params.remat = True

        class FakePart:
            def __len__(self):
                return 5

        model = model_from_config(c, [FakePart()] * 3)
        assert model.remat is True


class TestShardedEval:
    def test_engine_sharded_matches_unsharded(self, geo_parts, tmp_path):
        from geoestimation_tpu.eval.engine import InferenceEngine
        from geoestimation_tpu.train.init import init_model_state
        from geoestimation_tpu.utils.config import Config

        config = Config()
        config.model_params.partitionings.files = []
        _, state = init_model_state(config, geo_parts, seed=0,
                                    image_size=64)

        rng = np.random.default_rng(0)
        images = rng.integers(0, 255, (8, 256, 256, 3), dtype=np.uint8)

        plain = InferenceEngine(config, state, partitionings=geo_parts,
                                n_crops=1)
        layout = make_mesh()
        sharded = InferenceEngine(config, state, partitionings=geo_parts,
                                  n_crops=1, layout=layout)
        pa = plain.predict_batch(images)
        pb = sharded.predict_batch(images)
        for key in pa:
            np.testing.assert_array_equal(pa[key][0], pb[key][0])
            np.testing.assert_allclose(pa[key][1], pb[key][1], atol=1e-4)

    COLLECTIVE_OPS = ("all-reduce", "all-gather", "collective-permute",
                      "all-to-all", "reduce-scatter")

    def test_int8_eval_hlo_has_no_hot_path_collectives(self, geo_parts):
        """Multi-chip serving scaling structure (round-4, VERDICT next
        #7): '1526 img/s/chip -> >=10k on v5e-8' assumes purely
        data-parallel scaling, i.e. the int8 eval step lowered over the
        8-device mesh contains NO cross-device collectives — params are
        replicated, the batch (and its TTA crops) shard on data, and
        every op is batchwise. The only collective in evaluation is the
        final GCD count reduction, checked separately below."""
        import jax.numpy as jnp

        from geoestimation_tpu.eval.engine import InferenceEngine
        from geoestimation_tpu.train.init import init_model_state
        from geoestimation_tpu.utils.config import Config

        config = Config()
        config.model_params.partitionings.files = []
        config.model_params.arch = "resnet14"
        _, state = init_model_state(config, geo_parts, seed=0,
                                    image_size=64)
        layout = make_mesh(8, 1)
        engine = InferenceEngine(config, state, partitionings=geo_parts,
                                 n_crops=1, crop=64, int8=True,
                                 int8_persist=False, layout=layout)
        rng = np.random.default_rng(0)
        images = rng.integers(0, 255, (8, 96, 96, 3), dtype=np.uint8)
        engine.predict_batch(images)  # calibrate + build the int8 jit

        placed = jax.device_put(jnp.asarray(images), layout.batch())
        hlo = engine._int8_apply.lower(placed).compile().as_text()
        bad = [ln.strip() for ln in hlo.splitlines()
               if any(op in ln for op in self.COLLECTIVE_OPS)]
        assert not bad, (
            "int8 eval hot path lowered with cross-device collectives:\n"
            + "\n".join(bad[:10]))

    def test_metrics_reduction_is_the_only_eval_collective(self, geo_parts):
        """The GCD count reduction over batch-sharded predictions is
        allowed to (and must) reduce across devices — exactly the one
        collective of the eval pipeline."""
        import jax.numpy as jnp

        from geoestimation_tpu.eval.metrics import gcd_threshold_counts

        layout = make_mesh(8, 1)
        b = layout.batch()
        plat = jax.device_put(jnp.zeros(16, jnp.float32), b)
        plng = jax.device_put(jnp.zeros(16, jnp.float32), b)
        tlat = jax.device_put(jnp.ones(16, jnp.float32), b)
        tlng = jax.device_put(jnp.ones(16, jnp.float32), b)
        fn = jax.jit(lambda a, c, d, e: gcd_threshold_counts(a, c, d, e))
        hlo = fn.lower(plat, plng, tlat, tlng).compile().as_text()
        reduces = [ln for ln in hlo.splitlines() if "all-reduce" in ln]
        assert reduces, "expected the cross-device count reduction"
        others = [ln.strip() for ln in hlo.splitlines()
                  if any(op in ln for op in self.COLLECTIVE_OPS)
                  and "all-reduce" not in ln]
        assert not others, "\n".join(others[:10])
