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
