"""Torch checkpoint importer: structural + full numerical parity.

Builds a synthetic torchvision-layout ResNet50 state dict, converts it with
tools/import_torch_checkpoint, and checks our Flax forward against a
torch.nn.functional re-implementation of the torchvision forward (no
torchvision needed) — end-to-end logits agreement proves the weight
mapping (OIHW->HWIO, BN stats, head concat) is exact.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import import_torch_checkpoint as imp  # noqa: E402

STAGES = (3, 4, 6, 3)
N_CLASSES = (4, 6, 9)
RNG = np.random.default_rng(0)


def t(shape, scale=0.05):
    return torch.tensor(RNG.normal(0, scale, shape).astype(np.float32))


def make_state_dict():
    sd = {}

    def add_bn(prefix, c):
        sd[f"{prefix}.weight"] = t((c,), 0.2) + 1.0
        sd[f"{prefix}.bias"] = t((c,), 0.1)
        sd[f"{prefix}.running_mean"] = t((c,), 0.1)
        sd[f"{prefix}.running_var"] = torch.abs(t((c,), 0.2)) + 1.0

    sd["conv1.weight"] = t((64, 3, 7, 7))
    add_bn("bn1", 64)
    cin = 64
    for stage, n_blocks in enumerate(STAGES):
        cmid = 64 * (2 ** stage)
        cout = cmid * 4
        for b in range(n_blocks):
            p = f"layer{stage + 1}.{b}"
            sd[f"{p}.conv1.weight"] = t((cmid, cin, 1, 1))
            add_bn(f"{p}.bn1", cmid)
            sd[f"{p}.conv2.weight"] = t((cmid, cmid, 3, 3))
            add_bn(f"{p}.bn2", cmid)
            sd[f"{p}.conv3.weight"] = t((cout, cmid, 1, 1))
            add_bn(f"{p}.bn3", cout)
            if b == 0:
                sd[f"{p}.downsample.0.weight"] = t((cout, cin, 1, 1))
                add_bn(f"{p}.downsample.1", cout)
            cin = cout
    # per-partitioning Linear heads (ModuleList order)
    for i, n in enumerate(N_CLASSES):
        sd[f"classifier.{i}.weight"] = t((n, 2048))
        sd[f"classifier.{i}.bias"] = t((n,), 0.1)
    return sd


def torch_forward(sd, x):
    """torchvision-semantics ResNet50 forward via torch.nn.functional."""
    import torch.nn.functional as F

    def bn(v, p):
        return F.batch_norm(
            v, sd[f"{p}.running_mean"], sd[f"{p}.running_var"],
            sd[f"{p}.weight"], sd[f"{p}.bias"], training=False, eps=1e-5,
        )

    v = F.conv2d(x, sd["conv1.weight"], stride=2, padding=3)
    v = F.relu(bn(v, "bn1"))
    v = F.max_pool2d(v, 3, stride=2, padding=1)
    for stage, n_blocks in enumerate(STAGES):
        for b in range(n_blocks):
            p = f"layer{stage + 1}.{b}"
            stride = 2 if stage > 0 and b == 0 else 1
            res = v
            y = F.relu(bn(F.conv2d(v, sd[f"{p}.conv1.weight"]), f"{p}.bn1"))
            y = F.relu(bn(F.conv2d(y, sd[f"{p}.conv2.weight"],
                                   stride=stride, padding=1), f"{p}.bn2"))
            y = bn(F.conv2d(y, sd[f"{p}.conv3.weight"]), f"{p}.bn3")
            if f"{p}.downsample.0.weight" in sd:
                res = bn(F.conv2d(v, sd[f"{p}.downsample.0.weight"],
                                  stride=stride), f"{p}.downsample.1")
            v = F.relu(y + res)
    feats = v.mean(dim=(2, 3))
    return [feats @ sd[f"classifier.{i}.weight"].T + sd[f"classifier.{i}.bias"]
            for i in range(len(N_CLASSES))]


@pytest.fixture(scope="module")
def converted():
    sd = make_state_dict()
    np_sd = {k: v.numpy() for k, v in sd.items()}
    bb_params, bb_stats = imp.convert_backbone(np_sd, "resnet50")
    head_kernel, head_bias = imp.find_heads(np_sd, list(N_CLASSES))
    variables = {
        "params": {
            "backbone": bb_params,
            "heads": {"fused_head": {"kernel": head_kernel,
                                     "bias": head_bias}},
        },
        "batch_stats": {"backbone": bb_stats},
    }
    return sd, variables


class TestConverter:
    def test_structure_matches_flax_init(self, converted):
        import jax
        import jax.numpy as jnp

        from geoestimation_tpu.models import MultiPartitioningClassifier

        _, variables = converted
        model = MultiPartitioningClassifier(n_classes=N_CLASSES,
                                            arch="resnet50",
                                            dtype=jnp.float32)
        ref = model.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, 3)), train=False)

        ref_shapes = jax.tree.map(lambda a: a.shape, ref["params"])
        got_shapes = jax.tree.map(lambda a: a.shape, variables["params"])
        assert ref_shapes == got_shapes
        ref_stats = jax.tree.map(lambda a: a.shape, ref["batch_stats"])
        got_stats = jax.tree.map(lambda a: a.shape,
                                 variables["batch_stats"])
        assert ref_stats == got_stats

    def test_numerical_parity_with_torch(self, converted):
        import jax.numpy as jnp

        from geoestimation_tpu.models import MultiPartitioningClassifier

        sd, variables = converted
        x = RNG.normal(0, 1, (2, 64, 64, 3)).astype(np.float32)

        with torch.no_grad():
            ref_logits = torch_forward(
                sd, torch.tensor(np.transpose(x, (0, 3, 1, 2)))
            )

        model = MultiPartitioningClassifier(n_classes=N_CLASSES,
                                            arch="resnet50",
                                            dtype=jnp.float32)
        got_logits = model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            jnp.asarray(x), train=False,
        )
        for g, r in zip(got_logits, ref_logits):
            np.testing.assert_allclose(
                np.asarray(g), r.numpy(), rtol=1e-3, atol=1e-3
            )

    def test_lightning_prefix_stripping(self):
        sd = {"model.conv1.weight": np.zeros((64, 3, 7, 7), np.float32)}
        out = imp.strip_prefixes(sd)
        assert "conv1.weight" in out

    def test_missing_head_errors(self, converted):
        sd, _ = converted
        np_sd = {k: v.numpy() for k, v in sd.items()}
        with pytest.raises(KeyError, match="no Linear head with 999"):
            imp.find_heads(np_sd, [999])
