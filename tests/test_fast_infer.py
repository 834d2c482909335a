"""Fast (folded-BN + Pallas) inference path vs the linen model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geoestimation_tpu.ingest.pipeline import normalize
from geoestimation_tpu.models import MultiPartitioningClassifier
from geoestimation_tpu.models.fast_infer import build_fast_apply

N_CLASSES = (7, 13, 29)


@pytest.fixture(scope="module")
def model_and_vars():
    model = MultiPartitioningClassifier(n_classes=N_CLASSES, arch="resnet50")
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, x, train=False)
    # run a few train steps so batch_stats are non-trivial
    imgs = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 3))
    _, mutated = model.apply(variables, imgs, train=True,
                             mutable=["batch_stats"])
    variables = {"params": variables["params"],
                 "batch_stats": mutated["batch_stats"]}
    return model, variables


def test_fast_apply_matches_model_xla_only(model_and_vars):
    # use_pallas=False isolates the BN folding + layout rewrite
    model, variables = model_and_vars
    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8))
    x = normalize(u8, jnp.float32)
    ref = model.apply(variables, x, train=False)
    fast = build_fast_apply(variables, "resnet50", n_classes=N_CLASSES,
                            use_pallas=False)
    got = fast(x)
    assert len(got) == 3
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=0.1, atol=0.15)
        # argmax agreement is what prediction parity needs
        np.testing.assert_array_equal(
            np.asarray(g).argmax(-1), np.asarray(r).argmax(-1)
        )


def test_fast_apply_isn(model_and_vars):
    # ISN variant through the folded path: gated logits match the linen
    # model's hard routing
    import jax

    from geoestimation_tpu.models.isn import ISNClassifier

    model = ISNClassifier(n_classes=N_CLASSES, n_scenes=3, arch="resnet50")
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(3), x0, train=False)
    imgs = jax.random.normal(jax.random.PRNGKey(4), (4, 64, 64, 3))
    _, mutated = model.apply(variables, imgs, train=True,
                             mutable=["batch_stats"])
    variables = {"params": variables["params"],
                 "batch_stats": mutated["batch_stats"]}

    rng = np.random.default_rng(5)
    u8 = jnp.asarray(rng.integers(0, 255, (3, 64, 64, 3), dtype=np.uint8))
    x = normalize(u8, jnp.float32)
    ref = model.apply(variables, x, train=False)
    fast = build_fast_apply(variables, "resnet50", n_classes=N_CLASSES,
                            use_pallas=False)
    got = fast(x)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(
            np.asarray(g).argmax(-1), np.asarray(r).argmax(-1)
        )
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=0.1, atol=0.15)


def _interpret_pallas(monkeypatch):
    import importlib

    fbmod = importlib.import_module(
        "geoestimation_tpu.ops.fused_bottleneck"
    )
    orig = fbmod.fused_bottleneck
    monkeypatch.setattr(
        "geoestimation_tpu.models.fast_infer.fused_bottleneck",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )


def test_fast_apply_with_pallas_interpret(model_and_vars, monkeypatch):
    # route the pallas blocks through the interpreter on CPU
    _interpret_pallas(monkeypatch)
    model, variables = model_and_vars
    rng = np.random.default_rng(1)
    u8 = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8))
    x = normalize(u8, jnp.float32)
    ref = model.apply(variables, x, train=False)
    fast = build_fast_apply(variables, "resnet50", n_classes=N_CLASSES,
                            use_pallas=True)
    got = fast(x)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(
            np.asarray(g).argmax(-1), np.asarray(r).argmax(-1)
        )
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=0.15, atol=0.2)


def test_fast_apply_pallas_carry_width(model_and_vars, monkeypatch):
    # 112px input -> layer1 plane is 28 wide (28 % 8 != 0): the stage must
    # run through the padded-width carry path (pad once, fused blocks at
    # logical_w=28, slice once) and still match the linen model.
    _interpret_pallas(monkeypatch)
    model, variables = model_and_vars
    rng = np.random.default_rng(2)
    u8 = jnp.asarray(rng.integers(0, 255, (2, 112, 112, 3), dtype=np.uint8))
    x = normalize(u8, jnp.float32)
    ref = model.apply(variables, x, train=False)
    fast = build_fast_apply(variables, "resnet50", n_classes=N_CLASSES,
                            use_pallas=True)
    got = fast(x)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(
            np.asarray(g).argmax(-1), np.asarray(r).argmax(-1)
        )
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=0.15, atol=0.25)


def test_mirror_apply_equals_flipped_input(model_and_vars):
    # netM(x) must equal net(flip_W(x)) AFTER the global pool erases the
    # output flip — i.e. identical per-head logits. Exercises the mirrored
    # paddings of the stem, maxpool, stride-2 conv2 and the negative-pad
    # 1x1 downsample.
    model, variables = model_and_vars
    rng = np.random.default_rng(7)
    u8 = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8))
    x = normalize(u8, jnp.float32)
    fast = build_fast_apply(variables, "resnet50", n_classes=N_CLASSES,
                            use_pallas=False)
    mirrored = build_fast_apply(variables, "resnet50", n_classes=N_CLASSES,
                                use_pallas=False, mirror=True)
    ref = fast(jnp.flip(x, axis=2))
    got = mirrored(x)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=0.05, atol=0.05)


def test_mirror_apply_equals_flipped_input_pallas(model_and_vars,
                                                  monkeypatch):
    # same equivalence through the fused Pallas stride-1 blocks (flipped
    # conv2 taps reach the kernel via the folded weights)
    _interpret_pallas(monkeypatch)
    model, variables = model_and_vars
    rng = np.random.default_rng(8)
    u8 = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8))
    x = normalize(u8, jnp.float32)
    fast = build_fast_apply(variables, "resnet50", n_classes=N_CLASSES,
                            use_pallas=True)
    mirrored = build_fast_apply(variables, "resnet50", n_classes=N_CLASSES,
                                use_pallas=True, mirror=True)
    ref = fast(jnp.flip(x, axis=2))
    got = mirrored(x)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=0.06, atol=0.06)


def test_mirror_tta_equals_ten_crop(model_and_vars):
    # five-crop x {net, netM} == classic ten-crop through the same folded
    # net, crop for crop (order: five crops then their flips).
    from geoestimation_tpu.ingest.pipeline import eval_pipeline
    from geoestimation_tpu.models.fast_infer import build_mirror_tta_apply

    model, variables = model_and_vars
    rng = np.random.default_rng(9)
    base = jnp.asarray(
        rng.integers(0, 255, (2, 96, 96, 3), dtype=np.uint8))
    fast = build_fast_apply(variables, "resnet50", n_classes=N_CLASSES,
                            use_pallas=False)
    ref = fast(eval_pipeline(base, n_crops=10, crop=64, dtype=jnp.float32))
    tta = build_mirror_tta_apply(variables, "resnet50",
                                 n_classes=N_CLASSES, use_pallas=False,
                                 crop=64, n_crops=10, dtype=jnp.float32)
    got = tta(base)
    for g, r in zip(got, ref):
        g, r = np.asarray(g), np.asarray(r)
        # eval_pipeline folds (B, 10, ...) batch-major; ten_crop orders
        # crops [five, flipped five] — same convention as the mirror path
        np.testing.assert_allclose(g, r, rtol=0.05, atol=0.05)
