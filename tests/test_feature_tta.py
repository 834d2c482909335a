"""Feature-space ten-crop TTA (round-3 throughput lever).

`build_feature_tta_apply` (bf16) and `build_int8_apply(feature_tta=...)`
run stem..layer3 once per base image (+ once mirrored) and crop the
layer3 feature map instead of running 10 pixel crops through the whole
trunk. The mode is APPROXIMATE at crop borders by design; these tests
pin its structure and its closeness to the exact path at the real
256/224 geometry:

  * shape/order contract: (B * n_crops, C), crops contiguous per image;
  * the 5-crop subset is exactly the first five rows of the 10-crop set;
  * per-image TTA-folded scores track the exact ten-crop path closely
    (high correlation, matching fold argmax on a decisively-colored
    image) for bf16 and int8 alike.

Accuracy at corpus scale is measured by tools/quant_study.py
--feature_tta (docs/QUANTIZATION.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geoestimation_tpu.eval.infer import mean_tta_logits
from geoestimation_tpu.ingest.pipeline import (
    eval_pipeline,
    eval_pipeline_s8,
    normalize,
)
from geoestimation_tpu.models import MultiPartitioningClassifier
from geoestimation_tpu.models.fast_infer import (
    build_fast_apply,
    build_feature_tta_apply,
)

N_CLASSES = (5, 9, 13)
ARCH = "resnet14"


@pytest.fixture(scope="module")
def model_and_vars():
    model = MultiPartitioningClassifier(
        n_classes=N_CLASSES, arch=ARCH, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32),
        train=False)
    return model, variables


@pytest.fixture(scope="module")
def base_images():
    """Two 256px base images with global structure (stripes + color) so
    crops carry consistent signal."""
    rng = np.random.default_rng(7)
    xs = np.arange(256, dtype=np.float32)
    imgs = []
    for i in range(2):
        base = np.full((256, 256, 3), 90.0 + 40 * i, np.float32)
        base[..., i] += 80.0
        base += 35.0 * np.sign(np.sin(2 * np.pi * xs / 16))[None, :, None]
        imgs.append(np.clip(base + rng.normal(0, 12, base.shape), 0, 255))
    return np.stack(imgs).astype(np.uint8)


def _corr(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    a -= a.mean()
    b -= b.mean()
    return float((a * b).sum()
                 / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_bf16_feature_tta_tracks_exact(model_and_vars, base_images):
    _, variables = model_and_vars
    u8 = jnp.asarray(base_images)
    exact_apply = build_fast_apply(variables, ARCH, n_classes=N_CLASSES,
                                   use_pallas=False)
    exact = exact_apply(eval_pipeline(u8, n_crops=10, crop=224,
                                      dtype=jnp.float32))
    feat_apply = build_feature_tta_apply(variables, ARCH,
                                         n_classes=N_CLASSES)
    got = feat_apply(normalize(u8, jnp.float32))
    assert [g.shape for g in got] == [e.shape for e in exact]
    for g, e in zip(got, exact):
        fg = mean_tta_logits(g, 10)
        fe = mean_tta_logits(e, 10)
        assert _corr(fg, fe) > 0.95
        assert (np.asarray(jnp.argmax(fg, -1))
                == np.asarray(jnp.argmax(fe, -1))).all()


def test_five_crop_subset_is_prefix(model_and_vars, base_images):
    _, variables = model_and_vars
    u8 = jnp.asarray(base_images)
    ten = build_feature_tta_apply(variables, ARCH, n_classes=N_CLASSES,
                                  n_crops=10)(normalize(u8, jnp.float32))
    five = build_feature_tta_apply(variables, ARCH, n_classes=N_CLASSES,
                                   n_crops=5)(normalize(u8, jnp.float32))
    for t, f in zip(ten, five):
        t = np.asarray(t).reshape(2, 10, -1)
        f = np.asarray(f).reshape(2, 5, -1)
        np.testing.assert_allclose(t[:, :5], f, rtol=0, atol=1e-3)


def test_int8_feature_tta_tracks_bf16_feature(model_and_vars,
                                              base_images):
    _, variables = model_and_vars
    from geoestimation_tpu.models.quant import (
        build_int8_apply,
        calibrate,
        quantize_model,
        shift_s8,
    )

    u8 = jnp.asarray(base_images)
    scales = calibrate(variables, [base_images], arch=ARCH,
                       n_crops=1, crop=224)
    qnet = quantize_model(variables, arch=ARCH)
    i8 = build_int8_apply(qnet, scales, n_classes=N_CLASSES,
                          feature_tta={"crop": 224, "n_crops": 10})(
        shift_s8(u8))
    bf = build_feature_tta_apply(variables, ARCH, n_classes=N_CLASSES)(
        normalize(u8, jnp.float32))
    for g, e in zip(i8, bf):
        assert g.shape == e.shape
        fg = mean_tta_logits(g, 10)
        fe = mean_tta_logits(e, 10)
        assert _corr(fg, fe) > 0.95


def test_feature_tta_rejects_misaligned_geometry(model_and_vars):
    _, variables = model_and_vars
    apply = build_feature_tta_apply(variables, ARCH, n_classes=N_CLASSES,
                                    crop=224)
    with pytest.raises(ValueError, match="aligned"):
        apply(jnp.zeros((1, 240, 240, 3), jnp.float32))


def test_feature_tta_rejects_bad_level(model_and_vars):
    _, variables = model_and_vars
    with pytest.raises(ValueError, match="level"):
        build_feature_tta_apply(variables, ARCH, n_classes=N_CLASSES,
                                level=4)
    from geoestimation_tpu.models.quant import (
        build_int8_apply,
        calibrate,
        quantize_model,
    )

    base = np.full((1, 224, 224, 3), 127, np.uint8)
    scales = calibrate(variables, [base], arch=ARCH, n_crops=1, crop=224)
    qnet = quantize_model(variables, arch=ARCH)
    with pytest.raises(ValueError, match="level"):
        build_int8_apply(qnet, scales, n_classes=N_CLASSES,
                         feature_tta={"crop": 224, "n_crops": 5,
                                      "level": 0})


@pytest.mark.parametrize("level", [1, 2, 3])
def test_degenerate_geometry_is_exact_per_level(model_and_vars, level):
    """With base == crop (m=0) every window is the whole feature map, so
    feature TTA at ANY level must equal the plain forward on the base —
    this pins the stage split point exactly (a wrong split would change
    the network, not just border context)."""
    _, variables = model_and_vars
    rng = np.random.default_rng(3)
    u8 = jnp.asarray(rng.integers(0, 255, (2, 224, 224, 3), np.uint8))
    exact = build_fast_apply(variables, ARCH, n_classes=N_CLASSES,
                             use_pallas=False)(normalize(u8, jnp.float32))
    got = build_feature_tta_apply(variables, ARCH, n_classes=N_CLASSES,
                                  n_crops=5, level=level)(
        normalize(u8, jnp.float32))
    for g, e in zip(got, exact):
        g = np.asarray(g).reshape(2, 5, -1)
        for c in range(5):
            np.testing.assert_allclose(g[:, c], np.asarray(e),
                                       rtol=0, atol=2e-2)


def test_level2_tracks_exact(model_and_vars, base_images):
    """Level 2 (crop at layer2, run layer3+4 per crop) must track the
    exact ten-crop path at least as well as the default level 3 — only
    the small-receptive-field early features carry border context."""
    _, variables = model_and_vars
    u8 = jnp.asarray(base_images)
    exact_apply = build_fast_apply(variables, ARCH, n_classes=N_CLASSES,
                                   use_pallas=False)
    exact = exact_apply(eval_pipeline(u8, n_crops=10, crop=224,
                                      dtype=jnp.float32))
    got = build_feature_tta_apply(variables, ARCH, n_classes=N_CLASSES,
                                  level=2)(normalize(u8, jnp.float32))
    for g, e in zip(got, exact):
        fg = mean_tta_logits(g, 10)
        fe = mean_tta_logits(e, 10)
        assert _corr(fg, fe) > 0.95
        assert (np.asarray(jnp.argmax(fg, -1))
                == np.asarray(jnp.argmax(fe, -1))).all()


def test_int8_level2_tracks_bf16_level2(model_and_vars, base_images):
    _, variables = model_and_vars
    from geoestimation_tpu.models.quant import (
        build_int8_apply,
        calibrate,
        quantize_model,
        shift_s8,
    )

    u8 = jnp.asarray(base_images)
    scales = calibrate(variables, [base_images], arch=ARCH,
                       n_crops=1, crop=224)
    qnet = quantize_model(variables, arch=ARCH)
    i8 = build_int8_apply(qnet, scales, n_classes=N_CLASSES,
                          feature_tta={"crop": 224, "n_crops": 10,
                                       "level": 2})(shift_s8(u8))
    bf = build_feature_tta_apply(variables, ARCH, n_classes=N_CLASSES,
                                 level=2)(normalize(u8, jnp.float32))
    for g, e in zip(i8, bf):
        assert g.shape == e.shape
        fg = mean_tta_logits(g, 10)
        fe = mean_tta_logits(e, 10)
        assert _corr(fg, fe) > 0.95
