"""Pallas fused bottleneck vs XLA reference (SURVEY.md §7: "Pallas fused
block vs XLA-reference block (allclose)"). Runs in interpreter mode on the
CPU test mesh; the compiled path is exercised on TPU by bench/fast-infer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geoestimation_tpu.ops.fused_bottleneck import (
    fold_bn,
    fused_bottleneck,
    xla_bottleneck_reference,
)

RNG = np.random.default_rng(0)


def make_weights(cin, cmid, cout, downsample):
    w1 = RNG.normal(0, 0.05, (cin, cmid)).astype(np.float32)
    b1 = RNG.normal(0, 0.1, (cmid,)).astype(np.float32)
    w2 = RNG.normal(0, 0.05, (3, 3, cmid, cmid)).astype(np.float32)
    b2 = RNG.normal(0, 0.1, (cmid,)).astype(np.float32)
    w3 = RNG.normal(0, 0.05, (cmid, cout)).astype(np.float32)
    b3 = RNG.normal(0, 0.1, (cout,)).astype(np.float32)
    if downsample:
        wd = RNG.normal(0, 0.05, (cin, cout)).astype(np.float32)
        bd = RNG.normal(0, 0.1, (cout,)).astype(np.float32)
    else:
        wd = bd = None
    return w1, b1, w2, b2, w3, b3, wd, bd


@pytest.mark.parametrize(
    "shape,downsample,npi",
    [
        ((2, 16, 16, 64), False, 1),    # layer1-like identity block
        ((2, 16, 16, 64), True, 1),     # with projection
        ((4, 8, 8, 128), False, 2),     # smaller plane, 2 images/tile
    ],
)
def test_fused_matches_xla(shape, downsample, npi):
    cin = shape[-1]
    cmid, cout = cin // 4 if cin >= 128 else 32, cin
    ws = make_weights(cin, cmid, cout, downsample)
    x = RNG.normal(0, 1, shape).astype(np.float32)

    ref = xla_bottleneck_reference(jnp.asarray(x), *ws)
    got = fused_bottleneck(jnp.asarray(x), *ws, images_per_tile=npi,
                           interpret=True)
    assert got.shape == ref.shape
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05,
    )
    # agreement should be overwhelmingly exact in bf16
    frac_same = np.mean(
        np.asarray(got, np.float32) == np.asarray(ref, np.float32)
    )
    assert frac_same > 0.9


def test_halo_does_not_bleed_across_images():
    # Two images, one all-zeros: its output must be unaffected by the
    # other image in the same tile.
    cin, cmid, cout = 64, 32, 64
    ws = make_weights(cin, cmid, cout, False)
    x0 = RNG.normal(0, 1, (1, 8, 8, cin)).astype(np.float32)
    zeros = np.zeros((1, 8, 8, cin), np.float32)
    both = np.concatenate([x0, zeros])
    out_pair = fused_bottleneck(jnp.asarray(both), *ws, images_per_tile=2,
                                interpret=True)
    out_zero = fused_bottleneck(jnp.asarray(zeros), *ws, images_per_tile=1,
                                interpret=True)
    np.testing.assert_array_equal(
        np.asarray(out_pair[1], np.float32),
        np.asarray(out_zero[0], np.float32),
    )


@pytest.mark.parametrize(
    "w,wbuf,downsample,npi",
    [
        (28, 32, False, 1),   # layer2 geometry: 28 carried at 32
        (28, 32, True, 2),    # with projection, 2 images/tile
        (12, 16, False, 1),   # smaller odd-width plane
    ],
)
def test_carry_mode_matches_xla(w, wbuf, downsample, npi):
    """Carry mode (logical_w < W): data in cols [0, w), zeros beyond —
    the layer2 28-at-32 formulation (PERF_NOTES round-2 #3). Output must
    match XLA on the data columns AND keep the pad columns exactly zero
    (next block's invariant)."""
    cin, cmid = 64, 32
    cout = cin
    ws = make_weights(cin, cmid, cout, downsample)
    b, h = 2 * npi, 14
    x = RNG.normal(0, 1, (b, h, w, cin)).astype(np.float32)
    xpad = np.zeros((b, h, wbuf, cin), np.float32)
    xpad[:, :, :w] = x

    ref = xla_bottleneck_reference(jnp.asarray(x), *ws)
    got = fused_bottleneck(jnp.asarray(xpad), *ws, images_per_tile=npi,
                           interpret=True, logical_w=w)
    assert got.shape == (b, h, wbuf, cout)
    got_np = np.asarray(got, np.float32)
    np.testing.assert_allclose(
        got_np[:, :, :w], np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05,
    )
    frac_same = np.mean(got_np[:, :, :w] == np.asarray(ref, np.float32))
    assert frac_same > 0.9
    np.testing.assert_array_equal(got_np[:, :, w:], 0.0)


def test_carry_mode_chains():
    """Two carry-mode blocks back to back (the whole point: pad once,
    slice once) equals two XLA blocks."""
    cin, cmid = 64, 32
    ws_a = make_weights(cin, cmid, cin, False)
    ws_b = make_weights(cin, cmid, cin, False)
    w, wbuf = 28, 32
    x = RNG.normal(0, 1, (1, 10, w, cin)).astype(np.float32)
    xpad = np.zeros((1, 10, wbuf, cin), np.float32)
    xpad[:, :, :w] = x

    ref = xla_bottleneck_reference(
        xla_bottleneck_reference(jnp.asarray(x), *ws_a), *ws_b
    )
    mid = fused_bottleneck(jnp.asarray(xpad), *ws_a, interpret=True,
                           logical_w=w)
    got = fused_bottleneck(mid, *ws_b, interpret=True, logical_w=w)
    np.testing.assert_allclose(
        np.asarray(got, np.float32)[:, :, :w],
        np.asarray(ref, np.float32), rtol=0.08, atol=0.08,
    )


def test_carry_mode_needs_halo_room():
    cin, cmid = 64, 32
    ws = make_weights(cin, cmid, cin, False)
    x = jnp.zeros((1, 8, 16, cin))
    with pytest.raises(ValueError, match="halo"):
        fused_bottleneck(x, *ws, interpret=True, logical_w=15)


def test_fold_bn_matches_batchnorm():
    cin, cout = 8, 16
    kernel = RNG.normal(0, 0.2, (1, 1, cin, cout)).astype(np.float32)
    scale = RNG.uniform(0.5, 1.5, cout).astype(np.float32)
    bias = RNG.normal(0, 0.2, cout).astype(np.float32)
    mean = RNG.normal(0, 0.2, cout).astype(np.float32)
    var = RNG.uniform(0.5, 2.0, cout).astype(np.float32)
    x = RNG.normal(0, 1, (2, 4, 4, cin)).astype(np.float32)

    raw = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(kernel), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    eps = 1e-5
    bn = (raw - mean) / np.sqrt(var + eps) * scale + bias

    fk, fb = fold_bn(kernel, scale, bias, mean, var, eps)
    folded = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(fk), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + fb
    np.testing.assert_allclose(np.asarray(bn), np.asarray(folded),
                               rtol=1e-4, atol=1e-5)


class TestStride2:
    @pytest.mark.parametrize("shape,npi", [
        ((2, 16, 16, 64), 1),     # layer2_block0-like
        ((4, 8, 8, 128), 2),
    ])
    def test_matches_xla(self, shape, npi):
        from geoestimation_tpu.ops.fused_bottleneck import (
            fused_bottleneck_s2,
        )

        cin = shape[-1]
        cmid, cout = cin // 2, cin * 2
        w1, b1, w2, b2, w3, b3, _, _ = make_weights(cin, cmid, cout, False)
        w3 = RNG.normal(0, 0.05, (cmid, cout)).astype(np.float32)
        wd = RNG.normal(0, 0.05, (cin, cout)).astype(np.float32)
        bd = RNG.normal(0, 0.1, (cout,)).astype(np.float32)
        x = RNG.normal(0, 1, shape).astype(np.float32)

        ref = xla_bottleneck_reference(jnp.asarray(x), w1, b1, w2, b2,
                                       w3, b3, wd, bd, stride=2)
        got = fused_bottleneck_s2(jnp.asarray(x), w1, b1, w2, b2, w3, b3,
                                  wd, bd, images_per_tile=npi,
                                  interpret=True)
        assert got.shape == (shape[0], shape[1] // 2, shape[2] // 2, cout)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=0.05, atol=0.05,
        )
        frac_same = np.mean(
            np.asarray(got, np.float32) == np.asarray(ref, np.float32)
        )
        assert frac_same > 0.9

    def test_rejects_odd_dims(self):
        from geoestimation_tpu.ops.fused_bottleneck import (
            fused_bottleneck_s2,
        )

        ws = make_weights(64, 32, 128, True)
        w1, b1, w2, b2, w3, b3, wd, bd = ws
        w3 = RNG.normal(0, 0.05, (32, 128)).astype(np.float32)
        wd = RNG.normal(0, 0.05, (64, 128)).astype(np.float32)
        bd = np.zeros(128, np.float32)
        with pytest.raises(ValueError, match="even H/W"):
            fused_bottleneck_s2(jnp.zeros((1, 9, 16, 64)), w1, b1, w2,
                                b2, w3, b3, wd, bd, interpret=True)


def test_bad_images_per_tile():
    ws = make_weights(64, 32, 64, False)
    x = jnp.zeros((3, 8, 8, 64))
    with pytest.raises(ValueError, match="divisible"):
        fused_bottleneck(x, *ws, images_per_tile=2, interpret=True)
