"""GCD metric tests vs hand-computed city pairs (SURVEY.md §7)."""

import jax.numpy as jnp
import numpy as np
import pytest

from geoestimation_tpu.eval import (
    GcdAccumulator,
    gcd_threshold_accuracy,
    gcd_threshold_counts,
    great_circle_distance,
)


# Haversine ground truth on the 6371 km sphere (computed independently).
CITY_PAIRS = [
    # (lat1, lng1, lat2, lng2, expected_km, tol_km)
    (51.5007, -0.1246, 48.8584, 2.2945, 340.539, 0.5),     # London–Paris
    (40.7128, -74.0060, 34.0522, -118.2437, 3935.746, 2),  # NYC–LA
    (35.6762, 139.6503, -33.8688, 151.2093, 7825.819, 4),  # Tokyo–Sydney
    (0.0, 0.0, 0.0, 180.0, np.pi * 6371.0, 1e-1),        # antipodal equator
    (10.0, 20.0, 10.0, 20.0, 0.0, 1e-3),                 # identical
]


class TestGreatCircleDistance:
    @pytest.mark.parametrize("lat1,lng1,lat2,lng2,expect,tol", CITY_PAIRS)
    def test_city_pairs(self, lat1, lng1, lat2, lng2, expect, tol):
        d = float(great_circle_distance(lat1, lng1, lat2, lng2))
        assert abs(d - expect) < tol

    def test_batched(self):
        lat1 = jnp.array([p[0] for p in CITY_PAIRS])
        lng1 = jnp.array([p[1] for p in CITY_PAIRS])
        lat2 = jnp.array([p[2] for p in CITY_PAIRS])
        lng2 = jnp.array([p[3] for p in CITY_PAIRS])
        d = np.asarray(great_circle_distance(lat1, lng1, lat2, lng2))
        for i, p in enumerate(CITY_PAIRS):
            assert abs(d[i] - p[4]) < p[5]

    def test_small_distance_precision(self):
        # ~111m apart: must resolve well below the 1 km threshold in fp32.
        d = float(great_circle_distance(48.0, 2.0, 48.001, 2.0))
        assert abs(d - 0.11119) < 0.002

    def test_symmetry(self):
        a = float(great_circle_distance(10, 20, -30, 140))
        b = float(great_circle_distance(-30, 140, 10, 20))
        assert abs(a - b) < 1e-3


class TestThresholdAccuracy:
    def test_exact_fractions(self):
        # distances ~ 0, 100, 500, 2000, 5000 km from (0,0) along equator
        # (1 deg lng at equator = 111.19 km).
        lngs = jnp.array([0.0, 100 / 111.19, 500 / 111.19, 2000 / 111.19,
                          5000 / 111.19])
        zeros = jnp.zeros(5)
        acc = np.asarray(
            gcd_threshold_accuracy(zeros, lngs, zeros, zeros)
        )
        # thresholds 1,25,200,750,2500 → hits: 1,1,2,3,4 of 5
        np.testing.assert_allclose(acc, [0.2, 0.2, 0.4, 0.6, 0.8], atol=1e-6)

    def test_valid_mask(self):
        zeros = jnp.zeros(4)
        valid = jnp.array([True, True, False, False])
        counts, total = gcd_threshold_counts(zeros, zeros, zeros, zeros,
                                             valid=valid)
        assert int(total) == 2
        np.testing.assert_array_equal(np.asarray(counts), [2] * 5)

    def test_boundary_inclusive(self):
        # exactly at threshold counts as within (<=)
        d_1km_lng = 1.0 / (2 * np.pi * 6371.0 / 360.0)
        acc = np.asarray(
            gcd_threshold_accuracy(
                jnp.zeros(1), jnp.array([d_1km_lng]), jnp.zeros(1), jnp.zeros(1)
            )
        )
        assert acc[0] >= 0.99  # fp32 rounding may land a hair either side

    def test_accumulator(self):
        acc = GcdAccumulator()
        zeros = jnp.zeros(3)
        c1, t1 = gcd_threshold_counts(zeros, jnp.array([0.0, 3.0, 50.0]),
                                      zeros, zeros)
        acc.update(c1, t1)
        acc.update(c1, t1)
        res = acc.result()
        assert res[1.0] == pytest.approx(1 / 3)
        assert res[2500.0] == pytest.approx(2 / 3)
        assert set(res) == {1.0, 25.0, 200.0, 750.0, 2500.0}
