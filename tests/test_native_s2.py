"""C++ S2 extension vs the numpy reference implementation."""

import os
import subprocess

import numpy as np
import pytest

from geoestimation_tpu.geo import s2

CPP_DIR = os.path.join(os.path.dirname(__file__), "..",
                       "geoestimation_tpu", "geo", "cpp")


@pytest.fixture(scope="module")
def native_mod():
    build = subprocess.run(["make", "-C", CPP_DIR], capture_output=True,
                           text=True)
    if build.returncode != 0:
        pytest.skip(f"native s2 build failed: {build.stderr[-500:]}")
    import geoestimation_tpu.geo.native as native

    native._TRIED = False
    native._LIB = None
    if not native.available():
        pytest.skip("native s2 .so not loadable")
    return native


RNG = np.random.default_rng(7)


def _numpy_leaf_ids(lat, lng):
    """The pure-numpy pipeline, bypassing s2.latlng_to_cell_id's native
    dispatch (which at >= _NATIVE_MIN_N points would compare native to
    itself)."""
    face, u, v = s2.xyz_to_face_uv(s2.latlng_to_xyz(lat, lng))
    return s2.from_face_ij(
        face, s2.st_to_ij(s2.uv_to_st(u)), s2.st_to_ij(s2.uv_to_st(v))
    )


class TestNativeS2:
    def test_latlng_to_cell_id(self, native_mod):
        lat = RNG.uniform(-89.9, 89.9, 20000)
        lng = RNG.uniform(-180, 180, 20000)
        np.testing.assert_array_equal(
            native_mod.latlng_to_cell_id(lat, lng),
            _numpy_leaf_ids(lat, lng),
        )

    def test_parent_and_level(self, native_mod):
        lat = RNG.uniform(-89.9, 89.9, 5000)
        lng = RNG.uniform(-180, 180, 5000)
        ids = s2.latlng_to_cell_id(lat, lng)
        for level in [0, 2, 13, 30]:
            np.testing.assert_array_equal(
                native_mod.parent_at_level(ids, level),
                s2.parent_at_level(ids, level),
            )
        np.testing.assert_array_equal(
            native_mod.cell_level(s2.parent_at_level(ids, 13)),
            np.full(5000, 13),
        )

    def test_center_latlng(self, native_mod):
        lat = RNG.uniform(-89.9, 89.9, 5000)
        lng = RNG.uniform(-180, 180, 5000)
        for level in [2, 9, 30]:
            ids = s2.parent_at_level(s2.latlng_to_cell_id(lat, lng), level)
            nlat, nlng = native_mod.cell_id_to_latlng(ids)
            plat, plng = s2.cell_id_to_latlng(ids)
            np.testing.assert_allclose(nlat, plat, atol=1e-12)
            np.testing.assert_allclose(nlng, plng, atol=1e-12)

    def test_eiffel_token(self, native_mod):
        cid = native_mod.latlng_to_cell_id(np.array([48.8584]),
                                           np.array([2.2945]))[0]
        assert s2.id_to_token(cid).startswith("47e66")
