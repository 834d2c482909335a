"""Unit tests for the vectorized S2 implementation.

Strategy (SURVEY.md §7): geometric invariants and round-trips. There is no
s2sphere in the environment to diff against, so correctness rests on
(a) exact algebraic identities (token/parent/children/level round trips),
(b) geometric round trips (lat/lng -> leaf cell -> center within leaf size),
(c) known fixed points of the cube projection (face centers/corners).
"""

import numpy as np
import pytest

from geoestimation_tpu.geo import s2


RNG = np.random.default_rng(0)


def random_latlng(n):
    # Stay away from the exact poles where lng is degenerate.
    lat = RNG.uniform(-89.9, 89.9, n)
    lng = RNG.uniform(-180.0, 180.0, n)
    return lat, lng


class TestProjection:
    def test_face_centers(self):
        # Face cell centers: +x face center is (lat=0, lng=0); +z is the
        # north pole; -x is lat=0 lng=180.
        face_ids = np.array(
            [(f << s2.POS_BITS) | (1 << (s2.POS_BITS - 1)) for f in range(6)],
            dtype=np.uint64,
        )
        assert np.all(s2.cell_level(face_ids) == 0)
        lat, lng = s2.cell_id_to_latlng(face_ids)
        np.testing.assert_allclose(lat[0], 0, atol=1e-12)
        np.testing.assert_allclose(lng[0], 0, atol=1e-12)
        np.testing.assert_allclose(lat[1], 0, atol=1e-12)
        np.testing.assert_allclose(lng[1], 90, atol=1e-12)
        np.testing.assert_allclose(lat[2], 90, atol=1e-12)
        np.testing.assert_allclose(np.abs(lng[3]), 180, atol=1e-12)
        np.testing.assert_allclose(lat[4], 0, atol=1e-12)
        np.testing.assert_allclose(lng[4], -90, atol=1e-12)
        np.testing.assert_allclose(lat[5], -90, atol=1e-12)

    def test_face_tokens(self):
        face_ids = np.array(
            [(f << s2.POS_BITS) | (1 << (s2.POS_BITS - 1)) for f in range(6)],
            dtype=np.uint64,
        )
        assert list(s2.id_to_token(face_ids)) == ["1", "3", "5", "7", "9", "b"]

    def test_uv_st_roundtrip(self):
        u = RNG.uniform(-1, 1, 1000)
        np.testing.assert_allclose(s2.st_to_uv(s2.uv_to_st(u)), u, atol=1e-14)

    def test_xyz_face_uv(self):
        lat, lng = random_latlng(1000)
        xyz = s2.latlng_to_xyz(lat, lng)
        face, u, v = s2.xyz_to_face_uv(xyz)
        assert np.all((face >= 0) & (face < 6))
        assert np.all(np.abs(u) <= 1 + 1e-12)
        assert np.all(np.abs(v) <= 1 + 1e-12)
        back = s2.face_uv_to_xyz(face, u, v)
        back /= np.linalg.norm(back, axis=-1, keepdims=True)
        np.testing.assert_allclose(back, xyz, atol=1e-12)


class TestCellIds:
    def test_leaf_roundtrip_latlng(self):
        lat, lng = random_latlng(5000)
        ids = s2.latlng_to_cell_id(lat, lng)
        assert np.all(s2.is_leaf(ids))
        assert np.all(s2.cell_level(ids) == 30)
        clat, clng = s2.cell_id_to_latlng(ids)
        # Leaf cells are ~1cm across: centers within ~1e-6 degrees.
        np.testing.assert_allclose(clat, lat, atol=1e-6)
        dlng = np.abs(clng - lng)
        dlng = np.minimum(dlng, 360 - dlng)
        assert np.all(dlng * np.cos(np.deg2rad(lat)) < 1e-6)

    def test_face_ij_roundtrip(self):
        lat, lng = random_latlng(2000)
        face, u, v = s2.xyz_to_face_uv(s2.latlng_to_xyz(lat, lng))
        i = s2.st_to_ij(s2.uv_to_st(u))
        j = s2.st_to_ij(s2.uv_to_st(v))
        ids = s2.from_face_ij(face, i, j)
        f2, i2, j2 = s2.to_face_ij(ids)
        np.testing.assert_array_equal(f2, face)
        np.testing.assert_array_equal(i2, i)
        np.testing.assert_array_equal(j2, j)

    def test_token_roundtrip(self):
        lat, lng = random_latlng(500)
        ids = s2.latlng_to_cell_id(lat, lng)
        for level in [0, 1, 5, 12, 30]:
            pids = s2.parent_at_level(ids, level)
            toks = s2.id_to_token(pids)
            np.testing.assert_array_equal(s2.token_to_id(toks), pids)
            # Token length: 1 hex digit face+level0, leaf = 16 digits.
            if level == 30:
                assert all(len(t) == 16 for t in toks)

    def test_parent_levels(self):
        lat, lng = random_latlng(500)
        ids = s2.latlng_to_cell_id(lat, lng)
        for level in [0, 3, 10, 29]:
            p = s2.parent_at_level(ids, level)
            assert np.all(s2.cell_level(p) == level)
            # Parent is an ancestor: re-parenting the child at the parent's
            # level gives the parent.
            np.testing.assert_array_equal(s2.parent_at_level(ids, level), p)

    def test_parent_is_prefix(self):
        # A child's position bits start with the parent's position bits.
        lat, lng = random_latlng(200)
        ids = s2.latlng_to_cell_id(lat, lng)
        p10 = s2.parent_at_level(ids, 10)
        p11 = s2.parent_at_level(ids, 11)
        np.testing.assert_array_equal(s2.parent_at_level(p11, 10), p10)

    def test_children(self):
        lat, lng = random_latlng(300)
        parents = s2.parent_at_level(s2.latlng_to_cell_id(lat, lng), 8)
        kids = s2.children(parents)
        assert kids.shape == parents.shape + (4,)
        assert np.all(s2.cell_level(kids) == 9)
        for k in range(4):
            np.testing.assert_array_equal(
                s2.parent_at_level(kids[:, k], 8), parents
            )
        # children are distinct
        assert np.all(np.diff(kids.astype(np.int64), axis=1) != 0)

    def test_children_cover_parent_points(self):
        # Every point's level-9 cell is one of the children of its level-8
        # cell.
        lat, lng = random_latlng(1000)
        leaf = s2.latlng_to_cell_id(lat, lng)
        p8 = s2.parent_at_level(leaf, 8)
        p9 = s2.parent_at_level(leaf, 9)
        kids = s2.children(p8)
        assert np.all(np.any(kids == p9[:, None], axis=1))

    def test_center_inside_cell(self):
        # The center of a cell, re-projected to a leaf id, has that cell as
        # ancestor.
        lat, lng = random_latlng(500)
        for level in [2, 7, 15, 25]:
            cells = s2.parent_at_level(s2.latlng_to_cell_id(lat, lng), level)
            clat, clng = s2.cell_id_to_latlng(cells)
            back = s2.parent_at_level(s2.latlng_to_cell_id(clat, clng), level)
            np.testing.assert_array_equal(back, cells)

    def test_scalar_inputs(self):
        cid = s2.latlng_to_cell_id(48.8584, 2.2945)  # Eiffel Tower
        assert s2.cell_level(cid) == 30
        tok = s2.id_to_token(cid)
        assert s2.token_to_id(tok) == cid

    def test_zero_token(self):
        assert s2.id_to_token(np.uint64(0)) == "X"
        assert s2.token_to_id("X") == 0
