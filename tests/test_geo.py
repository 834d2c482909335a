"""Tests for Partitioning / Hierarchy / create_cells (SURVEY.md §7 unit plan:
"create_cells on a tiny synthetic lat/lng CSV with hand-checked splits;
Hierarchy ancestor maps (every fine cell's ancestor containment)")."""

import numpy as np
import pytest

from geoestimation_tpu.geo import s2
from geoestimation_tpu.geo.create_cells import assign_classes, create_cells
from geoestimation_tpu.geo.hierarchy import Hierarchy, ancestor_map
from geoestimation_tpu.geo.partitioning import (
    Partitioning,
    load_partitionings,
    shortname_from_filename,
)

RNG = np.random.default_rng(42)


def synthetic_dataset(n=6000):
    """Clustered points: a few dense cities + uniform noise."""
    cities = [
        (40.7128, -74.0060),   # NYC
        (48.8566, 2.3522),     # Paris
        (35.6762, 139.6503),   # Tokyo
        (-33.8688, 151.2093),  # Sydney
    ]
    lats, lngs = [], []
    per = n // (len(cities) + 1)
    for clat, clng in cities:
        lats.append(clat + RNG.normal(0, 0.3, per))
        lngs.append(clng + RNG.normal(0, 0.3, per))
    lats.append(RNG.uniform(-60, 70, n - per * len(cities)))
    lngs.append(RNG.uniform(-180, 180, n - per * len(cities)))
    return np.concatenate(lats), np.concatenate(lngs)


@pytest.fixture(scope="module")
def parts():
    lat, lng = synthetic_dataset()
    coarse = create_cells(lat, lng, img_min=20, img_max=2000, name="coarse")
    middle = create_cells(lat, lng, img_min=20, img_max=800, name="middle")
    fine = create_cells(lat, lng, img_min=20, img_max=300, name="fine")
    return lat, lng, [coarse.partitioning, middle.partitioning,
                      fine.partitioning]


class TestCreateCells:
    def test_split_and_drop_invariants(self, parts):
        lat, lng, ps = parts
        for p, img_max in zip(ps, [2000, 800, 300]):
            assert len(p) > 0
            assert np.all(p.counts >= 20)
            assert np.all(p.counts <= img_max)
            assert np.all(p.levels >= 2)

    def test_granularity_ordering(self, parts):
        _, _, (c, m, f) = parts
        assert len(c) < len(m) < len(f)

    def test_no_nested_cells_within_one_partitioning(self, parts):
        # A partitioning is a disjoint cover: no cell may be an ancestor of
        # another cell in the same partitioning.
        _, _, ps = parts
        for p in ps:
            idset = set(p.cell_ids.tolist())
            for cid, lvl in zip(p.cell_ids, p.levels):
                for anc_level in range(int(lvl)):
                    anc = int(s2.parent_at_level(cid, anc_level))
                    assert anc not in idset

    def test_mean_latlng_inside_reasonable_range(self, parts):
        _, _, ps = parts
        for p in ps:
            assert np.all(np.abs(p.lat) <= 90)
            assert np.all(np.abs(p.lng) <= 180)

    def test_single_point_repeated(self):
        # 100 identical points with img_max=50: cell splits until lvl_max cap,
        # since identical points can never separate. Use small lvl_max.
        lat = np.full(100, 10.0)
        lng = np.full(100, 20.0)
        res = create_cells(lat, lng, img_min=1, img_max=50, lvl_min=2,
                           lvl_max=8)
        assert len(res.partitioning) == 1
        assert res.partitioning.levels[0] == 8
        assert res.partitioning.counts[0] == 100


class TestPartitioningIO:
    def test_csv_roundtrip(self, parts, tmp_path):
        _, _, (c, _, _) = parts
        path = tmp_path / "cells_20_2000.csv"
        c.to_csv(str(path))
        back = Partitioning.from_csv(str(path))
        np.testing.assert_array_equal(back.tokens, c.tokens)
        np.testing.assert_array_equal(back.cell_ids, c.cell_ids)
        np.testing.assert_array_equal(back.counts, c.counts)
        np.testing.assert_allclose(back.lat, c.lat, rtol=0, atol=0)
        np.testing.assert_allclose(back.lng, c.lng, rtol=0, atol=0)

    def test_header_aliases(self, tmp_path):
        path = tmp_path / "alt.csv"
        path.write_text(
            "class,token,count,lat,lon\n0,89c25,10,40.7,-74.0\n1,47e66,5,48.8,2.3\n"
        )
        p = Partitioning.from_csv(str(path))
        assert len(p) == 2
        assert p.class_of_token("89c25") == 0
        assert p.get_lat_lng(1) == (48.8, 2.3)

    def test_shortnames(self):
        assert shortname_from_filename("x/cells_50_5000.csv") == "coarse"
        assert shortname_from_filename("cells_50_2000.csv") == "middle"
        assert shortname_from_filename("cells_50_1000.csv") == "fine"
        assert shortname_from_filename("foo.csv") == "foo"

    def test_load_partitionings(self, parts, tmp_path):
        _, _, ps = parts
        paths = []
        for p, nm in zip(ps, ["cells_50_5000.csv", "cells_50_2000.csv",
                              "cells_50_1000.csv"]):
            path = str(tmp_path / nm)
            p.to_csv(path)
            paths.append(path)
        loaded = load_partitionings(paths)
        assert [p.name for p in loaded] == ["coarse", "middle", "fine"]


class TestHierarchy:
    def test_ancestor_containment(self, parts):
        # Every fine cell's mapped ancestor must actually contain it.
        _, _, (c, m, f) = parts
        h = Hierarchy.build([c, m, f])
        assert h.maps[0].shape == (len(f),)
        assert np.all(h.valid)  # same data -> every fine cell has ancestors
        for k, coarse in enumerate([c, m]):
            amap = h.maps[k]
            for i in range(len(f)):
                anc_id = coarse.cell_ids[amap[i]]
                anc_level = int(coarse.levels[amap[i]])
                assert int(
                    s2.parent_at_level(f.cell_ids[i], anc_level)
                ) == int(anc_id)

    def test_identity_last_map(self, parts):
        _, _, ps = parts
        h = Hierarchy.build(ps)
        np.testing.assert_array_equal(
            h.maps[-1], np.arange(len(ps[-1]), dtype=np.int32)
        )

    def test_deepest_ancestor_selected(self, parts):
        # ancestor_map must pick the deepest containing cell, not just any.
        _, _, (c, m, f) = parts
        amap = ancestor_map(f, m)
        for i in range(len(f)):
            fid = f.cell_ids[i]
            mapped_level = int(m.levels[amap[i]])
            for deeper in range(int(f.levels[i]), mapped_level, -1):
                assert m.class_of_id(int(s2.parent_at_level(fid, deeper))) < 0


class TestAssignClasses:
    def test_assign_matches_partitioning(self, parts):
        lat, lng, ps = parts
        labels = assign_classes(lat[:500], lng[:500], ps)
        assert labels.shape == (3, 500)
        # Check against brute force for a sample of points.
        for pi, p in enumerate(ps):
            for i in range(0, 500, 50):
                leaf = s2.latlng_to_cell_id(lat[i], lng[i])
                expect = -1
                for level in range(30, -1, -1):
                    cls = p.class_of_id(int(s2.parent_at_level(leaf, level)))
                    if cls >= 0:
                        expect = cls
                        break
                assert labels[pi, i] == expect

    def test_points_in_kept_cells_have_labels(self, parts):
        lat, lng, ps = parts
        labels = assign_classes(lat, lng, ps)
        # Most points are in kept cells (only drop-cell points unassigned).
        for pi, p in enumerate(ps):
            frac = np.mean(labels[pi] >= 0)
            assert frac > 0.8
