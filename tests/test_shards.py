"""Msgpack shard round-trip + loader tests (SURVEY.md §7)."""

import io

import numpy as np
import pytest
from PIL import Image

from geoestimation_tpu.data import shards
from geoestimation_tpu.data.loader import ShardBatcher, load_label_csv


def jpeg_bytes(seed, w=300, h=280):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=85)
    return buf.getvalue()


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("shards")
    n = 0
    for s in range(3):
        recs = []
        for i in range(20):
            recs.append({
                "id": f"img_{s}_{i}",
                "image": jpeg_bytes(n),
                "lat": 48.0 + 0.01 * n,
                "lng": 2.0 + 0.01 * n,
            })
            n += 1
        shards.write_shard(recs, str(root / f"shard_{s:05d}.msgpack"))
    return str(root), n


class TestShards:
    def test_roundtrip(self, shard_dir):
        root, n = shard_dir
        recs = list(shards.iter_records([f"{root}/*.msgpack"]))
        assert len(recs) == n
        assert all(isinstance(r["image"], bytes) for r in recs)
        assert recs[0]["id"] == "img_0_0"
        assert abs(recs[0]["lat"] - 48.0) < 1e-9

    def test_count(self, shard_dir):
        root, n = shard_dir
        assert shards.count_records([f"{root}/*.msgpack"]) == n

    def test_shuffle_changes_order_but_not_set(self, shard_dir):
        root, n = shard_dir
        a = [r["id"] for r in shards.iter_records([f"{root}/*.msgpack"],
                                                  shuffle=True, seed=1,
                                                  shuffle_buffer=8)]
        b = [r["id"] for r in shards.iter_records([f"{root}/*.msgpack"])]
        assert a != b
        assert sorted(a) == sorted(b)

    def test_tolerant_keys(self, tmp_path):
        # historical-style records with _id / latitude keys
        path = str(tmp_path / "legacy.msgpack")
        import msgpack

        with open(path, "wb") as f:
            f.write(msgpack.packb(
                {b"_id": b"x1", b"image": jpeg_bytes(99),
                 b"latitude": 1.5, b"longitude": 2.5},
            ))
            f.write(msgpack.packb({b"junk": b"no image"}))
        recs = list(shards.iter_records([path]))
        assert len(recs) == 1
        assert recs[0]["id"] == "x1"
        assert recs[0]["lat"] == 1.5

    def test_missing_pattern_raises(self):
        with pytest.raises(FileNotFoundError):
            list(shards.iter_records(["/nonexistent/*.msgpack"]))

    def test_host_sharding_partitions_shards(self, shard_dir):
        # per-host strided subsets are disjoint and cover everything
        root, n = shard_dir
        pat = [f"{root}/*.msgpack"]
        all_ids = {r["id"] for r in shards.iter_records(pat)}
        seen = []
        for h in range(3):
            ids = {r["id"] for r in shards.iter_records(
                pat, host_id=h, host_count=3)}
            seen.append(ids)
        assert set.union(*seen) == all_ids
        for a in range(3):
            for b in range(a + 1, 3):
                assert not (seen[a] & seen[b])

    def test_host_sharding_too_many_hosts(self, shard_dir):
        root, _ = shard_dir
        with pytest.raises(ValueError, match="no shards"):
            list(shards.iter_records([f"{root}/*.msgpack"], host_id=5,
                                     host_count=8))


class TestRandomAccess:
    def test_index_covers_all_records(self, shard_dir):
        root, n = shard_dir
        idx = shards.build_index([f"{root}/*.msgpack"])
        assert len(idx) == n

    def test_datasource_matches_sequential(self, shard_dir):
        root, n = shard_dir
        src = shards.MsgpackDataSource([f"{root}/*.msgpack"])
        seq = list(shards.iter_records([f"{root}/*.msgpack"]))
        assert len(src) == len(seq)
        for i in [0, 1, 17, n - 1]:
            assert src[i]["id"] == seq[i]["id"]
            assert src[i]["image"] == seq[i]["image"]
        src.close()

    def test_global_shuffle_exact_permutation(self, shard_dir):
        from geoestimation_tpu.data.loader import ShardBatcher

        root, n = shard_dir
        b = ShardBatcher(
            [f"{root}/*.msgpack"], batch_size=10, shuffle=True,
            shuffle_mode="global", repeat=False, seed=3,
            label_map={f"img_{s}_{i}": (0,) for s in range(3)
                       for i in range(20)},
        )
        ids = [i for tb in b for i in tb.ids]
        # padded final batch duplicates some ids; the set must be complete
        assert set(ids) == {f"img_{s}_{i}" for s in range(3)
                            for i in range(20)}
        # order differs from sequential
        seq_ids = [r["id"] for r in
                   shards.iter_records([f"{root}/*.msgpack"])]
        assert ids[:n] != seq_ids

    def test_grain_interop(self, shard_dir):
        gp = pytest.importorskip("grain.python")
        root, n = shard_dir
        src = shards.MsgpackDataSource([f"{root}/*.msgpack"])
        ds = gp.MapDataset.source(src).shuffle(seed=1)
        rec = ds[0]
        assert "image" in rec and "id" in rec
        assert len(ds) == n


class TestShardBatcher:
    def test_batches_from_latlng(self, shard_dir, geo_parts):
        root, n = shard_dir
        b = ShardBatcher(
            [f"{root}/*.msgpack"], batch_size=16,
            partitionings=geo_parts, shuffle=False, repeat=False,
        )
        batches = list(b)
        assert len(batches) == 4  # 60 records -> 3x16 + padded 12
        for tb in batches:
            assert tb.images.shape == (16, 256, 256, 3)
            assert tb.labels.shape == (len(geo_parts), 16)
            assert (tb.labels >= 0).all()  # all records in-cells here

    def test_label_csv_loader(self, tmp_path):
        path = tmp_path / "labels.csv"
        path.write_text(
            "IMG_ID,coarse,middle,fine\na.jpg,0,1,2\nb.jpg,3,4,5\n"
        )
        m = load_label_csv(str(path), ["coarse", "middle", "fine"])
        assert m["a.jpg"] == (0, 1, 2)
        assert m["b.jpg"] == (3, 4, 5)
        with pytest.raises(ValueError, match="missing column"):
            load_label_csv(str(path), ["coarse", "nope"])
