"""Data-preparation CLI coverage: create_cells, assign_classes,
filter_by_downloaded_images, download_images helpers, demo world tool,
metrics logger."""

import io
import os
import sys

import numpy as np
import pandas as pd
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def meta_csv(tmp_path_factory):
    root = tmp_path_factory.mktemp("prep")
    lat = np.concatenate([48.85 + RNG.normal(0, .3, 800),
                          40.7 + RNG.normal(0, .3, 800)])
    lng = np.concatenate([2.35 + RNG.normal(0, .3, 800),
                          -74.0 + RNG.normal(0, .3, 800)])
    ids = [f"img_{i:05d}" for i in range(1600)]
    path = root / "meta.csv"
    pd.DataFrame({"IMG_ID": ids, "LAT": lat, "LON": lng}).to_csv(
        path, index=False
    )
    return str(path), str(root)


class TestCreateCellsCLI:
    def test_main(self, meta_csv, capsys):
        from partitioning.create_cells import main

        meta, root = meta_csv
        out = os.path.join(root, "cells_10_500.csv")
        main(["--dataset", meta, "--output", out, "--img_min", "10",
              "--img_max", "500"])
        printed = capsys.readouterr().out
        assert "cells" in printed
        from geoestimation_tpu.geo import Partitioning

        p = Partitioning.from_csv(out)
        assert len(p) > 2
        assert np.all(p.counts <= 500)

    def test_bad_column(self, meta_csv):
        from partitioning.create_cells import main

        meta, root = meta_csv
        with pytest.raises(SystemExit, match="column"):
            main(["--dataset", meta, "--output", "/tmp/x.csv",
                  "--column_lat", "NOPE"])


class TestAssignClassesCLI:
    def test_main(self, meta_csv, capsys):
        from partitioning.assign_classes import main
        from partitioning.create_cells import main as cc_main

        meta, root = meta_csv
        cells = []
        for mx in (1000, 400):
            out = os.path.join(root, f"cells_10_{mx}.csv")
            cc_main(["--dataset", meta, "--output", out, "--img_min",
                     "10", "--img_max", str(mx)])
            cells.append(out)
        out_labels = os.path.join(root, "labels.csv")
        main(["--dataset", meta, "--output", out_labels,
              "--cell_files", *cells, "--drop_unassigned"])
        df = pd.read_csv(out_labels)
        assert "IMG_ID" in df.columns
        assert len(df.columns) == 3  # IMG_ID + 2 partitioning columns
        assert (df.iloc[:, 1:] >= 0).all().all()


class TestFilterCLI:
    def test_main(self, tmp_path, capsys):
        from filter_by_downloaded_images import main
        from geoestimation_tpu.data import shards

        def jpg():
            arr = RNG.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            b = io.BytesIO()
            Image.fromarray(arr).save(b, format="JPEG")
            return b.getvalue()

        shards.write_shard(
            [{"id": f"a{i}", "image": jpg()} for i in range(5)],
            str(tmp_path / "s.msgpack"),
        )
        labels = tmp_path / "labels.csv"
        pd.DataFrame({
            "IMG_ID": [f"a{i}" for i in range(8)],
            "coarse": range(8),
        }).to_csv(labels, index=False)
        main(["--shards", str(tmp_path / "s.msgpack"),
              "--labels", str(labels)])
        out = pd.read_csv(tmp_path / "labels_filtered.csv")
        assert len(out) == 5
        assert set(out.IMG_ID) == {f"a{i}" for i in range(5)}


class TestDownloadHelpers:
    def test_size_suffix(self):
        from download_images import apply_size_suffix

        assert apply_size_suffix("http://x/y/12.jpg", "z") == \
            "http://x/y/12_z.jpg"
        assert apply_size_suffix("http://x/y/12.jpg", "") == \
            "http://x/y/12.jpg"

    def test_url_rows_with_header(self, tmp_path):
        from download_images import iter_url_rows

        p = tmp_path / "urls.csv"
        p.write_text("id,url\nA,http://h/a.jpg\nB,http://h/b.jpg\n")
        rows = list(iter_url_rows(str(p)))
        assert rows == [("A", "http://h/a.jpg"), ("B", "http://h/b.jpg")]


class TestDemoWorldTool:
    def test_generates_complete_world(self, tmp_path, capsys):
        from tools.make_demo_world import main

        out = str(tmp_path / "world")
        main(["--output", out, "--n_train", "32", "--n_eval", "4"])
        for rel in ["demo.yml", "train_labels.csv", "eval_meta.csv",
                    "resources/s2_cells/cells_50_1000.csv",
                    "shards", "eval_images"]:
            assert os.path.exists(os.path.join(out, rel)), rel
        labels = pd.read_csv(os.path.join(out, "train_labels.csv"))
        assert list(labels.columns) == ["IMG_ID", "coarse", "middle",
                                        "fine", "S3_Label"]


class TestMetricsLogger:
    def test_csv_and_stdout(self, tmp_path):
        from geoestimation_tpu.utils.logging import MetricsLogger

        lines = []
        logger = MetricsLogger(str(tmp_path), tensorboard=False,
                               stdout=lines.append)
        logger.log(1, {"loss": 2.5})
        logger.log(2, {"loss": 1.5})
        logger.close()
        assert any("loss 2.5" in l for l in lines)
        df = pd.read_csv(tmp_path / "metrics.csv")
        assert list(df.loss) == [2.5, 1.5]
        assert list(df.step) == [1, 2]
