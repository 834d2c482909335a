"""Regression tests for the round-1 code-review findings."""

import io
import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest
from PIL import Image

from geoestimation_tpu.data import shards
from geoestimation_tpu.data.loader import ShardBatcher


def jpg(seed=0, w=64, h=64):
    arr = np.random.default_rng(seed).integers(0, 255, (h, w, 3),
                                               dtype=np.uint8)
    b = io.BytesIO()
    Image.fromarray(arr).save(b, format="JPEG")
    return b.getvalue()


class TestProducerErrorPropagation:
    def test_corrupt_shard_raises_not_truncates(self, tmp_path):
        shards.write_shard(
            [{"id": f"a{i}", "image": jpg(i)} for i in range(4)],
            str(tmp_path / "good.msgpack"),
        )
        (tmp_path / "zz_corrupt.msgpack").write_bytes(b"\xc1\xc1garbage")
        b = ShardBatcher(
            [str(tmp_path / "*.msgpack")], batch_size=2,
            label_map={f"a{i}": (0,) for i in range(4)},
            shuffle=False, repeat=False,
        )
        with pytest.raises(Exception):
            list(b)

    def test_image_folder_error_propagates(self, tmp_path, monkeypatch):
        from geoestimation_tpu.data import image_folder

        d = tmp_path / "imgs"
        d.mkdir()
        (d / "x.jpg").write_bytes(jpg())

        def boom(*a, **k):
            raise RuntimeError("decoder exploded")

        monkeypatch.setattr(image_folder.decode, "decode_batch", boom)
        with pytest.raises(RuntimeError, match="decoder exploded"):
            list(image_folder.iter_image_folder(str(d), batch_size=2))


class TestEmptyEpochFailsLoudly:
    def test_fit_raises_on_zero_batches(self, tmp_path, geo_parts):
        import yaml

        from geoestimation_tpu.train.loop import Trainer
        from geoestimation_tpu.utils.config import Config

        shards.write_shard(
            [{"id": f"a{i}", "image": jpg(i)} for i in range(8)],
            str(tmp_path / "s.msgpack"),
        )
        # label CSV whose ids DON'T match the shards
        labels = tmp_path / "labels.csv"
        pd.DataFrame({
            "IMG_ID": [f"WRONG{i}" for i in range(8)],
            "coarse": 0, "middle": 0, "fine": 0,
        }).to_csv(labels, index=False)
        cells = []
        for p, fn in zip(geo_parts, ["c.csv", "m.csv", "f.csv"]):
            path = str(tmp_path / fn)
            p.to_csv(path)
            cells.append(path)
        config = Config()
        config.model_params.partitionings.files = cells
        config.train_params.batch_size = 4
        config.train_params.steps_per_epoch = 2
        config.train_params.train_shards = [str(tmp_path / "s.msgpack")]
        config.train_params.train_labels = str(labels)
        config.train_params.val_shards = []
        config.train_params.checkpoint_dir = str(tmp_path / "ck")
        config.train_params.image_size = 32
        trainer = Trainer(config)
        with pytest.raises(RuntimeError, match="no batches"):
            trainer.fit(max_steps=2, resume=False)


class TestValidationPaddingMasked:
    def test_mask_padding_flags_duplicates(self, tmp_path):
        shards.write_shard(
            [{"id": f"a{i}", "image": jpg(i), "lat": 1.0, "lng": 2.0}
             for i in range(5)],
            str(tmp_path / "s.msgpack"),
        )
        b = ShardBatcher(
            [str(tmp_path / "s.msgpack")], batch_size=4,
            label_map={f"a{i}": (0,) for i in range(5)},
            shuffle=False, repeat=False, mask_padding=True,
        )
        batches = list(b)
        assert len(batches) == 2
        last = batches[-1]
        # 1 real record tiled to 4: labels of 3 padded entries masked
        assert (last.labels[:, 0] >= 0).all()
        assert (last.labels[:, 1:] == -1).all()
        assert np.isnan(last.latlng[1:, 0]).all()


class TestMetricsLoggerEvolvingFields:
    def test_val_fields_not_dropped(self, tmp_path):
        from geoestimation_tpu.utils.logging import MetricsLogger

        logger = MetricsLogger(str(tmp_path), tensorboard=False,
                               stdout=lambda s: None)
        logger.log(1, {"loss": 2.0}, prefix="train/")
        logger.log(1, {"val_loss": 3.0}, prefix="val/")
        logger.close()
        df = pd.read_csv(tmp_path / "metrics.csv")
        assert "val/val_loss" in df.columns
        assert df["val/val_loss"].dropna().tolist() == [3.0]

    def test_resume_keeps_alignment(self, tmp_path):
        from geoestimation_tpu.utils.logging import MetricsLogger

        l1 = MetricsLogger(str(tmp_path), tensorboard=False,
                           stdout=lambda s: None)
        l1.log(1, {"loss": 2.0}, prefix="train/")
        l1.close()
        l2 = MetricsLogger(str(tmp_path), tensorboard=False,
                           stdout=lambda s: None)
        l2.log(2, {"loss": 1.0, "lr": 0.1}, prefix="train/")
        l2.close()
        df = pd.read_csv(tmp_path / "metrics.csv")
        assert len(df) == 2
        assert df["train/loss"].tolist() == [2.0, 1.0]


class TestOptimWarmupGuard:
    def test_milestone_inside_warmup_rejected(self):
        from geoestimation_tpu.train.optim import multistep_schedule

        with pytest.raises(ValueError, match="inside"):
            multistep_schedule(1.0, [1, 2, 12], 0.5, steps_per_epoch=10,
                               warmup_epochs=2.0)


class TestPartitioningLabelGaps:
    def test_gapped_class_labels_rejected(self, tmp_path):
        from geoestimation_tpu.geo import Partitioning

        path = tmp_path / "gap.csv"
        path.write_text(
            "class_label,hex_id,imgs_per_cell,latitude_mean,longitude_mean\n"
            "0,11,5,1.0,2.0\n1,13,5,1.0,2.0\n3,15,5,1.0,2.0\n"
        )
        with pytest.raises(ValueError, match="permutation"):
            Partitioning.from_csv(str(path))


class TestCropScale:
    def test_random_resized_crop_shapes_and_determinism(self):
        from geoestimation_tpu.ingest.pipeline import (
            random_resized_crop_flip,
            train_pipeline,
        )

        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.integers(0, 255, (4, 64, 64, 3),
                                        dtype=np.uint8))
        out = random_resized_crop_flip(jax.random.PRNGKey(0), imgs,
                                       crop=48, scale=(0.66, 1.0))
        assert out.shape == (4, 48, 48, 3)
        assert float(out.min()) >= 0 and float(out.max()) <= 255
        # scale=(1,1) degenerates to fixed-size behavior via train_pipeline
        out2 = train_pipeline(jax.random.PRNGKey(0), imgs, crop=48,
                              dtype=jnp.float32, crop_scale=(0.66, 1.0))
        assert out2.shape == (4, 48, 48, 3)

    def test_scale_jitter_changes_content_vs_fixed(self):
        from geoestimation_tpu.ingest.pipeline import (
            random_crop_flip,
            random_resized_crop_flip,
        )

        rng = np.random.default_rng(1)
        imgs = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3),
                                        dtype=np.uint8))
        outs = set()
        for seed in range(5):
            o = random_resized_crop_flip(jax.random.PRNGKey(seed), imgs,
                                         crop=48, scale=(0.5, 1.0))
            outs.add(float(jnp.abs(o).sum()))
        assert len(outs) > 1  # different scales/offsets across seeds
