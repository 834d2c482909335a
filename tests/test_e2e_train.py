"""End-to-end training smoke (SURVEY.md §7 integration gate): a few
optimizer steps on synthetic msgpack shards through the real
`classification.train_base` CLI, then consume the checkpoint with the
inference engine — the full train->checkpoint->infer loop."""

import io
import os

import numpy as np
import pytest
import yaml
from PIL import Image

from geoestimation_tpu.data import shards


def jpeg_bytes(rng, w=280, h=300):
    arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=85)
    return buf.getvalue()


@pytest.fixture(scope="module")
def train_world(tmp_path_factory, geo_parts):
    root = tmp_path_factory.mktemp("trainworld")
    rng = np.random.default_rng(0)
    # cells
    cell_files = []
    for p, fn in zip(geo_parts, ["cells_50_5000.csv", "cells_50_2000.csv",
                                 "cells_50_1000.csv"]):
        path = str(root / "cells" / fn)
        p.to_csv(path)
        cell_files.append(path)
    # shards: 2 train + 1 val, coordinates inside the (47.5-49.5, 1.5-3.5)
    # patch so labels exist for every partitioning
    for split, n_shards in [("train", 2), ("val", 1)]:
        for s in range(n_shards):
            recs = []
            for i in range(24):
                recs.append({
                    "id": f"{split}_{s}_{i}",
                    "image": jpeg_bytes(rng),
                    "lat": float(rng.uniform(47.6, 49.4)),
                    "lng": float(rng.uniform(1.6, 3.4)),
                })
            shards.write_shard(
                recs, str(root / split / f"shard_{s:05d}.msgpack")
            )
    config = {
        "model_params": {
            "arch": "resnet50",
            "dtype": "bfloat16",
            "partitionings": {
                "shortnames": ["coarse", "middle", "fine"],
                "files": cell_files,
            },
        },
        "train_params": {
            "batch_size": 8,
            "epochs": 1,
            "optimizer": {"name": "sgd", "lr": 0.01, "momentum": 0.9,
                          "weight_decay": 0.0001},
            "lr_schedule": {"name": "multistep", "milestones": [1],
                            "gamma": 0.5},
            "train_shards": [str(root / "train" / "*.msgpack")],
            "val_shards": [str(root / "val" / "*.msgpack")],
            "num_workers": 4,
            "checkpoint_dir": str(root / "ckpt"),
            "checkpoint_every_steps": 0,
            "log_every_steps": 1,
            "image_size": 64,
            "steps_per_epoch": 4,
        },
    }
    cfg_path = str(root / "smoke.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)
    return {"root": root, "config": cfg_path, "ckpt": str(root / "ckpt")}


class TestTrainCLI:
    def test_train_smoke_and_resume(self, train_world, capsys):
        from classification.train_base import main

        main(["--config", train_world["config"], "--max_steps", "3",
              "--cpu"])
        out = capsys.readouterr().out
        assert "step 3/" in out.replace("step 3 /", "step 3/")

        from geoestimation_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(train_world["ckpt"], async_save=False)
        assert mgr.latest_step() == 3
        mgr.close()
        assert os.path.exists(
            os.path.join(train_world["ckpt"], "hparams.yaml")
        )

        # resume: two more steps starting from step 3
        main(["--config", train_world["config"], "--max_steps", "5",
              "--cpu"])
        out = capsys.readouterr().out
        assert "resuming from step 3" in out
        mgr = CheckpointManager(train_world["ckpt"], async_save=False)
        assert mgr.latest_step() == 5
        mgr.close()

    def test_checkpoint_usable_for_inference(self, train_world, tmp_path):
        # consume the training checkpoint with the inference CLI
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        rng = np.random.default_rng(1)
        for i in range(3):
            arr = rng.integers(0, 255, (300, 280, 3), dtype=np.uint8)
            Image.fromarray(arr).save(img_dir / f"q_{i}.jpg", quality=90)

        from classification.inference import main

        out_csv = str(tmp_path / "preds.csv")
        main([
            "--checkpoint", train_world["ckpt"],
            "--image_dir", str(img_dir),
            "--output", out_csv,
            "--crops", "1",
            "--batch_size", "4",
        ])
        import pandas as pd

        df = pd.read_csv(out_csv)
        assert len(df) == 3 * 4
        assert set(df.p_key) == {"coarse", "middle", "fine", "hierarchy"}

    def test_isn_train_smoke(self, train_world, capsys):
        # ISN variant (BASELINE config 5): scene-gated training through
        # the Trainer; no scene labels in this world -> scene CE masked,
        # routing by predicted scene; loss must be finite and step.
        from geoestimation_tpu.train.loop import Trainer
        from geoestimation_tpu.utils.config import load_config

        config = load_config(train_world["config"])
        config.model_params.scene_gating = True
        config.train_params.checkpoint_dir = train_world["ckpt"] + "_isn"
        config.train_params.steps_per_epoch = 2
        trainer = Trainer(config)
        trainer.fit(max_steps=2)
        out = capsys.readouterr().out
        assert "step 2/2" in out

        # the ISN checkpoint round-trips through the inference engine
        import jax.numpy as jnp

        from geoestimation_tpu.eval.engine import InferenceEngine
        from geoestimation_tpu.train.checkpoint import load_for_inference

        cfg2, state = load_for_inference(config.train_params.checkpoint_dir)
        engine = InferenceEngine(cfg2, state, n_crops=1,
                                 dtype=jnp.bfloat16)
        import numpy as np

        imgs = np.zeros((2, 256, 256, 3), np.uint8)
        preds = engine.predict_batch(imgs)
        assert set(preds) == {"coarse", "middle", "fine", "hierarchy"}

    def test_scene_labels_flow_from_csv(self, train_world, tmp_path):
        # label CSV with a scene column reaches TrainBatch.scene
        import pandas as pd

        from geoestimation_tpu.data.loader import (
            ShardBatcher,
            load_label_csv,
        )
        from geoestimation_tpu.data.shards import iter_records

        root = train_world["root"]
        ids = [r["id"] for r in
               iter_records([str(root / "train" / "*.msgpack")])]
        df = pd.DataFrame({
            "IMG_ID": ids,
            "coarse": 0, "middle": 0, "fine": 0,
            "S3_Label": [i % 3 for i in range(len(ids))],
        })
        csv = tmp_path / "labels_scene.csv"
        df.to_csv(csv, index=False)
        label_map, scene_map = load_label_csv(
            str(csv), ["coarse", "middle", "fine"], with_scene=True
        )
        assert scene_map is not None
        b = ShardBatcher(
            [str(root / "train" / "*.msgpack")], batch_size=8,
            label_map=label_map, scene_map=scene_map, shuffle=False,
            repeat=False,
        )
        batch = next(iter(b))
        assert batch.scene is not None
        assert set(np.unique(batch.scene)) <= {0, 1, 2}

    def test_val_metrics_logged(self, train_world, capsys):
        # epoch-end validation computes val_loss + hierarchical GCD accs
        from geoestimation_tpu.train.loop import Trainer
        from geoestimation_tpu.utils.config import load_config

        config = load_config(train_world["config"])
        config.train_params.checkpoint_dir = train_world["ckpt"] + "_val"
        config.train_params.steps_per_epoch = 2
        trainer = Trainer(config)
        trainer.fit(max_steps=2)
        out = capsys.readouterr().out
        assert "val_loss" in out and "gcd@2500km" in out
