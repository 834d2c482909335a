"""Config system + checkpoint manager unit tests (SURVEY.md §5)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from geoestimation_tpu.train.checkpoint import (
    CheckpointManager,
    load_for_inference,
    read_hparams,
    save_single,
    write_hparams,
)
from geoestimation_tpu.utils.config import (
    Config,
    LRScheduleConfig,
    load_config,
    save_config,
)


class TestConfig:
    def test_defaults(self):
        c = Config()
        assert c.model_params.arch == "resnet50"
        assert list(c.model_params.partitionings.shortnames) == [
            "coarse", "middle", "fine"
        ]
        assert c.train_params.optimizer.name == "sgd"

    def test_yaml_roundtrip(self, tmp_path):
        c = Config()
        c.model_params.arch = "resnet101"
        c.train_params.optimizer.lr = 0.05
        path = str(tmp_path / "c.yml")
        save_config(c, path)
        back = load_config(path)
        assert back.model_params.arch == "resnet101"
        assert back.train_params.optimizer.lr == 0.05

    def test_unknown_key_rejected(self, tmp_path):
        path = tmp_path / "bad.yml"
        path.write_text("model_params:\n  archh: resnet50\n")
        with pytest.raises(ValueError, match="unknown config key 'archh'"):
            load_config(str(path))

    def test_partial_yaml_fills_defaults(self, tmp_path):
        path = tmp_path / "partial.yml"
        path.write_text("train_params:\n  batch_size: 32\n")
        c = load_config(str(path))
        assert c.train_params.batch_size == 32
        assert c.train_params.epochs == 15
        assert c.model_params.arch == "resnet50"


class TestCheckpointManager:
    def tiny_state(self, v=0.0):
        return {
            "params": {"w": np.full((4, 4), v, np.float32)},
            "batch_stats": {"m": np.zeros(3, np.float32)},
            "opt_state": {},
            "step": int(v),
        }

    def test_save_restore_roundtrip(self, tmp_path):
        d = str(tmp_path / "ck")
        save_single(d, self.tiny_state(2.0), config=Config(), step=2)
        mgr = CheckpointManager(d, async_save=False)
        state = mgr.restore(2)
        np.testing.assert_array_equal(state["params"]["w"],
                                      np.full((4, 4), 2.0))
        assert state["step"] == 2
        mgr.close()

    def test_best_by_val_loss(self, tmp_path):
        d = str(tmp_path / "ck")
        mgr = CheckpointManager(d, max_to_keep=2, async_save=False)
        for step, vl in [(1, 5.0), (2, 3.0), (3, 4.0)]:
            mgr.save(step, self.tiny_state(step),
                     metrics={"val_loss": vl})
        mgr.wait()
        assert mgr.best_step() == 2
        # retention keeps the best even though max_to_keep=2
        state = mgr.restore(mgr.best_step())
        assert state["step"] == 2
        mgr.close()

    def test_hparams_bundling(self, tmp_path):
        d = str(tmp_path / "ck")
        c = Config()
        c.model_params.arch = "resnet101"
        save_single(d, self.tiny_state(), config=c, step=0)
        assert os.path.exists(os.path.join(d, "hparams.yaml"))
        back = read_hparams(d)
        assert back.model_params.arch == "resnet101"
        cfg, state = load_for_inference(d)
        assert cfg.model_params.arch == "resnet101"
        assert "params" in state

    def test_explicit_hparams_path(self, tmp_path):
        d = str(tmp_path / "ck")
        save_single(d, self.tiny_state(), config=Config(), step=0)
        alt = tmp_path / "alt_hparams.yaml"
        c = Config()
        c.model_params.arch = "resnet152"
        write_hparams(str(tmp_path), c)
        os.rename(tmp_path / "hparams.yaml", alt)
        cfg = read_hparams(d, hparams_path=str(alt))
        assert cfg.model_params.arch == "resnet152"


class TestAccuracyTable:
    def test_format(self):
        from geoestimation_tpu.eval.engine import format_accuracy_table

        results = {
            "hierarchy": {1.0: 0.101, 25.0: 0.280, 200.0: 0.369,
                          750.0: 0.511, 2500.0: 0.670},
            "coarse": {1.0: 0.062, 25.0: 0.243, 200.0: 0.363,
                       750.0: 0.517, 2500.0: 0.670},
            "_n_images_without_meta": 3,
        }
        table = format_accuracy_table(results, dataset_name="im2gps3k")
        lines = table.splitlines()
        assert lines[0] == "== im2gps3k"
        assert "1 km" in lines[1] and "2500 km" in lines[1]
        # coarse printed before hierarchy, _meta key skipped
        assert lines[2].startswith("coarse")
        assert lines[3].startswith("hierarchy")
        assert "10.1" in lines[3] and "67.0" in lines[3]
