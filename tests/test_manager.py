"""ModelManager parity tests (reference main.py:62-87 semantics)."""

import pytest

from hockey_tpu.models.manager import ModelManager


class TestModelManager:
    def test_missing_checkpoint_raises(self, tmp_path):
        mm = ModelManager(data_dir=str(tmp_path))
        with pytest.raises(FileNotFoundError):
            mm.load_player_model()
        with pytest.raises(FileNotFoundError):
            mm.load_rink_detector()

    def test_existing_checkpoint_loads(self, tmp_path):
        from hockey_tpu.core.config import Config
        from hockey_tpu.models.checkpoint import save_params
        from hockey_tpu.models.yolov8 import YoloConfig, init_params

        cfg = Config(puck_model_name="hockey-puck-detection")
        # write a real (tiny-variant won't match zoo dims, so use zoo cfg)
        from hockey_tpu.models.yolov8 import MODEL_ZOO

        params = init_params(MODEL_ZOO["hockey-puck-detection"], seed=0)
        save_params(str(tmp_path / "hockey-puck-detection.msgpack"), params)
        mm = ModelManager(data_dir=str(tmp_path), config=cfg)
        pipe = mm.load_puck_pipeline(frame_hw=(256, 384))
        assert pipe is not None

    def test_random_init_allowed(self, tmp_path):
        mm = ModelManager(data_dir=str(tmp_path), allow_random_init=True)
        assert mm._checkpoint_for("anything") is None
