"""ModelManager: named-model loading with existence validation.

API parity with reference hockey/main.py:62-87 (`ModelManager.
load_player_model` / `load_rink_detector`, FileNotFoundError when the
checkpoint file is missing). Ours resolves `<data_dir>/<name>.msgpack`
checkpoints; a missing file raises like the reference unless
`allow_random_init=True` (useful in environments without trained weights,
like CI)."""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

from ..core.config import Config


class ModelManager:
    def __init__(self, data_dir: Optional[str] = None,
                 config: Optional[Config] = None,
                 allow_random_init: bool = False):
        self.config = config or Config()
        self.data_dir = Path(data_dir) if data_dir else Path("data")
        self.allow_random_init = allow_random_init
        self.player_model = None
        self.rink_detector = None
        self.puck_model = None

    def _checkpoint_for(self, name: str) -> Optional[str]:
        path = self.data_dir / f"{name}.msgpack"
        if path.exists():
            return str(path)
        if self.allow_random_init:
            return None
        raise FileNotFoundError(f"Model checkpoint not found: {path}")

    def load_player_model(self, device: str = "tpu",
                          frame_hw: Tuple[int, int] = (1080, 1920)):
        from .detector import Detector

        ckpt = self._checkpoint_for(self.config.player_model_name)
        self.player_model = Detector(
            self.config.player_model_name, self.config,
            frame_hw=frame_hw, checkpoint=ckpt,
        )
        return self.player_model

    def load_rink_detector(self, frame_hw: Tuple[int, int] = (1080, 1920)):
        from ..homography.keypoints import RinkKeypointDetector

        ckpt = self._checkpoint_for(self.config.hockey_model_name)
        self.rink_detector = RinkKeypointDetector(
            self.config.hockey_model_name, self.config,
            frame_hw=frame_hw, checkpoint=ckpt,
        )
        return self.rink_detector

    def load_puck_pipeline(self, frame_hw: Tuple[int, int] = (1080, 1920)):
        from ..slicing.sahi import PuckPipeline

        ckpt = self._checkpoint_for(self.config.puck_model_name)
        self.puck_model = PuckPipeline(self.config, frame_hw=frame_hw,
                                       checkpoint=ckpt)
        return self.puck_model
