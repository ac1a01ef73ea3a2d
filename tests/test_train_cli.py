"""Train/val CLI smokes (tiny configs; exercise the full argv surface)."""

import numpy as np
import pytest


class TestTrainLoopCLI:
    def test_train_and_val_round_trip(self, tmp_path):
        from hockey_tpu.train.loop import main as train_main
        from hockey_tpu.train.val import main as val_main

        out = str(tmp_path / "m.msgpack")
        rc = train_main([
            "--model", "hockey-puck-detection", "--variant", "n",
            "--imgsz", "64", "--batch", "2", "--steps", "3",
            "--log-every", "1", "--out", out, "--save-every", "0",
            "--mosaic", "0.5", "--mixup", "0.2",
        ])
        assert rc == 0
        import os

        assert os.path.exists(out)
        # note: checkpoint is n-variant; val builds the zoo (s) config but
        # the forward uses the loaded tree, and decode dims (nc/reg_max)
        # agree across variants
        rc = val_main([
            "--model", "hockey-puck-detection", "--checkpoint", out,
            "--imgsz", "64", "--limit", "2", "--json",
        ])
        assert rc == 0

    def test_pose_variant_uses_rink_dataset(self, tmp_path, capsys):
        from hockey_tpu.train.loop import main as train_main

        out = str(tmp_path / "p.msgpack")
        rc = train_main([
            "--model", "hockey-detection", "--variant", "n",
            "--imgsz", "64", "--batch", "2", "--steps", "2",
            "--log-every", "1", "--out", out, "--save-every", "0",
        ])
        assert rc == 0
        assert "synthetic rink views" in capsys.readouterr().out
