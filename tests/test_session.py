"""Checkpoint/resume tests: run state round-trips and IDs survive resume."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from hockey_tpu.core.config import ProcessingMode
from hockey_tpu.core.session import load_run_state, save_run_state
from hockey_tpu.pipeline import VideoProcessor
from tests.test_pipeline import StubDetector, make_frame, small_config


@pytest.fixture(autouse=True)
def headless_env(monkeypatch):
    monkeypatch.setenv("HOCKEY_TPU_HEADLESS", "1")


def make_proc(mode=ProcessingMode.PLAYER_TRACKING):
    return VideoProcessor(config=small_config(), mode=mode, frame_hw=(360, 640),
                          player_detector=StubDetector(), team_names=("A", "B"))


class TestRunState:
    def test_tracker_ids_survive_resume(self, tmp_path):
        p1 = make_proc()
        for i in range(6):
            p1.process_frame(make_frame(i))
        ids_before = sorted(t.track_id for t in p1.tracker.tracks)
        state = str(tmp_path / "run.state")
        save_run_state(state, p1, frame_idx=6)

        p2 = make_proc()
        resumed_at = load_run_state(state, p2)
        assert resumed_at == 6
        ids_after = sorted(t.track_id for t in p2.tracker.tracks)
        assert ids_after == ids_before
        # continuing assigns the same ids to the same targets
        p2.player_detector.frame_idx = 6
        p2.process_frame(make_frame(6))
        assert sorted(t.track_id for t in p2.tracker.tracks
                      if t.time_since_update == 0) == ids_before

    def test_team_fit_state_round_trips(self, tmp_path, rng):
        from tests.test_teams import RED, WHITE, make_crop

        p1 = make_proc(ProcessingMode.TEAM_CLASSIFICATION)
        crops = [make_crop(WHITE, noise=8, rng=rng) for _ in range(10)] + \
                [make_crop(RED, noise=8, rng=rng) for _ in range(10)]
        p1.team_classifier.fit(crops)
        p1.team_classifier.set_team_names({0: "TOR", 1: "DET"})
        state = str(tmp_path / "run.state")
        save_run_state(state, p1, frame_idx=42)

        p2 = make_proc(ProcessingMode.TEAM_CLASSIFICATION)
        assert load_run_state(state, p2) == 42
        assert p2.team_classifier.get_team_name(0) == "TOR"
        # fitted kmeans transfers: predictions work without refit
        teams = p2.team_classifier.predict(
            [make_crop(WHITE, noise=8, rng=rng), make_crop(RED, noise=8, rng=rng)])
        assert list(teams) == [0, 1]

    def test_version_check(self, tmp_path):
        import pickle

        bad = str(tmp_path / "bad.state")
        with open(bad, "wb") as f:
            pickle.dump({"version": 999}, f)
        with pytest.raises(ValueError):
            load_run_state(bad, make_proc())


class TestCLIResume:
    def test_cli_save_and_resume(self, tmp_path, monkeypatch):
        import hockey_tpu.cli.main as cli
        import hockey_tpu.pipeline as pl
        from tests.test_pipeline import H, W

        monkeypatch.setattr(pl, "Detector", lambda *a, **k: StubDetector())
        clip = str(tmp_path / "clip.mp4")
        w = cv2.VideoWriter(clip, cv2.VideoWriter_fourcc(*"mp4v"), 30, (W, H))
        for i in range(30):
            w.write(make_frame(i))
        w.release()

        state = str(tmp_path / "run.state")
        rc = cli.main(["--source_path", clip, "--mode", "PLAYER_TRACKING",
                       "--headless", "--limit-frames", "10",
                       "--save-state", state])
        assert rc == 0
        rc = cli.main(["--source_path", clip, "--mode", "PLAYER_TRACKING",
                       "--headless", "--resume", state,
                       "--limit-frames", "5"])
        assert rc == 0
