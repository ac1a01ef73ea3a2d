"""TeamClassifier facade: the strategy cascade.

Behavioral parity with reference team.py:37-331:
- strategy priority: segmentation > interactive > robust > hybrid > simple
  (constructor flags use_*, all default True -> segmentation active);
- any fit/predict failure demotes to the next strategy and retries — the
  graceful-degradation contract is explicit here rather than purely
  exception-driven, but exceptions also demote (a classifier crash must
  never kill the video run, SURVEY.md §5);
- team-name registry with "Team 0"/"Team 1" defaults (set_team_names /
  get_team_name, team.py:312-331);
- label convention: 0 = away/white, 1 = home/colored.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

_ORDER = ["segmentation", "interactive", "robust", "hybrid", "simple"]


class TeamClassifier:
    def __init__(
        self,
        device: str = "tpu",
        batch_size: int = 32,
        use_hybrid: bool = True,
        use_robust: bool = True,
        use_interactive: bool = True,
        use_segmentation: bool = True,
        segmentation_method: str = "color_prior",
    ):
        self.device = device
        self.batch_size = batch_size
        self.segmentation_method = segmentation_method
        self.team_names: Dict[int, str] = {0: "Team 0", 1: "Team 1"}
        enabled = {
            "segmentation": use_segmentation,
            "interactive": use_interactive,
            "robust": use_robust,
            "hybrid": use_hybrid,
            "simple": True,
        }
        self._chain: List[str] = [s for s in _ORDER if enabled[s]]
        self._impl = None
        self._impl_name: Optional[str] = None
        self._activate(self._chain[0])
        self._fit_args = None

    # ------------------------------------------------------------------
    @property
    def active_strategy(self) -> str:
        return self._impl_name

    def _activate(self, name: str) -> None:
        if name == "segmentation":
            from .segmentation import SegmentationTeamClassifier

            self._impl = SegmentationTeamClassifier(
                self.device, visualize_segmentation=True,
                method=self.segmentation_method,
            )
        elif name == "interactive":
            from .interactive import InteractiveTeamClassifier

            self._impl = InteractiveTeamClassifier(self.device)
        elif name == "robust":
            from .robust import RobustTeamClassifier

            self._impl = RobustTeamClassifier(self.device)
        elif name == "hybrid":
            from .hybrid import HybridTeamClassifier

            self._impl = HybridTeamClassifier(self.device)
        else:
            from .simple import SimpleTeamClassifier

            self._impl = SimpleTeamClassifier()
        self._impl_name = name

    def _demote(self) -> bool:
        idx = self._chain.index(self._impl_name)
        if idx + 1 >= len(self._chain):
            return False
        self._activate(self._chain[idx + 1])
        return True

    # ------------------------------------------------------------------
    def fit(self, crops: List[np.ndarray], positions=None, frame=None,
            detections=None) -> None:
        """Fit the active strategy; demote and refit on failure."""
        self._fit_args = (crops, positions, frame, detections)
        while True:
            try:
                if self._impl_name == "interactive":
                    if frame is None or detections is None:
                        raise ValueError("Interactive classifier needs frame and detections")
                    ok = self._impl.initialize_from_user_selection(frame, detections)
                    if not ok:
                        raise RuntimeError("Interactive selection cancelled")
                elif self._impl_name == "hybrid":
                    self._impl.fit(crops, positions=positions)
                elif self._impl_name == "simple":
                    self._impl.fit(crops)
                else:
                    self._impl.fit(crops, positions=positions)
                return
            except Exception as e:
                print(f"{self._impl_name} classifier failed: {e}")
                if not self._demote():
                    return
                print(f"Falling back to {self._impl_name} classifier")

    def predict(self, crops, tracker_ids: Optional[np.ndarray] = None,
                positions=None) -> np.ndarray:
        if not len(crops):
            return np.array([])
        while True:
            try:
                if self._impl_name == "robust":
                    assignments = self._impl.predict(crops, tracker_ids, positions)
                    return self._impl.get_team_labels(assignments)
                if self._impl_name in ("interactive", "hybrid"):
                    return self._impl.predict(crops, tracker_ids)
                return self._impl.predict(crops, tracker_ids, positions)
            except Exception as e:
                print(f"{self._impl_name} prediction failed: {e}")
                if not self._demote():
                    raise
                print(f"Falling back to {self._impl_name} classifier")
                # refit the new strategy if we have the data for it
                if self._fit_args is not None and self._impl_name != "simple":
                    try:
                        c, p, f, d = self._fit_args
                        if self._impl_name == "interactive":
                            if f is not None and d is not None:
                                self._impl.initialize_from_user_selection(f, d)
                        elif self._impl_name == "hybrid":
                            self._impl.fit(c, positions=p)
                        else:
                            self._impl.fit(c, positions=p)
                    except Exception:
                        pass

    def supports_fused_features(self) -> bool:
        """True when the active strategy can classify the megastep's fused
        per-detection features directly (segmentation's 4-dim vector)."""
        return hasattr(self._impl, "predict_features")

    def predict_features(self, feats: np.ndarray,
                         tracker_ids: Optional[np.ndarray] = None) -> np.ndarray:
        return self._impl.predict_features(feats, tracker_ids)

    def predict_from_frame(self, frame: np.ndarray, boxes: np.ndarray,
                           tracker_ids: Optional[np.ndarray] = None,
                           positions=None) -> np.ndarray:
        """TPU fast path: device crop sampling when the active strategy
        supports it; otherwise host crops + the regular predict."""
        if hasattr(self._impl, "predict_from_frame"):
            try:
                return self._impl.predict_from_frame(frame, boxes, tracker_ids)
            except Exception as e:
                print(f"{self._impl_name} frame-predict failed: {e}")
        h, w = frame.shape[:2]
        crops = []
        for b in np.asarray(boxes).reshape(-1, 4):
            x1, y1 = max(int(b[0]), 0), max(int(b[1]), 0)
            x2, y2 = min(int(b[2]), w), min(int(b[3]), h)
            crops.append(frame[y1:y2, x1:x2])
        return self.predict(crops, tracker_ids, positions)

    # ------------------------------------------------------------------
    def get_segmentation_masks(self, tracker_ids) -> Optional[Dict[int, np.ndarray]]:
        if self._impl_name == "segmentation":
            return self._impl.get_segmentation_masks(tracker_ids)
        return None

    def set_team_names(self, team_names: Dict[int, str]) -> None:
        self.team_names.update(team_names)

    def get_team_name(self, team_id: int) -> str:
        return self.team_names.get(int(team_id), f"Team {team_id}")
