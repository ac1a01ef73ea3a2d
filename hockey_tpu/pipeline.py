"""Pipeline orchestration: the VideoProcessor.

Behavioral parity with reference hockey/main.py:144-384 (same stages, same
defaults), restructured TPU-first:

- Detection runs on frame *batches*: `config.frame_batch` frames are
  decoded ahead, pushed through one jitted megastep (letterbox -> YOLO ->
  NMS on device), and the sequential host stages (tracking, team vote,
  annotation) consume the padded results in order. Detection throughput
  scales with batch while ID assignment semantics stay frame-sequential
  (SURVEY.md §5 "temporal batching").
- Processing modes (reference README.md:134-139; absent from its code):
  PLAYER_DETECTION, PLAYER_TRACKING, TEAM_CLASSIFICATION (the reference
  main-path behavior), PUCK_DETECTION (slicing/sahi.py).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

import numpy as np

from .annotate.draw import make_annotators
from .annotate.smooth import SmoothAnnotator
from .core.config import (
    GOALIE_TEAM_ID,
    GOALKEEPER_CLASS_ID,
    PLAYER_CLASS_ID,
    Config,
    ProcessingMode,
)
from .models.detector import Detector, HostDetections
from .teams.facade import TeamClassifier
from .tracking.bytetrack import ByteTrack
from .ui.team_selector import InteractiveTeamSelector
from .utils.metrics import StageTimers
from .video.io import VideoInfo, batched_frame_generator, frame_generator


class VideoProcessor:
    """Reference-compatible orchestrator (hockey/main.py:144-354)."""

    def __init__(
        self,
        config: Optional[Config] = None,
        device: str = "tpu",
        enable_rink_keypoints: bool = False,
        mode: ProcessingMode = ProcessingMode.TEAM_CLASSIFICATION,
        frame_hw: Tuple[int, int] = (1080, 1920),
        checkpoint: Optional[str] = None,
        rink_checkpoint: Optional[str] = None,
        puck_checkpoint: Optional[str] = None,
        team_names: Optional[Tuple[str, str]] = None,
        show_2d_map: bool = False,
        calibration_profile: Optional[str] = None,
        seed: int = 0,
        player_detector=None,  # injectable (tests use stub/tiny detectors)
    ):
        self.config = config or Config()
        self.device = device
        self.mode = ProcessingMode(mode)
        self.frame_hw = frame_hw
        self.timers = StageTimers()
        self.last_frame_result = None  # set per frame in tracking modes

        # TEAM_CLASSIFICATION fuses per-detection team features into the
        # detection megastep: one device call per frame batch
        fuse_teams = self.mode == ProcessingMode.TEAM_CLASSIFICATION
        want_rink = enable_rink_keypoints or show_2d_map
        # with rink keypoints on, both models share ONE dual megastep
        self.use_dual = want_rink and player_detector is None \
            and self.mode != ProcessingMode.PUCK_DETECTION
        self.rink_detector = None
        if self.use_dual:
            from .models.dual import DualDetector

            self.player_detector = DualDetector(
                self.config, frame_hw=frame_hw, checkpoint=checkpoint,
                rink_checkpoint=rink_checkpoint,
                with_team_features=fuse_teams, seed=seed,
            )
            print("Rink keypoint detection enabled (dual megastep)")
        else:
            self.player_detector = player_detector or Detector(
                self.config.player_model_name, self.config, frame_hw=frame_hw,
                checkpoint=checkpoint, seed=seed, with_team_features=fuse_teams,
            )
            if want_rink:
                from .homography.keypoints import RinkKeypointDetector

                self.rink_detector = RinkKeypointDetector(
                    self.config.hockey_model_name, self.config,
                    frame_hw=frame_hw, checkpoint=rink_checkpoint,
                )
                print("Rink keypoint detection enabled")

        # 2D overhead map (--show-2d-map, README.md:128; no reference code)
        self.show_2d_map = show_2d_map
        self.rink_renderer = None
        self.calibrator = None
        if show_2d_map:
            from .homography.calibrator import CalibratorState
            from .rinkmap.renderer import RinkRenderer

            self.rink_renderer = RinkRenderer(config=self.config)
            self.calibrator = CalibratorState(frame_hw=frame_hw)
            if calibration_profile:
                self.calibrator.load_profile(calibration_profile)

        self.puck_pipeline = None
        if self.mode == ProcessingMode.PUCK_DETECTION:
            from .slicing.sahi import PuckPipeline

            self.puck_pipeline = PuckPipeline(
                self.config, frame_hw=frame_hw, checkpoint=puck_checkpoint,
            )

        self.team_classifier = TeamClassifier(device=device)
        self.team_selector = InteractiveTeamSelector(headless_names=team_names)
        use_device_tracker = self.config.use_device_tracker
        if use_device_tracker is None:  # auto: fuse tracking into the
            # batched megastep on accelerator backends (one program per
            # frame batch, one host transfer); host Hungarian elsewhere
            import jax

            use_device_tracker = (
                jax.default_backend() not in ("cpu",)
                and self.config.resolved_frame_batch() > 1
                and hasattr(self.player_detector, "detect_track_batch")
                and self.mode in (ProcessingMode.PLAYER_TRACKING,
                                  ProcessingMode.TEAM_CLASSIFICATION)
            )
        self.use_fused_tracker = bool(use_device_tracker) and hasattr(
            self.player_detector, "detect_track_batch")
        if use_device_tracker:
            from .tracking.device_tracker import DeviceByteTrack

            self.tracker = DeviceByteTrack(
                capacity=self.config.max_tracks,
                track_activation_threshold=self.config.track_activation_threshold,
                lost_track_buffer=self.config.lost_track_buffer,
                minimum_matching_threshold=self.config.minimum_matching_threshold,
                frame_rate=self.config.frame_rate,
                minimum_consecutive_frames=self.config.minimum_consecutive_frames,
                # duplicate suppression (COMPAT #27/#29) — without these
                # the sequential device path ran stock ByteTrack while
                # the fused batched path (detector.py tracker_kwargs) and
                # the host fallback applied the kills: measured gen-B
                # id_stability 0.444 sequential vs 0.778 host/fused
                # (logs/r4_measure2.log)
                duplicate_kill_iomin=self.config.duplicate_kill_iomin,
                lost_dup_kill_iomin=self.config.lost_dup_kill_iomin,
            )
        else:
            self.tracker = ByteTrack.from_config(self.config)

        box_ann, self.label_annotator = make_annotators(self.config)
        self.smooth_annotator = SmoothAnnotator(
            box_ann,
            smoothing_factor=self.config.smoothing_factor,
            use_adaptive=self.config.use_adaptive_smoothing,
        )

        self.ocr = None  # attached by PLAYER_TRACKING mode when available
        if self.mode == ProcessingMode.PLAYER_TRACKING:
            from .ocr.jersey import JerseyNumberReader

            self.ocr = JerseyNumberReader()

    # ------------------------------------------------------------------
    def detect_players(self, frame: np.ndarray) -> HostDetections:
        """Single-frame detection (reference main.py:177-195: conf filter
        and class filter to {player, goalie} happen inside the megastep /
        here)."""
        det = self.player_detector.detect(frame)
        keep = (det.classes == PLAYER_CLASS_ID) | (det.classes == GOALKEEPER_CLASS_ID)
        keep &= det.scores > self.config.detection_confidence
        return HostDetections(det.boxes[keep], det.scores[keep], det.classes[keep])

    def _crops(self, frame: np.ndarray, boxes: np.ndarray) -> List[np.ndarray]:
        out = []
        h, w = frame.shape[:2]
        for b in boxes:
            x1, y1, x2, y2 = (max(int(b[0]), 0), max(int(b[1]), 0),
                              min(int(b[2]), w), min(int(b[3]), h))
            out.append(frame[y1:y2, x1:x2])
        return out

    @staticmethod
    def _positions(boxes: np.ndarray) -> List[Tuple[float, float]]:
        return [((b[0] + b[2]) / 2.0, (b[1] + b[3]) / 2.0) for b in boxes]

    # ------------------------------------------------------------------
    def initialize_team_classifier(self, source_path: str) -> None:
        """One-time fit over strided sample frames (reference main.py:
        197-257: stride 10, <= 21 frames, first frame with >= 6 tracked
        players drives the selection UI)."""
        print("Initializing team classification...")
        crops: List[np.ndarray] = []
        positions: List[Tuple[float, float]] = []
        first_frame = None
        first_boxes = None
        first_ids = None

        temp_tracker = ByteTrack.from_config(self.config, minimum_consecutive_frames=1)
        gen = frame_generator(source_path, stride=self.config.initialization_stride)
        for i, frame in enumerate(gen):
            if i > self.config.max_initialization_frames:
                break
            det = self.detect_players(frame)
            pmask = det.classes == PLAYER_CLASS_ID
            pboxes, pscores = det.boxes[pmask], det.scores[pmask]
            tb, ts, tc, tids = temp_tracker.update(pboxes, pscores,
                                                   det.classes[pmask])
            if first_frame is None and len(tids) >= self.config.min_players_for_selection:
                first_frame, first_boxes, first_ids = frame, tb, tids
            crops.extend(self._crops(frame, pboxes))
            positions.extend(self._positions(pboxes))

        selection = None
        if first_frame is not None:
            selection = self.team_selector.select_teams(first_frame, first_boxes, first_ids)
        if selection:
            self.team_classifier.set_team_names(selection.team_names)
            print(f"Teams set: {selection.team_names[0]} vs {selection.team_names[1]}")
        else:
            print("Team selection cancelled, using default team names")

        self.team_classifier.fit(
            crops, positions=positions, frame=first_frame,
            detections=(first_boxes, first_ids) if first_frame is not None else None,
        )
        print("Classifier fitted.")

    # ------------------------------------------------------------------
    def process_frame(self, frame: np.ndarray,
                      det: Optional[HostDetections] = None,
                      team_feats: Optional[np.ndarray] = None,
                      rink_kpts: Optional[np.ndarray] = None,
                      pretracked=None) -> np.ndarray:
        """One frame through the mode's host stages. `det` carries batched
        megastep output when the caller pre-detected; None falls back to a
        single-frame device call (reference-sequential behavior).
        `team_feats` (n, 4) rows align with `det` when the megastep fused
        team features (or with `pretracked` rows when tracking was fused
        too); `rink_kpts` (56, 3) is this frame's row of the dual
        megastep's keypoint output. `pretracked` = (boxes, scores,
        classes, tracker_ids) from the fused detect+track megastep —
        detection and association both already happened on device."""
        if self.mode == ProcessingMode.PUCK_DETECTION:
            return self.puck_pipeline.process_frame(frame)

        if pretracked is None and det is None:
            with self.timers.stage("detect"):
                det = self.detect_players(frame)
                if self.use_dual and rink_kpts is None:
                    rink_kpts = self.player_detector.last_keypoints[0]
        if det is not None:
            self.timers.count("detections", len(det))

        if self.mode == ProcessingMode.PLAYER_DETECTION:
            with self.timers.stage("annotate"):
                lookup = np.where(det.classes == GOALKEEPER_CLASS_ID,
                                  GOALIE_TEAM_ID, 0).astype(np.int32)
                labels = ["Goalie" if c == GOALKEEPER_CLASS_ID else "Player"
                          for c in det.classes]
                out = self.smooth_annotator.annotator.annotate(
                    frame.copy(), det.boxes, lookup)
                return self.label_annotator.annotate(out, det.boxes, labels, lookup)

        if pretracked is not None:
            boxes, scores, classes, tids = pretracked
            self.timers.count("detections", len(boxes))
        else:
            with self.timers.stage("track"):
                boxes, scores, classes, tids = self.tracker.update(
                    det.boxes, det.scores, det.classes)
        self.timers.count("tracks", len(tids))

        pmask = classes == PLAYER_CLASS_ID
        gmask = classes == GOALKEEPER_CLASS_ID

        if self.mode == ProcessingMode.PLAYER_TRACKING:
            labels = []
            for i in range(len(boxes)):
                tag = f"#{tids[i]}"
                if self.ocr is not None and pmask[i]:
                    num = self.ocr.get_number(int(tids[i]))
                    if num is not None:
                        tag = f"#{tids[i]} ({num})"
                labels.append("Goalie " + tag if gmask[i] else tag)
            if self.ocr is not None and pmask.any():
                self.ocr.observe(frame, boxes[pmask], tids[pmask])
            lookup = np.where(gmask, GOALIE_TEAM_ID, 0).astype(np.int32)
        else:  # TEAM_CLASSIFICATION — the reference main path
            player_team_ids = np.array([], dtype=np.int64)
            if pmask.any():
                with self.timers.stage("teams"):
                    if (team_feats is not None
                            and self.team_classifier.supports_fused_features()):
                        # fused path: features came out of the megastep;
                        # pretracked rows are already aligned, otherwise
                        # join via the tracker's detection indices
                        tf = (team_feats if pretracked is not None
                              else team_feats[self.tracker.last_indices])[pmask]
                        player_team_ids = self.team_classifier.predict_features(
                            tf, tracker_ids=tids[pmask])
                    else:
                        player_team_ids = self.team_classifier.predict_from_frame(
                            frame, boxes[pmask], tracker_ids=tids[pmask],
                            positions=self._positions(boxes[pmask]),
                        )
            # merge order: players then goalies (reference main.py:287-288)
            order = np.concatenate([np.flatnonzero(pmask), np.flatnonzero(gmask)])
            boxes, scores, classes, tids = (boxes[order], scores[order],
                                            classes[order], tids[order])
            goalie_ids = np.full(int(gmask.sum()), GOALIE_TEAM_ID, np.int32)
            lookup = np.concatenate([
                player_team_ids.astype(np.int32), goalie_ids]) if len(player_team_ids) \
                else goalie_ids
            labels = [
                self.team_classifier.get_team_name(lookup[i])
                if classes[i] == PLAYER_CLASS_ID
                else "Goalie"
                for i in range(len(boxes))
            ]
            pmask = classes == PLAYER_CLASS_ID
            gmask = classes == GOALKEEPER_CLASS_ID

        kpts = None
        if self.rink_detector is not None or rink_kpts is not None:
            from .homography.keypoints import (
                RinkKeypointDetector,
                keypoints_from_array,
            )

            with self.timers.stage("keypoints"):
                if rink_kpts is not None:  # dual megastep already computed them
                    kpts = keypoints_from_array(
                        rink_kpts, self.config.keypoint_confidence_threshold)
                else:
                    kpts = self.rink_detector.detect_keypoints(
                        frame,
                        conf_threshold=self.config.keypoint_confidence_threshold)
                if kpts:
                    frame = RinkKeypointDetector.visualize_keypoints(
                        frame, kpts, radius=self.config.keypoint_radius,
                        show_labels=True)
                    self.timers.count("keypoints", len(kpts))

        # machine-readable per-frame result (boxes in frame px, tracker
        # ids, team/goalie lookup) for quality harnesses and API callers —
        # the annotated image is not the only output surface
        self.last_frame_result = {
            "boxes": np.asarray(boxes), "scores": np.asarray(scores),
            "classes": np.asarray(classes), "tracker_ids": np.asarray(tids),
            "team_ids": np.asarray(lookup),
        }

        with self.timers.stage("annotate"):
            out = self.smooth_annotator.annotate(
                frame.copy(), boxes, tids, scores, lookup)
            out = self.label_annotator.annotate(out, boxes, labels, lookup)

        if self.show_2d_map and kpts is not None:
            with self.timers.stage("rink2d"):
                from .rinkmap.renderer import bottom_center_anchors

                h = self.calibrator.process_frame(frame, kpts)
                q = self.calibrator.last_quality
                if q is not None:  # homography quality -> --json-metrics
                    self.timers.gauge("homography_inlier_ratio",
                                      q.inlier_ratio)
                    self.timers.gauge("homography_reproj_error_ft",
                                      q.mean_reprojection_error)
                    self.timers.gauge("homography_points", q.n_points)
                    self.timers.gauge(
                        "homography_tier",
                        {"fine": 2.0, "coarse": 1.0}.get(
                            self.calibrator.stabilizer.current_tier, 0.0))
                if h is not None:
                    rink_map = self.rink_renderer.render(
                        h, bottom_center_anchors(boxes), lookup)
                    out = self.rink_renderer.overlay(out, rink_map)
        return out

    # ------------------------------------------------------------------
    def process_video(self, source_path: str, start_frame: int = 0,
                      skip_init: bool = False) -> Iterator[np.ndarray]:
        """Frame stream: one-time classifier init, then detect in device
        batches and run host stages in order (reference main.py:315-322,
        batched). `start_frame`/`skip_init` support checkpoint resume
        (core/session.py)."""
        if self.mode == ProcessingMode.TEAM_CLASSIFICATION and not skip_init:
            self.initialize_team_classifier(source_path)

        b = self.config.resolved_frame_batch()
        if self.use_dual:
            # the dual (player@1280 + rink@512 + team features) program at
            # batch 128 costs a ~20 min XLA compile; batch 32 compiles in
            # minutes and the rink path is not the throughput-critical one
            b = min(b, 32)
        if self.mode == ProcessingMode.PUCK_DETECTION and b > 1:
            # cross-frame tiled megastep: K frames x T tiles through one
            # forward + one merge program per batch (slicing/sahi.py)
            from .video.io import prefetched

            pb = min(b, 16)
            for frames, n in prefetched(batched_frame_generator(
                    source_path, pb, start=start_frame)):
                with self.timers.stage("detect"):
                    boxes, scores, valid = (
                        self.puck_pipeline.detect_batch(frames))
                for i in range(n):
                    with self.timers.stage("annotate"):
                        o = self.puck_pipeline.annotate_frame(
                            frames[i], boxes, scores, valid, i)
                    yield o
            return
        if self.mode == ProcessingMode.PUCK_DETECTION or b == 1:
            for frame in frame_generator(source_path, start=start_frame):
                yield self.process_frame(frame)
            return

        from .video.io import prefetched

        if self.use_fused_tracker:
            yield from self._process_video_fused(source_path, b, start_frame)
            return

        fused = getattr(self.player_detector, "with_team_features", False)
        for frames, n in prefetched(
                batched_frame_generator(source_path, b, start=start_frame)):
            with self.timers.stage("detect"):
                out = self.player_detector.detect_batch(frames)
                batch_det, batch_feats = out if fused else (out, None)
                valid = np.asarray(batch_det.valid)
                dets = [HostDetections.from_padded(batch_det, i) for i in range(n)]
                feats_np = None if batch_feats is None else np.asarray(batch_feats)
            kpts_np = (self.player_detector.last_keypoints
                       if self.use_dual else None)
            for i in range(n):
                d = dets[i]
                keep = ((d.classes == PLAYER_CLASS_ID)
                        | (d.classes == GOALKEEPER_CLASS_ID))
                keep &= d.scores > self.config.detection_confidence
                tf = None
                if feats_np is not None:
                    tf = feats_np[i][valid[i]][keep]
                yield self.process_frame(
                    frames[i],
                    HostDetections(d.boxes[keep], d.scores[keep], d.classes[keep]),
                    team_feats=tf,
                    rink_kpts=None if kpts_np is None else kpts_np[i],
                )

    def _process_video_fused(self, source_path: str, b: int,
                             start_frame: int) -> Iterator[np.ndarray]:
        """Fully fused device path: ONE program per frame batch covers
        letterbox -> YOLO -> NMS -> ByteTrack scan [-> team features];
        only final (boxes, ids, feats) cross to host, once per batch."""
        from .video.io import prefetched

        for frames, n in prefetched(
                batched_frame_generator(source_path, b, start=start_frame)):
            with self.timers.stage("detect"):
                out = self.player_detector.detect_track_batch(
                    frames, self.tracker.state)
                self.tracker.state = out[-1]
                rows = unpack_tracked(out)
            for i in range(n):
                yield self.process_frame(frames[i], pretracked=rows[i][:4],
                                         team_feats=rows[i][4])


def unpack_tracked(out) -> List[Tuple]:
    """Fused megastep output -> per-frame host rows: a list of
    (boxes, scores, classes, tids, team_feats | None), keeping only
    detections that acquired an emittable track id. Uses the single
    `packed` tensor when present (one device->host transfer per batch)."""
    det, feats, tids, packed, _state = out
    rows = []
    if packed is not None:
        arr = np.asarray(packed)
        for i in range(arr.shape[0]):
            keep = arr[i, :, 6] >= 0
            r = arr[i][keep]
            tf = r[:, 7:] if arr.shape[-1] > 7 else None
            rows.append((r[:, :4], r[:, 4], r[:, 5].astype(np.int32),
                         r[:, 6].astype(np.int32), tf))
        return rows
    boxes_np = np.asarray(det.boxes)
    scores_np = np.asarray(det.scores)
    classes_np = np.asarray(det.classes)
    tids_np = np.asarray(tids)
    feats_np = None if feats is None else np.asarray(feats)
    for i in range(boxes_np.shape[0]):
        keep = tids_np[i] >= 0
        tf = None if feats_np is None else feats_np[i][keep]
        rows.append((boxes_np[i][keep], scores_np[i][keep],
                     classes_np[i][keep], tids_np[i][keep], tf))
    return rows


def process_video_with_display(
    processor: VideoProcessor,
    source_path: str,
    target_path: Optional[str] = None,
    display: bool = True,
) -> int:
    """Reference main.py:362-384 behavior + headless `display=False`.
    Returns the number of frames written."""
    import cv2

    gen = processor.process_video(source_path)
    n = 0
    sink_ctx = None
    try:
        if target_path:
            info = VideoInfo.from_video_path(source_path)
            sink_ctx = VideoSinkWriter(target_path, info)
        for frame in gen:
            if sink_ctx is not None:
                sink_ctx.write(frame)
            n += 1
            if display:
                cv2.imshow("Hockey Vision", frame)
                if cv2.waitKey(1) & 0xFF == ord("q"):
                    break
    finally:
        if sink_ctx is not None:
            sink_ctx.close()
        if display:
            cv2.destroyAllWindows()
    return n


class VideoSinkWriter:
    def __init__(self, path: str, info: VideoInfo):
        from .video.io import VideoSink

        self._sink = VideoSink(path, info).__enter__()

    def write(self, frame: np.ndarray) -> None:
        self._sink.write_frame(frame)

    def close(self) -> None:
        self._sink.__exit__()
