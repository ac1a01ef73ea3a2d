"""hockey_tpu — TPU-native hockey video analytics framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
JetJadeja/hockey-vision-analytics (reference at /root/reference):

- YOLOv8 player/goalie detection (reference: hockey/main.py:177-195) as a
  batched, jit-compiled NHWC forward pass with on-device decode + NMS.
- ByteTrack multi-object tracking (reference delegates to sv.ByteTrack,
  hockey/main.py:162-168) reimplemented with vectorized Kalman filters.
- Team classification strategy cascade (reference: hockey/common/team.py)
  with device-batched feature extraction.
- Annotation smoothing stabilizers (reference: hockey/common/
  {smooth_annotator,detection_stabilizer*,adaptive_size_stabilizer}.py).
- 56-keypoint rink detection + RANSAC homography + 2D rink map
  (reference: hockey/common/rink_keypoint_detector.py + README spec).
- SAHI-style sliced puck detection as one batched device call
  (documented in reference README.md:44 / CLAUDE.md:55; no code exists).

Design: everything per-frame numerical runs on device with static shapes
(padded, masked); host keeps video I/O, interactivity, and tiny-N
combinatorics. Multi-chip scaling is data-parallel frame batching over a
`jax.sharding.Mesh` (the reference is strictly single-process).
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (avoids importing jax/cv2 until first use)."""
    _exports = {
        "Config": ("hockey_tpu.core.config", "Config"),
        "ProcessingMode": ("hockey_tpu.core.config", "ProcessingMode"),
        "VideoProcessor": ("hockey_tpu.pipeline", "VideoProcessor"),
        "MultiClipProcessor": ("hockey_tpu.multiclip", "MultiClipProcessor"),
        "Detector": ("hockey_tpu.models.detector", "Detector"),
        "ModelManager": ("hockey_tpu.models.manager", "ModelManager"),
        "ByteTrack": ("hockey_tpu.tracking.bytetrack", "ByteTrack"),
        "TeamClassifier": ("hockey_tpu.teams.facade", "TeamClassifier"),
        "RinkKeypointDetector": ("hockey_tpu.homography.keypoints",
                                 "RinkKeypointDetector"),
        "ViewTransformer": ("hockey_tpu.homography.view", "ViewTransformer"),
        "RinkRenderer": ("hockey_tpu.rinkmap.renderer", "RinkRenderer"),
        "PuckPipeline": ("hockey_tpu.slicing.sahi", "PuckPipeline"),
        "PuckTracker": ("hockey_tpu.slicing.sahi", "PuckTracker"),
    }
    if name in _exports:
        import importlib

        module, attr = _exports[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'hockey_tpu' has no attribute {name!r}")
