"""Host-side video decode/encode.

Replaces the reference's supervision helpers (sv.get_video_frames_generator
/ sv.VideoSink / sv.VideoInfo — hockey/main.py:214-217, 321, 371-374) with
direct OpenCV, plus a batched reader that feeds whole frame batches to the
device megastep.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional

import cv2
import numpy as np


@dataclasses.dataclass
class VideoInfo:
    width: int
    height: int
    fps: float
    total_frames: int

    @classmethod
    def from_video_path(cls, path: str) -> "VideoInfo":
        cap = cv2.VideoCapture(path)
        if not cap.isOpened():
            raise FileNotFoundError(f"Cannot open video: {path}")
        info = cls(
            width=int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            height=int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
            fps=float(cap.get(cv2.CAP_PROP_FPS)) or 30.0,
            total_frames=int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
        )
        cap.release()
        return info


def frame_generator(path: str, stride: int = 1, start: int = 0,
                    limit: Optional[int] = None) -> Iterator[np.ndarray]:
    """Yield BGR frames; `stride` skips frames like the reference's
    initialization sampling (main.py:214-217)."""
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"Cannot open video: {path}")
    try:
        idx = 0
        yielded = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                return
            if idx >= start and (idx - start) % stride == 0:
                yield frame
                yielded += 1
                if limit is not None and yielded >= limit:
                    return
            idx += 1
    finally:
        cap.release()


def batched_frame_generator(path: str, batch: int, stride: int = 1,
                            start: int = 0) -> Iterator[np.ndarray]:
    """Yield (B, H, W, 3) uint8 batches; the final batch is padded by
    repeating its last frame so device shapes stay static (callers get the
    true count via the second tuple element)."""
    buf: List[np.ndarray] = []
    for frame in frame_generator(path, stride=stride, start=start):
        buf.append(frame)
        if len(buf) == batch:
            yield np.stack(buf), batch
            buf = []
    if buf:
        n = len(buf)
        while len(buf) < batch:
            buf.append(buf[-1])
        yield np.stack(buf), n


def prefetched(generator, depth: int = 2):
    """Run a generator on a background thread with a bounded queue so host
    video decode overlaps device compute (the reference decodes inline on
    the single processing thread)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for item in generator:
                q.put(item)
            q.put(_END)
        except BaseException as e:  # propagate decode failures to the consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


class VideoSink:
    """mp4 writer (reference: sv.VideoSink)."""

    def __init__(self, path: str, info: VideoInfo):
        self.path = path
        self.info = info
        self._writer: Optional[cv2.VideoWriter] = None

    def __enter__(self) -> "VideoSink":
        self._writer = cv2.VideoWriter(
            self.path,
            cv2.VideoWriter_fourcc(*"mp4v"),
            self.info.fps,
            (self.info.width, self.info.height),
        )
        return self

    def write_frame(self, frame: np.ndarray) -> None:
        self._writer.write(frame)

    def __exit__(self, *a) -> None:
        if self._writer is not None:
            self._writer.release()
