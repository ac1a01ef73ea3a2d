"""Jersey-number OCR, persisted per tracker id.

No reference code exists (documented in README.md:95-98 / CLAUDE.md:39,56 —
SURVEY.md §0); spec from the docs: EasyOCR reads numbers from jersey
crops, results are confidence-filtered and persisted per tracker ID so
numbers survive frames where they are unreadable.

Backends, in preference order:
1. easyocr, exactly as documented — when importable;
2. the owned JAX digit recognizer (ocr/digits.py) with its shipped
   synthetic-trained checkpoint — so the capability works in
   environments without easyocr (this one);
3. no-op (plain #id labels) if neither is available.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Optional

import numpy as np


class JerseyNumberReader:
    def __init__(self, min_confidence: float = 0.5, read_every_n: int = 10,
                 min_crop_height: int = 60, digit_params: Optional[Dict] = None):
        self.min_confidence = min_confidence
        self.read_every_n = read_every_n
        self.min_crop_height = min_crop_height
        self.numbers: Dict[int, str] = {}
        self.confidences: Dict[int, float] = defaultdict(float)
        # confidence-weighted vote tally per track: single reads can lock
        # in a wrong high-confidence glimpse; the persisted number is the
        # argmax of accumulated vote mass across the track's lifetime
        self.votes: Dict[int, Dict[str, float]] = defaultdict(
            lambda: defaultdict(float))
        self._since_read: Dict[int, int] = defaultdict(lambda: 10 ** 9)
        self._reader = None
        self.backend = None
        try:
            import easyocr  # optional dependency

            self._reader = easyocr.Reader(["en"], gpu=False, verbose=False)
            self.backend = "easyocr"
        except Exception:
            from . import digits

            if digit_params is False:  # explicitly disabled (tests)
                self._digit_params = None
            elif digit_params is not None:
                self._digit_params = digit_params
            else:
                self._digit_params = digits.load_default_params()
            if self._digit_params is not None:
                self.backend = "digits"
                # vote threshold tuned on sequence crops (scripts sim,
                # round 3): 0.45 maximizes per-track majority accuracy —
                # low-confidence reads are mostly right and the
                # conf-weighted vote suppresses the stragglers; a high
                # bar (0.72) starves tracks of votes entirely
                self.min_confidence = min(self.min_confidence, 0.45)
                # and it reads 48x48 normalized crops: smaller torsos than
                # easyocr's 60 px floor are usable, and cheap enough to
                # attempt twice as often (more votes per track). Measured
                # on gt torso crops (scene renderer, conf>=0.45 reads):
                # 24-34 px boxes 88% correct, 34-44 px 98% — the vote
                # absorbs the stragglers, so gate at 26 not 44
                self.min_crop_height = min(self.min_crop_height, 26)
                self.read_every_n = min(self.read_every_n, 5)
        self.available = self.backend is not None

    # ------------------------------------------------------------------
    def observe(self, frame: np.ndarray, boxes: np.ndarray,
                tracker_ids: np.ndarray) -> None:
        """Attempt OCR on due tracks' torso crops; keep the best-confidence
        digits per tracker id."""
        if not self.available:
            return
        h, w = frame.shape[:2]
        due_crops, due_tids = [], []
        for b, tid in zip(boxes, tracker_ids):
            tid = int(tid)
            self._since_read[tid] += 1
            if self._since_read[tid] < self.read_every_n:
                continue
            y1, y2 = max(int(b[1]), 0), min(int(b[3]), h)
            x1, x2 = max(int(b[0]), 0), min(int(b[2]), w)
            if y2 - y1 < self.min_crop_height:
                continue
            # torso region where numbers live
            ty1 = y1 + int((y2 - y1) * 0.2)
            ty2 = y1 + int((y2 - y1) * 0.6)
            crop = frame[ty1:ty2, x1:x2]
            if crop.size == 0:
                continue
            self._since_read[tid] = 0
            if self.backend == "digits":
                from . import digits

                due_crops.append(digits.normalize_crop(crop))
                due_tids.append(tid)
                continue
            try:
                results = self._reader.readtext(crop, allowlist="0123456789")
            except Exception:
                continue
            for _, text, conf in results:
                text = text.strip()
                if (text.isdigit() and 1 <= len(text) <= 2
                        and conf >= self.min_confidence):
                    self._vote(tid, text, float(conf))
        if due_crops:
            from . import digits

            texts, confs = digits.predict(self._digit_params,
                                          np.stack(due_crops))
            for tid, text, conf in zip(due_tids, texts, confs):
                if text is not None and conf >= self.min_confidence:
                    self._vote(tid, text, float(conf))

    def _vote(self, tid: int, text: str, conf: float) -> None:
        tally = self.votes[tid]
        tally[text] += conf
        self.numbers[tid] = max(tally, key=tally.get)
        self.confidences[tid] = max(self.confidences[tid], conf)

    def get_number(self, tracker_id: int) -> Optional[str]:
        return self.numbers.get(int(tracker_id))

    def drop(self, tracker_id: int) -> None:
        self.numbers.pop(int(tracker_id), None)
        self.confidences.pop(int(tracker_id), None)
        self.votes.pop(int(tracker_id), None)
