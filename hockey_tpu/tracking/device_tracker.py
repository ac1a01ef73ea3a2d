"""On-device ByteTrack: the whole tracker state lives in device arrays and
one jitted step runs KF predict/update, the IoU cost matrix, and two-stage
association per frame (the north-star design: "ByteTrack association runs
as vectorized XLA ops over all tracks per frame").

Semantics follow tracking/bytetrack.py (same thresholds, lost-buffer and
min-consecutive-frames rules). Association solves the same assignment
problem as the host's Hungarian via an XLA auction solver
(ops/assignment.py) with the host's gating semantics (solve the full
matrix, then reject pairs above the gate); `tracker_scan` fuses K frames
of tracking into one program with `lax.scan`, so a detection megastep +
tracker batch does exactly one host round-trip per K frames.

All shapes are static: a fixed-capacity track table (MAX_TRACKS slots) and
the megastep's padded detection set.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.assignment import auction_match
from ..ops.iou import box_iou


class TrackState(NamedTuple):
    mean: jnp.ndarray       # (T, 8) xyah + velocities
    cov: jnp.ndarray        # (T, 8, 8)
    track_id: jnp.ndarray   # (T,) int32; 0 = free slot
    active: jnp.ndarray     # (T,) bool — slot holds a live track
    tracked: jnp.ndarray    # (T,) bool — TRACKED (else LOST)
    consecutive: jnp.ndarray  # (T,) int32
    activated: jnp.ndarray  # (T,) bool — emitted at least once
    missed: jnp.ndarray     # (T,) int32 frames since last update
    class_id: jnp.ndarray   # (T,) int32
    score: jnp.ndarray      # (T,) f32
    next_id: jnp.ndarray    # () int32


def init_state(capacity: int = 64) -> TrackState:
    t = capacity
    return TrackState(
        mean=jnp.zeros((t, 8), jnp.float32),
        cov=jnp.zeros((t, 8, 8), jnp.float32),
        track_id=jnp.zeros((t,), jnp.int32),
        active=jnp.zeros((t,), bool),
        tracked=jnp.zeros((t,), bool),
        consecutive=jnp.zeros((t,), jnp.int32),
        activated=jnp.zeros((t,), bool),
        missed=jnp.zeros((t,), jnp.int32),
        class_id=jnp.zeros((t,), jnp.int32),
        score=jnp.zeros((t,), jnp.float32),
        next_id=jnp.asarray(1, jnp.int32),
    )


# --- KF pieces (same constants as tracking/kalman.py) ----------------------
_STD_POS, _STD_VEL = 1.0 / 20.0, 1.0 / 160.0
_F = np.eye(8, dtype=np.float32)
_F[:4, 4:] = np.eye(4, dtype=np.float32)


def _xyxy_to_xyah(b):
    w = b[..., 2] - b[..., 0]
    h = jnp.maximum(b[..., 3] - b[..., 1], 1e-6)
    return jnp.stack([b[..., 0] + w / 2, b[..., 1] + h / 2, w / h, h], -1)


def _xyah_to_xyxy(m):
    cx, cy, a, h = m[..., 0], m[..., 1], m[..., 2], m[..., 3]
    w = a * h
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def _motion_q(mean):
    h = mean[:, 3:4]
    std = jnp.concatenate([
        _STD_POS * h, _STD_POS * h, jnp.full_like(h, 1e-2), _STD_POS * h,
        _STD_VEL * h, _STD_VEL * h, jnp.full_like(h, 1e-5), _STD_VEL * h,
    ], axis=1)
    return jax.vmap(jnp.diag)(std ** 2)


def _kf_predict(mean, cov):
    f = jnp.asarray(_F)
    return mean @ f.T, jnp.einsum("ij,tjk,lk->til", f, cov, f) + _motion_q(mean)


def _kf_update(mean, cov, meas):
    h = mean[:, 3:4]
    std = jnp.concatenate([
        _STD_POS * h, _STD_POS * h, jnp.full_like(h, 1e-1), _STD_POS * h,
    ], axis=1)
    r = jax.vmap(jnp.diag)(std ** 2)
    s = cov[:, :4, :4] + r
    k = jnp.linalg.solve(
        s.transpose(0, 2, 1), cov[:, :, :4].transpose(0, 2, 1)
    ).transpose(0, 2, 1)                                  # (T, 8, 4)
    innov = meas - mean[:, :4]
    mean2 = mean + jnp.einsum("tij,tj->ti", k, innov)
    cov2 = cov - jnp.einsum("tij,tjk->tik", k, cov[:, :4, :])
    return mean2, cov2


def _init_cov(xyah):
    h = xyah[:, 3:4]
    std = jnp.concatenate([
        2 * _STD_POS * h, 2 * _STD_POS * h, jnp.full_like(h, 1e-2), 2 * _STD_POS * h,
        10 * _STD_VEL * h, 10 * _STD_VEL * h, jnp.full_like(h, 1e-5), 10 * _STD_VEL * h,
    ], axis=1)
    return jax.vmap(jnp.diag)(std ** 2)


def _match(iou: jnp.ndarray, row_ok, col_ok, gate: float) -> jnp.ndarray:
    """Hungarian-semantics matching: solve max-total-IoU over the full
    admissible matrix (auction), then reject matched pairs with IoU below
    the gate — exactly the host `_assign` (bytetrack.py:62-74) contract.
    Returns col index per row (-1 = no match)."""
    a = auction_match(iou, row_ok, col_ok)
    iou_a = jnp.take_along_axis(iou, jnp.maximum(a, 0)[:, None], 1)[:, 0]
    return jnp.where((a >= 0) & (iou_a >= gate), a, -1)


def _tracker_step_impl(
    state: TrackState,
    boxes: jnp.ndarray,    # (D, 4) xyxy, padded
    scores: jnp.ndarray,   # (D,)
    classes: jnp.ndarray,  # (D,) int32
    valid: jnp.ndarray,    # (D,) bool
    *,
    activation_thresh: float = 0.25,
    match_thresh: float = 0.8,      # IoU distance gate (stage 1)
    low_gate: float = 0.5,          # IoU distance gate (stage 2)
    max_time_lost: int = 30,
    min_consecutive: int = 2,
    lost_reacquire_floor: float = 0.0,
    duplicate_kill_iomin: float = 0.0,
    lost_dup_kill_iomin: float = 0.0,
    init_contain_veto: float = 0.0,
) -> Tuple[TrackState, jnp.ndarray]:
    """One frame. Returns (new_state, det_track_ids (D,) int32; -1 where
    the detection did not acquire an emittable track).

    `lost_reacquire_floor` > 0 enables a third association stage that is
    NOT in ByteTrack (0 = exact ByteTrack semantics): unmatched LOST
    tracks vs unmatched sub-threshold detections (score >= floor). In
    stock ByteTrack a lost track can only be revived by a detection above
    the activation threshold (stage 1) — under an out-of-distribution
    score sag a briefly-missed player whose scores hover below activation
    cannot re-link, and every eventual high detection births a NEW id
    (measured round 4: generator-B id_stability 0.111 with 88 switches at
    extent-insensitive matching, logs/e2e_quality_b_iou03.json, while
    in-dist is 1.0). Re-acquisition never CREATES tracks — initiation
    stays at the reference's threshold (hockey/main.py:179-192 parity) —
    it only re-links existing identity. See COMPAT.md.

    `lost_dup_kill_iomin` > 0 kills a LOST track whose predicted box is
    contained (intersection-over-min-area above the threshold) in an
    OLDER (smaller id) TRACKED same-class track. Complements
    `duplicate_kill_iomin`, which requires both tracks to be TRACKED in
    the same frame and so never fires on the measured OOD alternation
    mode: the detector flickers between a torso box and a full-body box
    on the same player, each extent sustaining its own track while the
    other coasts as LOST, and the emitted id oscillates (generator-B
    diagnosis: 216 of 234 switches were contiguous alternation between
    two coexisting tracks on one actor, not gap restarts or crossing
    swaps). Killing the younger of the pair whenever it coasts on top of
    the older converges the identity within a frame or two; genuine
    occlusions are the risk (the occludee coasts under the occluder), so
    the in-dist cost is measured before shipping a default (see
    scripts/diag_track_b.py sweep).

    `init_contain_veto` > 0 vetoes NEW-track initiation for an unmatched
    high detection whose box is contained (intersection-over-min-area
    above the threshold) in any ACTIVE same-class track's box: such a
    detection is ambiguous evidence — a duplicate extent hypothesis for
    an already-tracked player — and every id it births is either killed
    by the duplicate rules a frame later or steals one greedy match from
    the real identity (both produce a measured switch). It can only delay
    a genuinely NEW player's id while the player overlaps an existing
    track, which costs frames of coverage, never identity.

    `duplicate_kill_iomin` > 0 enables duplicate-track suppression
    (0 = exact ByteTrack): a tracked track whose box intersects an
    OLDER (smaller id) tracked same-class track at
    intersection-over-min-area above the threshold is deactivated.
    ByteTrack's own `remove_duplicate_stracks` only fires at IoU > 0.85;
    the OOD failure mode is a detector emitting a torso box AND a
    full-body box per player (measured dup-pair geometry on generator B:
    IoU ~0.38-0.44 — under NMS's 0.45 — but IoMin ~0.68), each
    sustaining its own track and the emitted id alternating between
    them. Keeping the older id collapses the alternation onto one
    identity."""
    t = state.mean.shape[0]
    d = boxes.shape[0]

    # predict all live tracks
    mean_p, cov_p = _kf_predict(state.mean, state.cov)
    mean = jnp.where(state.active[:, None], mean_p, state.mean)
    cov = jnp.where(state.active[:, None, None], cov_p, state.cov)
    missed = jnp.where(state.active, state.missed + 1, state.missed)

    track_boxes = _xyah_to_xyxy(mean)
    iou = box_iou(track_boxes, boxes)                       # (T, D)

    high = valid & (scores >= activation_thresh)
    low = valid & (scores >= 0.1) & ~high

    # stage 1: all active tracks (tracked + lost) vs high dets
    a1 = _match(iou, state.active, high, 1.0 - match_thresh)
    m1 = a1 >= 0

    # stage 2: unmatched TRACKED tracks vs low dets
    a2 = _match(iou, state.active & state.tracked & ~m1, low, 1.0 - low_gate)
    m2 = a2 >= 0

    if lost_reacquire_floor > 0.0:  # static branch (jit static arg)
        # stage 3 (extension, see docstring): unmatched LOST tracks vs
        # sub-threshold dets stage 2 didn't take. Same IoU gate as
        # stage 2 — low-score boxes are noisy, and a coasted lost track's
        # prediction must still genuinely overlap to re-link.
        taken2 = jnp.zeros((d,), bool)
        taken2 = taken2.at[jnp.where(m2, a2, d)].set(True, mode="drop")
        mid = (valid & (scores >= lost_reacquire_floor) & ~high & ~taken2)
        a3 = _match(iou, state.active & ~state.tracked & ~m1, mid,
                    1.0 - low_gate)
        m3 = a3 >= 0
    else:
        a3 = jnp.full((t,), -1, jnp.int32)
        m3 = jnp.zeros((t,), bool)

    matched = m1 | m2 | m3
    det_idx = jnp.where(m1, a1, jnp.where(m2, a2, jnp.where(m3, a3, 0)))
    meas = _xyxy_to_xyah(boxes[det_idx])
    mean_u, cov_u = _kf_update(mean, cov, meas)
    was_lost = ~state.tracked
    mean = jnp.where(matched[:, None], mean_u, mean)
    cov = jnp.where(matched[:, None, None], cov_u, cov)
    consecutive = jnp.where(
        matched, jnp.where(was_lost, 1, state.consecutive + 1), 0)
    score = jnp.where(matched, scores[det_idx], state.score)
    class_id = jnp.where(m1, classes[det_idx], state.class_id)
    missed = jnp.where(matched, 0, missed)
    tracked = matched
    # unmatched previously-tracked become lost; lost expire after buffer
    active = state.active & ~(~matched & ~state.tracked
                              & (missed > max_time_lost))
    activated = state.activated | (matched & (consecutive >= min_consecutive))

    # new tracks from unmatched high detections into free slots
    det_taken = jnp.zeros((d,), bool)
    det_taken = det_taken.at[jnp.where(m1, a1, d)].set(True, mode="drop")
    det_taken = det_taken.at[jnp.where(m2, a2, d)].set(True, mode="drop")
    det_taken = det_taken.at[jnp.where(m3, a3, d)].set(True, mode="drop")
    new_det = high & ~det_taken                              # (D,)
    if init_contain_veto > 0.0:  # static branch (see docstring)
        tb_now = _xyah_to_xyxy(mean)
        tl_td = jnp.maximum(tb_now[:, None, :2], boxes[None, :, :2])
        br_td = jnp.minimum(tb_now[:, None, 2:], boxes[None, :, 2:])
        inter_td = jnp.prod(jnp.clip(br_td - tl_td, 0.0, None), -1)
        ta = jnp.prod(jnp.clip(tb_now[:, 2:] - tb_now[:, :2], 0.0, None), -1)
        da = jnp.prod(jnp.clip(boxes[:, 2:] - boxes[:, :2], 0.0, None), -1)
        iomin_td = inter_td / jnp.maximum(
            jnp.minimum(ta[:, None], da[None, :]), 1e-9)
        contained = jnp.any(
            (iomin_td > init_contain_veto) & active[:, None]
            & (class_id[:, None] == classes[None, :]), axis=0)
        new_det = new_det & ~contained
    free = ~active                                           # (T,)
    # rank free slots and new dets; pair k-th free slot with k-th new det
    free_rank = jnp.cumsum(free) - 1                         # rank among free
    det_rank = jnp.cumsum(new_det) - 1
    n_new = jnp.sum(new_det)
    # slot i takes new det with det_rank == free_rank[i]
    slot_det = jnp.argmax(
        (det_rank[None, :] == free_rank[:, None]) & new_det[None, :], axis=1)
    takes = free & (free_rank < n_new)
    meas_new = _xyxy_to_xyah(boxes[slot_det])
    mean = jnp.where(takes[:, None],
                     jnp.concatenate([meas_new, jnp.zeros((t, 4))], 1), mean)
    cov = jnp.where(takes[:, None, None], _init_cov(meas_new), cov)
    new_ids = state.next_id + det_rank[slot_det].astype(jnp.int32)
    track_id = jnp.where(takes, new_ids, state.track_id)
    next_id = state.next_id + n_new.astype(jnp.int32)
    active = active | takes
    tracked = tracked | takes
    consecutive = jnp.where(takes, 1, consecutive)
    activated_new = takes & (min_consecutive <= 1)
    activated = jnp.where(takes, activated_new, activated)
    class_id = jnp.where(takes, classes[slot_det], class_id)
    score = jnp.where(takes, scores[slot_det], score)
    missed = jnp.where(takes, 0, missed)

    if duplicate_kill_iomin > 0.0 or lost_dup_kill_iomin > 0.0:
        # static branches (see docstring); shared pairwise containment
        tb = _xyah_to_xyxy(mean)
        tl = jnp.maximum(tb[:, None, :2], tb[None, :, :2])
        br = jnp.minimum(tb[:, None, 2:], tb[None, :, 2:])
        inter = jnp.prod(jnp.clip(br - tl, 0.0, None), -1)
        area = jnp.prod(jnp.clip(tb[:, 2:] - tb[:, :2], 0.0, None), -1)
        iomin = inter / jnp.maximum(
            jnp.minimum(area[:, None], area[None, :]), 1e-9)
        younger = track_id[None, :] < track_id[:, None]
        same_cls = class_id[:, None] == class_id[None, :]
    if duplicate_kill_iomin > 0.0:
        live = active & tracked
        # one-shot: i dies if contained-with ANY older (smaller-id) live
        # same-class track — chains (A>B>C) over-kill at most one frame
        dup = ((iomin > duplicate_kill_iomin) & younger
               & live[:, None] & live[None, :] & same_cls)
        killed = jnp.any(dup, axis=1)
        active = active & ~killed
        tracked = tracked & ~killed
    if lost_dup_kill_iomin > 0.0:
        # i (LOST, younger) dies if covered by j (TRACKED, older)
        dup = ((iomin > lost_dup_kill_iomin) & younger
               & (active & ~tracked)[:, None]
               & (active & tracked)[None, :] & same_cls)
        active = active & ~jnp.any(dup, axis=1)

    new_state = TrackState(mean, cov, track_id, active, tracked,
                           consecutive, activated, missed, class_id, score,
                           next_id)

    # per-detection emitted track id
    emit = active & tracked & activated
    det_tid = jnp.full((d,), -1, jnp.int32)
    src_tid = jnp.where(emit, track_id, -1)
    det_tid = det_tid.at[jnp.where(m1 & emit, a1, d)].set(
        jnp.where(m1 & emit, src_tid, -1), mode="drop")
    det_tid = det_tid.at[jnp.where(m2 & emit, a2, d)].set(
        jnp.where(m2 & emit, src_tid, -1), mode="drop")
    det_tid = det_tid.at[jnp.where(m3 & emit, a3, d)].set(
        jnp.where(m3 & emit, src_tid, -1), mode="drop")
    det_tid = det_tid.at[jnp.where(takes & emit, slot_det, d)].set(
        jnp.where(takes & emit, track_id, -1), mode="drop")
    return new_state, det_tid


tracker_step = functools.partial(
    jax.jit,
    static_argnames=("activation_thresh", "match_thresh", "low_gate",
                     "max_time_lost", "min_consecutive",
                     "lost_reacquire_floor", "duplicate_kill_iomin",
                     "lost_dup_kill_iomin", "init_contain_veto"),
)(_tracker_step_impl)


def tracker_scan(
    state: TrackState,
    boxes: jnp.ndarray,    # (B, D, 4)
    scores: jnp.ndarray,   # (B, D)
    classes: jnp.ndarray,  # (B, D) int32
    valid: jnp.ndarray,    # (B, D) bool
    **static_kwargs,
) -> Tuple[TrackState, jnp.ndarray]:
    """K frames of tracking as ONE `lax.scan` — this is what the fused
    megastep calls so tracker state never leaves the chip between frames
    (per-frame host sync was the round-1 gap; now one transfer per batch).
    Returns (state after frame K-1, det_track_ids (B, D))."""

    def step(st, xs):
        b, s, c, v = xs
        st, tid = _tracker_step_impl(st, b, s, c, v, **static_kwargs)
        return st, tid

    return jax.lax.scan(step, state, (boxes, scores, classes, valid))


class DeviceByteTrack:
    """Host-facing wrapper mirroring the ByteTrack API over the jitted
    device step."""

    def __init__(self, capacity: int = 64, **kwargs):
        from ..core.config import Config

        cfg = Config()
        self.kwargs = dict(
            activation_thresh=kwargs.get("track_activation_threshold",
                                         cfg.track_activation_threshold),
            match_thresh=kwargs.get("minimum_matching_threshold",
                                    cfg.minimum_matching_threshold),
            max_time_lost=int(kwargs.get("frame_rate", cfg.frame_rate) / 30.0
                              * kwargs.get("lost_track_buffer",
                                           cfg.lost_track_buffer)),
            min_consecutive=kwargs.get("minimum_consecutive_frames",
                                       cfg.minimum_consecutive_frames),
            lost_reacquire_floor=kwargs.get("lost_reacquire_floor", 0.0),
            duplicate_kill_iomin=kwargs.get("duplicate_kill_iomin", 0.0),
            lost_dup_kill_iomin=kwargs.get("lost_dup_kill_iomin", 0.0),
            init_contain_veto=kwargs.get("init_contain_veto", 0.0),
        )
        self.state = init_state(capacity)

    def update(self, boxes, scores, classes=None):
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        scores = np.asarray(scores, np.float32).reshape(-1)
        n = len(boxes)
        classes = (np.zeros(n, np.int32) if classes is None
                   else np.asarray(classes, np.int32))
        d = max(8, 1 << (n - 1).bit_length() if n else 3)
        pb = np.zeros((d, 4), np.float32)
        ps = np.full((d,), -1.0, np.float32)
        pc = np.zeros((d,), np.int32)
        pv = np.zeros((d,), bool)
        pb[:n], ps[:n], pc[:n], pv[:n] = boxes, scores, classes, True
        self.state, det_tid = tracker_step(
            self.state, jnp.asarray(pb), jnp.asarray(ps), jnp.asarray(pc),
            jnp.asarray(pv), **self.kwargs)
        det_tid = np.asarray(det_tid)[:n]
        keep = det_tid >= 0
        # detection indices of emitted rows (same contract as the host
        # tracker's last_indices — used to join megastep side data)
        self.last_indices = np.flatnonzero(keep).astype(np.int32)
        return boxes[keep], scores[keep], classes[keep], det_tid[keep]

    def reset(self):
        self.state = init_state(self.state.mean.shape[0])
