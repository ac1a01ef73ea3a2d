"""Run checkpoint / resume.

The reference cannot resume a half-processed video and does not persist
team-classifier fit state (SURVEY.md §5 checkpoint/resume: "Absent at
runtime"). This module adds both: a `RunState` snapshot of everything
order-dependent in the pipeline (tracker table, team fit + vote
histories, stabilizer state, frame index), written periodically and
restored with `--resume`.

Format: a msgpack-like pickle of plain numpy/python state (the state is
internal and version-stamped; model params use models/checkpoint.py).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

STATE_VERSION = 1


def save_run_state(path: str, processor, frame_idx: int) -> None:
    """Snapshot a VideoProcessor mid-run."""
    state: Dict[str, Any] = {
        "version": STATE_VERSION,
        "frame_idx": int(frame_idx),
        "mode": processor.mode.value,
        "team_names": dict(processor.team_classifier.team_names),
        "team_strategy": processor.team_classifier.active_strategy,
        "team_impl": _team_impl_state(processor.team_classifier),
        "tracker": _tracker_state(processor.tracker),
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(state, f)


def load_run_state(path: str, processor) -> int:
    """Restore a snapshot into a freshly-constructed VideoProcessor.
    Returns the frame index to resume from."""
    with open(path, "rb") as f:
        state = pickle.load(f)
    if state.get("version") != STATE_VERSION:
        raise ValueError(f"unsupported run-state version {state.get('version')}")
    processor.team_classifier.set_team_names(state["team_names"])
    _restore_team_impl(processor.team_classifier, state)
    _restore_tracker(processor.tracker, state["tracker"])
    return int(state["frame_idx"])


# ---------------------------------------------------------------------------

def _team_impl_state(tc) -> Optional[Dict]:
    impl = tc._impl
    name = tc.active_strategy
    if name == "segmentation":
        km = impl.kmeans
        return {
            "kind": name,
            "centers": None if km is None else km.cluster_centers_,
            "history": dict(impl.vote.history),
            "team_colors": impl.team_colors,
        }
    if name == "hybrid":
        return {
            "kind": name,
            "fitted_features": impl.fitted_features,
            "fitted_labels": impl.fitted_labels,
            "scaler_mean": getattr(impl.scaler, "mean_", None),
            "scaler_scale": getattr(impl.scaler, "scale_", None),
            "history": dict(impl.vote.history),
        }
    if name == "interactive":
        return {"kind": name, "examples": dict(impl.examples),
                "history": dict(impl.player_history)}
    if name == "simple":
        return {"kind": name, "history": dict(impl.vote.history)}
    return {"kind": name}


def _restore_team_impl(tc, state) -> None:
    s = state.get("team_impl") or {}
    kind = s.get("kind")
    if kind and kind != tc.active_strategy:
        tc._activate(kind)
    impl = tc._impl
    if kind == "segmentation" and s.get("centers") is not None:
        from sklearn.cluster import KMeans

        km = KMeans(n_clusters=2, random_state=42, n_init=10)
        import numpy as np

        km.cluster_centers_ = np.asarray(s["centers"])
        km._n_threads = 1
        km.labels_ = np.zeros(2, dtype=np.int32)
        impl.kmeans = km
        impl.team_colors = s.get("team_colors")
        impl.vote.history.update(s.get("history", {}))
    elif kind == "hybrid" and s.get("fitted_features") is not None:
        impl.fitted_features = s["fitted_features"]
        impl.fitted_labels = s["fitted_labels"]
        if s.get("scaler_mean") is not None:
            impl.scaler.mean_ = s["scaler_mean"]
            impl.scaler.scale_ = s["scaler_scale"]
            impl.scaler.var_ = s["scaler_scale"] ** 2
            impl.scaler.n_features_in_ = len(s["scaler_mean"])
        impl.vote.history.update(s.get("history", {}))
    elif kind == "interactive" and s.get("examples"):
        impl.examples = s["examples"]
        impl.player_history.update(s.get("history", {}))
    elif kind == "simple":
        impl.vote.history.update(s.get("history", {}))


def _tracker_state(tr) -> Dict:
    import dataclasses

    if not hasattr(tr, "tracks"):  # DeviceByteTrack: snapshot the arrays
        import numpy as np

        return {"device": True,
                "arrays": [np.asarray(x) for x in tr.state]}
    return {
        "next_id": tr._next_id,
        "frame_id": tr.frame_id,
        "tracks": [dataclasses.asdict(t) for t in tr.tracks],
    }


def _restore_tracker(tr, state: Dict) -> None:
    if state.get("device"):
        import jax.numpy as jnp

        from ..tracking.device_tracker import TrackState

        tr.state = TrackState(*[jnp.asarray(a) for a in state["arrays"]])
        return
    from ..tracking.bytetrack import _Track

    tr._next_id = state["next_id"]
    tr.frame_id = state["frame_id"]
    tr.tracks = [_Track(**t) for t in state["tracks"]]
