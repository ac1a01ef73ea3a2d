"""Run checkpoint / resume.

The reference cannot resume a half-processed video and does not persist
team-classifier fit state (SURVEY.md §5 checkpoint/resume: "Absent at
runtime"). This module adds both: a `RunState` snapshot of everything
order-dependent in the pipeline (tracker table, team fit + vote
histories, stabilizer state, frame index), written periodically and
restored with `--resume`.

Format: an npz archive of plain arrays plus a JSON manifest — loaded with
`allow_pickle=False`, so resuming from an untrusted state file can never
execute code (model params use models/checkpoint.py).
"""

from __future__ import annotations

import io
import json
import os
from typing import Any, Dict, List, Optional

import numpy as np

STATE_VERSION = 2


def _encode(obj: Any, arrays: List[np.ndarray]) -> Any:
    """JSON-ify nested state; ndarray leaves go to the side array store.
    Dict keys keep their Python type (tracker histories use int keys)."""
    if isinstance(obj, np.ndarray):
        arrays.append(obj)
        return {"__nd__": len(arrays) - 1}
    if isinstance(obj, np.generic):
        arrays.append(np.asarray(obj))
        return {"__nd0__": len(arrays) - 1}
    if isinstance(obj, dict):
        return {"__dict__": [[_encode(k, arrays), _encode(v, arrays)]
                             for k, v in obj.items()]}
    if isinstance(obj, tuple):
        return {"__tuple__": [_encode(v, arrays) for v in obj]}
    if isinstance(obj, list):
        return [_encode(v, arrays) for v in obj]
    if obj is None or isinstance(obj, (bool, int, float, str)):
        return obj
    raise TypeError(f"run-state cannot serialize {type(obj)!r}")


def _decode(obj: Any, arrays) -> Any:
    if isinstance(obj, dict):
        if "__nd__" in obj:
            return arrays[f"arr_{obj['__nd__']}"]
        if "__nd0__" in obj:
            return arrays[f"arr_{obj['__nd0__']}"][()]
        if "__dict__" in obj:
            return {_decode(k, arrays): _decode(v, arrays)
                    for k, v in obj["__dict__"]}
        if "__tuple__" in obj:
            return tuple(_decode(v, arrays) for v in obj["__tuple__"])
    if isinstance(obj, list):
        return [_decode(v, arrays) for v in obj]
    return obj


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
    arrays: List[np.ndarray] = []
    manifest = json.dumps(_encode(state, arrays))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    buf = io.BytesIO()
    np.savez(buf, manifest=np.frombuffer(manifest.encode(), np.uint8),
             **{f"arr_{i}": a for i, a in enumerate(arrays)})
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def load_run_state(path: str, processor) -> int:
    """Restore a snapshot into a freshly-constructed VideoProcessor.
    Returns the frame index to resume from."""
    with np.load(path, allow_pickle=False) as z:
        manifest = json.loads(bytes(z["manifest"]).decode())
        state = _decode(manifest, z)
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
