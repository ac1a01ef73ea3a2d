"""Convert ultralytics YOLOv8 torch checkpoints to hockey_tpu params.

The reference loads `hockey-player-detection.pt` / `hockey-detection.pt`
via `YOLO(path)` (hockey/main.py:71-87). Those .pt files are gitignored
upstream and absent here, but users migrating from the reference will have
them — this converter maps the ultralytics module-index state dict
(`model.model.<idx>.<...>`) onto our semantic param tree.

Ultralytics YOLOv8 graph indices (detect):
  0 stem, 1 down1, 2 c2f1, 3 down2, 4 c2f2, 5 down3, 6 c2f3, 7 down4,
  8 c2f4, 9 sppf, 12 c2f_up1, 15 c2f_up2, 16 down_p3, 18 c2f_d1,
  19 down_p4, 21 c2f_d2, 22 head (cv2=reg branch, cv3=cls branch,
  cv4=kpt branch for pose).

Torch conv weights are OIHW; ours are HWIO (NHWC layout): transpose
(2, 3, 1, 0).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from .yolov8 import YoloConfig, init_params

_BACKBONE_IDX = {
    0: ("backbone", "stem"), 1: ("backbone", "down1"), 2: ("backbone", "c2f1"),
    3: ("backbone", "down2"), 4: ("backbone", "c2f2"), 5: ("backbone", "down3"),
    6: ("backbone", "c2f3"), 7: ("backbone", "down4"), 8: ("backbone", "c2f4"),
    9: ("backbone", "sppf"), 12: ("neck", "c2f_up1"), 15: ("neck", "c2f_up2"),
    16: ("neck", "down_p3"), 18: ("neck", "c2f_d1"), 19: ("neck", "down_p4"),
    21: ("neck", "c2f_d2"),
}
_HEAD_BRANCH = {"cv2": "reg", "cv3": "cls", "cv4": "kpt"}


def _conv_w(t: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(t, (2, 3, 1, 0)).astype(np.float32))


def _fill_conv(dst: Dict, sd: Mapping[str, np.ndarray], prefix: str) -> None:
    """Copy one Conv(+BN) ultralytics module into our conv param dict."""
    dst["w"] = _conv_w(np.asarray(sd[f"{prefix}.conv.weight"]))
    if f"{prefix}.bn.weight" in sd:
        dst["bn"] = {
            "scale": np.asarray(sd[f"{prefix}.bn.weight"], np.float32),
            "bias": np.asarray(sd[f"{prefix}.bn.bias"], np.float32),
            "mean": np.asarray(sd[f"{prefix}.bn.running_mean"], np.float32),
            "var": np.asarray(sd[f"{prefix}.bn.running_var"], np.float32),
        }
    elif f"{prefix}.conv.bias" in sd:
        dst["b"] = np.asarray(sd[f"{prefix}.conv.bias"], np.float32)


def _fill_plain_conv(dst: Dict, sd: Mapping[str, np.ndarray], prefix: str) -> None:
    """Plain nn.Conv2d (the final 1x1 of each head branch)."""
    dst["w"] = _conv_w(np.asarray(sd[f"{prefix}.weight"]))
    dst["b"] = np.asarray(sd[f"{prefix}.bias"], np.float32)


def _fill_c2f(dst: Dict, sd, prefix: str) -> None:
    _fill_conv(dst["cv1"], sd, f"{prefix}.cv1")
    _fill_conv(dst["cv2"], sd, f"{prefix}.cv2")
    for i, m in enumerate(dst["m"]):
        _fill_conv(m["cv1"], sd, f"{prefix}.m.{i}.cv1")
        _fill_conv(m["cv2"], sd, f"{prefix}.m.{i}.cv2")


def convert_state_dict(
    sd: Mapping[str, np.ndarray], cfg: YoloConfig, prefix: str = "model."
) -> Dict:
    """ultralytics state dict -> hockey_tpu param tree (f32, unfused)."""
    params = init_params(cfg, seed=0)
    head_idx = 22

    for idx, (group, name) in _BACKBONE_IDX.items():
        p = params[group][name]
        mp = f"{prefix}{idx}"
        if name.startswith(("stem", "down")):
            _fill_conv(p, sd, mp)
        elif name == "sppf":
            _fill_conv(p["cv1"], sd, f"{mp}.cv1")
            _fill_conv(p["cv2"], sd, f"{mp}.cv2")
        else:
            _fill_c2f(p, sd, mp)

    for br_torch, br_ours in _HEAD_BRANCH.items():
        if br_ours not in params["head"]:
            continue
        for lvl in range(3):
            dst = params["head"][br_ours][lvl]
            mp = f"{prefix}{head_idx}.{br_torch}.{lvl}"
            _fill_conv(dst["cv1"], sd, f"{mp}.0")
            _fill_conv(dst["cv2"], sd, f"{mp}.1")
            _fill_plain_conv(dst["out"], sd, f"{mp}.2")

    import jax.numpy as jnp
    import jax

    return jax.tree_util.tree_map(lambda x: jnp.asarray(x), params)


def convert_pt_file(pt_path: str, cfg: YoloConfig, out_path: str) -> None:
    """Load an ultralytics .pt (requires torch) and write our msgpack."""
    import torch

    ckpt = torch.load(pt_path, map_location="cpu", weights_only=False)
    model = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    sd = {k: v.float().numpy() for k, v in model.state_dict().items()}
    # ultralytics prefixes with 'model.' at the DetectionModel level
    params = convert_state_dict(sd, cfg, prefix="model.")
    from .checkpoint import save_params

    save_params(out_path, params)
