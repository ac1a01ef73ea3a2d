"""YOLOv8 detect / pose architecture as a pure-functional JAX model.

Capability parity targets (reference usage, SURVEY.md C4/C14/C15):
- `hockey-player-detection` — YOLOv8x detect, 2 classes (player=0, goalie=1)
- `hockey-detection`        — YOLOv8 pose, 1 class, 56 rink keypoints
- `hockey-puck-detection`   — YOLOv8 detect, 1 class (documented spec only)

The architecture follows the published YOLOv8 topology (backbone C2f/SPPF +
PAN neck + decoupled anchor-free head with DFL); the implementation is
TPU-native: NHWC, bf16 compute, static shapes, one fused XLA program for
backbone+neck+head. No code is shared with ultralytics.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import (
    KeyGen,
    StatsCollector,
    c2f_apply,
    c2f_init,
    conv_apply,
    conv_init,
    make_divisible,
    sppf_apply,
    sppf_init,
    upsample2x,
)

# depth multiple, width multiple, P5-channel ratio
VARIANTS = {
    "n": (1 / 3, 0.25, 2.0),
    "s": (1 / 3, 0.50, 2.0),
    "m": (2 / 3, 0.75, 1.5),
    "l": (1.0, 1.00, 1.0),
    "x": (1.0, 1.25, 1.0),
}

STRIDES = (8, 16, 32)
REG_MAX = 16


@dataclasses.dataclass(frozen=True)
class YoloConfig:
    variant: str = "l"
    num_classes: int = 2
    num_keypoints: int = 0          # 0 = detect model; 56 for the rink model
    reg_max: int = REG_MAX

    @property
    def depth(self) -> float:
        return VARIANTS[self.variant][0]

    @property
    def width(self) -> float:
        return VARIANTS[self.variant][1]

    @property
    def ratio(self) -> float:
        return VARIANTS[self.variant][2]

    def ch(self, base: int) -> int:
        return make_divisible(base * self.width, 8)

    @property
    def channels(self) -> Tuple[int, int, int, int, int]:
        """(c1..c4, c5) backbone stage output channels."""
        c = self.ch
        return (c(64), c(128), c(256), c(512),
                make_divisible(512 * self.width * self.ratio, 8))

    def n_rep(self, base: int) -> int:
        return max(round(base * self.depth), 1)

    @property
    def head_channels(self) -> Tuple[int, int, int]:
        """Per-level input channels to the head: (P3, P4, P5)."""
        _, _, c3, c4, c5 = self.channels
        return (c3, c4, c5)


# Named model zoo matching the reference checkpoints (main.py:24-25 +
# CLAUDE.md:50; puck model documented only). The player model is x-scale:
# the reference's logged training run (train_player_detection.ipynb cell 15)
# reports 68,125,494 params / 257.4 GFLOPs — YOLOv8x dimensions — because it
# fine-tuned from `football-player-detection.pt` (an x model), even though
# the notebook command names yolov8l.
MODEL_ZOO = {
    "hockey-player-detection": YoloConfig("x", num_classes=2),
    # s-scale since round 3: 6x smaller than the round-2 x-scale and it
    # kills the dual (player+rink) megastep's 20-minute XLA compile wall
    # (COMPAT #14b). The SHIPPED checkpoint is the round-5 broadcast
    # camera-family retrain at 512 (rink_s_ext lineage; current numbers
    # in logs/val_rink_shipped.json) — gated in tests/test_quality.py.
    "hockey-detection": YoloConfig("s", num_classes=1, num_keypoints=56),
    "hockey-puck-detection": YoloConfig("s", num_classes=1),
}


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_params(cfg: YoloConfig, seed: int = 0,
                box_prior: float = 0.0) -> Dict:
    kg = KeyGen(seed)
    c1, c2, c3, c4, c5 = cfg.channels
    n3, n6 = cfg.n_rep(3), cfg.n_rep(6)

    backbone = {
        "stem": conv_init(kg, 3, c1, 3),                        # P1/2
        "down1": conv_init(kg, c1, c2, 3),                      # P2/4
        "c2f1": c2f_init(kg, c2, c2, n3),
        "down2": conv_init(kg, c2, c3, 3),                      # P3/8
        "c2f2": c2f_init(kg, c3, c3, n6),
        "down3": conv_init(kg, c3, c4, 3),                      # P4/16
        "c2f3": c2f_init(kg, c4, c4, n6),
        "down4": conv_init(kg, c4, c5, 3),                      # P5/32
        "c2f4": c2f_init(kg, c5, c5, n3),
        "sppf": sppf_init(kg, c5, c5),
    }
    neck = {
        "c2f_up1": c2f_init(kg, c5 + c4, c4, n3),        # -> P4 mid
        "c2f_up2": c2f_init(kg, c4 + c3, c3, n3),        # -> P3 out
        "down_p3": conv_init(kg, c3, c3, 3),
        "c2f_d1": c2f_init(kg, c3 + c4, c4, n3),         # -> P4 out
        "down_p4": conv_init(kg, c4, c4, 3),
        "c2f_d2": c2f_init(kg, c4 + c5, c5, n3),         # -> P5 out
    }

    ch = cfg.head_channels
    creg = max(16, ch[0] // 4, cfg.reg_max * 4)
    ccls = max(ch[0], min(cfg.num_classes, 100))
    head: Dict = {"reg": [], "cls": []}
    for i, c in enumerate(ch):
        head["reg"].append({
            "cv1": conv_init(kg, c, creg, 3),
            "cv2": conv_init(kg, creg, creg, 3),
            "out": conv_init(kg, creg, 4 * cfg.reg_max, 1, bn=False, bias=True),
        })
        head["cls"].append({
            "cv1": conv_init(kg, c, ccls, 3),
            "cv2": conv_init(kg, ccls, ccls, 3),
            "out": conv_init(kg, ccls, cfg.num_classes, 1, bn=False, bias=True),
        })
        # Prior-probability bias init (standard practice so early training
        # isn't swamped by background): cls bias ~ log(5/nc/(640/s)^2).
        s = STRIDES[i]
        cls_b = float(np.log(5.0 / cfg.num_classes / (640.0 / s) ** 2))
        head["cls"][i]["out"]["b"] = jnp.full(
            (cfg.num_classes,), cls_b, jnp.float32)
        if box_prior > 0:
            # Tiny-object cold start (e.g. the ~10px puck): bias the DFL
            # bins toward `box_prior` grid units per side so initial boxes
            # are small and the first assigned IoUs are non-negligible.
            # With the default uniform-softmax init the expected extent is
            # reg_max/2 = 7.5 grid units per side (a ~120px box at stride
            # 8); IoU with a 10px object is ~4e-3, the task-aligned
            # targets stay ~0, and training cold-starts into "predict
            # nothing" (measured). Ultralytics sidesteps this by
            # fine-tuning from pretrained weights.
            j = np.arange(cfg.reg_max, dtype=np.float32)
            g = -0.5 * ((j - box_prior) / 0.75) ** 2
            head["reg"][i]["out"]["b"] = jnp.asarray(
                np.tile(g, 4), jnp.float32)
        else:
            head["reg"][i]["out"]["b"] = jnp.ones(
                (4 * cfg.reg_max,), jnp.float32)

    if cfg.num_keypoints:
        nk = cfg.num_keypoints * 3
        ckpt = max(ch[0] // 4, nk)
        head["kpt"] = []
        for c in ch:
            head["kpt"].append({
                "cv1": conv_init(kg, c, ckpt, 3),
                "cv2": conv_init(kg, ckpt, ckpt, 3),
                "out": conv_init(kg, ckpt, nk, 1, bn=False, bias=True),
            })

    return {"backbone": backbone, "neck": neck, "head": head}


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _branch(p: Dict, x, stats, name) -> jnp.ndarray:
    if stats is not None:
        with stats.scope(name):
            y = conv_apply(p["cv1"], x, name="cv1", stats=stats)
            y = conv_apply(p["cv2"], y, name="cv2", stats=stats)
    else:
        y = conv_apply(p["cv2"], conv_apply(p["cv1"], x))
    return conv_apply(p["out"], y, act=False)


def forward_features(
    params: Dict, x: jnp.ndarray, stats: Optional[StatsCollector] = None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Backbone + neck. x: (B, H, W, 3) -> (P3, P4, P5) NHWC features."""
    b, n = params["backbone"], params["neck"]

    def bb(stats):
        y = conv_apply(b["stem"], x, stride=2, name="stem", stats=stats)
        y = conv_apply(b["down1"], y, stride=2, name="down1", stats=stats)
        y = c2f_apply(b["c2f1"], y, True, stats, "c2f1")
        y = conv_apply(b["down2"], y, stride=2, name="down2", stats=stats)
        p3 = c2f_apply(b["c2f2"], y, True, stats, "c2f2")
        y = conv_apply(b["down3"], p3, stride=2, name="down3", stats=stats)
        p4 = c2f_apply(b["c2f3"], y, True, stats, "c2f3")
        y = conv_apply(b["down4"], p4, stride=2, name="down4", stats=stats)
        y = c2f_apply(b["c2f4"], y, True, stats, "c2f4")
        p5 = sppf_apply(b["sppf"], y, stats, "sppf")
        return p3, p4, p5

    def nk(stats, p3, p4, p5):
        u = upsample2x(p5)
        t4 = c2f_apply(n["c2f_up1"], jnp.concatenate([u, p4], -1), False, stats, "c2f_up1")
        u = upsample2x(t4)
        o3 = c2f_apply(n["c2f_up2"], jnp.concatenate([u, p3], -1), False, stats, "c2f_up2")
        d = conv_apply(n["down_p3"], o3, stride=2, name="down_p3", stats=stats)
        o4 = c2f_apply(n["c2f_d1"], jnp.concatenate([d, t4], -1), False, stats, "c2f_d1")
        d = conv_apply(n["down_p4"], o4, stride=2, name="down_p4", stats=stats)
        o5 = c2f_apply(n["c2f_d2"], jnp.concatenate([d, p5], -1), False, stats, "c2f_d2")
        return o3, o4, o5

    if stats is not None:
        with stats.scope("backbone"):
            p3, p4, p5 = bb(stats)
        with stats.scope("neck"):
            return nk(stats, p3, p4, p5)
    p3, p4, p5 = bb(None)
    return nk(None, p3, p4, p5)


def forward_raw(
    params: Dict,
    x: jnp.ndarray,
    cfg: YoloConfig,
    stats: Optional[StatsCollector] = None,
) -> Dict[str, List[jnp.ndarray]]:
    """Full forward returning per-level raw head maps (pre-decode).

    Returns dict with 'box' (B,Hi,Wi,4*reg_max), 'cls' (B,Hi,Wi,nc) and
    optionally 'kpt' (B,Hi,Wi,3K) lists over the 3 FPN levels.
    """
    feats = forward_features(params, x, stats)
    h = params["head"]
    out: Dict[str, List[jnp.ndarray]] = {"box": [], "cls": []}
    sc = stats.scope("head") if stats is not None else None
    if sc is not None:
        sc.__enter__()
    try:
        for i, f in enumerate(feats):
            out["box"].append(_branch(h["reg"][i], f, stats, f"reg{i}"))
            out["cls"].append(_branch(h["cls"][i], f, stats, f"cls{i}"))
        if "kpt" in h:
            out["kpt"] = [
                _branch(h["kpt"][i], f, stats, f"kpt{i}")
                for i, f in enumerate(feats)
            ]
    finally:
        if sc is not None:
            sc.__exit__(None, None, None)
    return out


# ---------------------------------------------------------------------------
# Decode (anchor-free, DFL)
# ---------------------------------------------------------------------------

def anchor_points(hw, strides: Sequence[int] = STRIDES) -> Tuple[np.ndarray, np.ndarray]:
    """Static anchors: (A, 2) grid-cell centers in stride units and (A,)
    stride per anchor, concatenated over levels. `hw` is an int (square
    input) or an (in_h, in_w) tuple (rectangular letterbox)."""
    in_h, in_w = (hw, hw) if isinstance(hw, int) else hw
    pts, strs = [], []
    for s in strides:
        gh, gw = in_h // s, in_w // s
        ys, xs = np.meshgrid(np.arange(gh) + 0.5, np.arange(gw) + 0.5, indexing="ij")
        pts.append(np.stack([xs.ravel(), ys.ravel()], axis=-1))
        strs.append(np.full((gh * gw,), s, np.float32))
    return (np.concatenate(pts).astype(np.float32), np.concatenate(strs))


def decode_boxes(
    raw: Dict[str, List[jnp.ndarray]],
    cfg: YoloConfig,
    imgsz,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Raw head maps -> (boxes_xyxy (B, A, 4) in letterboxed px,
    class scores (B, A, nc) sigmoided), A = sum of level HW."""
    b = raw["box"][0].shape[0]
    box_flat = jnp.concatenate(
        [m.reshape(b, -1, 4 * cfg.reg_max) for m in raw["box"]], axis=1
    ).astype(jnp.float32)
    cls_flat = jnp.concatenate(
        [m.reshape(b, -1, cfg.num_classes) for m in raw["cls"]], axis=1
    ).astype(jnp.float32)

    pts, strs = anchor_points(imgsz)
    pts = jnp.asarray(pts)
    strs = jnp.asarray(strs)

    # DFL: softmax expectation over reg_max distance bins, per side.
    dist = box_flat.reshape(b, -1, 4, cfg.reg_max)
    bins = jnp.arange(cfg.reg_max, dtype=jnp.float32)
    dist = jnp.sum(jax.nn.softmax(dist, axis=-1) * bins, axis=-1)  # (B,A,4) ltrb

    x1y1 = pts[None] - dist[..., :2]
    x2y2 = pts[None] + dist[..., 2:]
    boxes = jnp.concatenate([x1y1, x2y2], axis=-1) * strs[None, :, None]
    return boxes, jax.nn.sigmoid(cls_flat)


def decode_keypoints(
    raw: Dict[str, List[jnp.ndarray]], cfg: YoloConfig, imgsz
) -> jnp.ndarray:
    """Raw kpt maps -> (B, A, K, 3): x, y in letterboxed px + sigmoid conf."""
    assert cfg.num_keypoints > 0
    b = raw["kpt"][0].shape[0]
    k = cfg.num_keypoints
    kpt = jnp.concatenate(
        [m.reshape(b, -1, k, 3) for m in raw["kpt"]], axis=1
    ).astype(jnp.float32)
    pts, strs = anchor_points(imgsz)
    pts = jnp.asarray(pts)[None, :, None, :]     # (1, A, 1, 2)
    strs = jnp.asarray(strs)[None, :, None]      # (1, A, 1)
    xy = (kpt[..., :2] * 2.0 + (pts - 0.5)) * strs[..., None]
    conf = jax.nn.sigmoid(kpt[..., 2:3])
    return jnp.concatenate([xy, conf], axis=-1)
