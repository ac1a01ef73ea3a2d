"""Pose-model training tests: keypoint loss participates and learns."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hockey_tpu.models.yolov8 import YoloConfig, forward_raw, init_params
from hockey_tpu.train.losses import detection_loss
from hockey_tpu.train.trainer import TrainConfig, make_optimizer, make_train_step
from hockey_tpu.homography.view import ViewTransformer

POSE = YoloConfig("n", num_classes=1, num_keypoints=5)
IMGSZ = 64


def pose_batch(rng, b=2, m=2):
    images = rng.uniform(0, 0.4, (b, IMGSZ, IMGSZ, 3)).astype(np.float32)
    boxes = np.zeros((b, m, 4), np.float32)
    classes = np.zeros((b, m), np.int32)
    mask = np.zeros((b, m), bool)
    kpts = np.zeros((b, m, 5, 3), np.float32)
    for i in range(b):
        x, y, w, h = 10, 10, 40, 40
        boxes[i, 0] = [x, y, x + w, y + h]
        mask[i, 0] = True
        for j in range(5):
            kx, ky = x + 5 + 7 * j, y + 10 + 4 * j
            kpts[i, 0, j] = [kx, ky, 1.0]
            images[i, ky - 1: ky + 2, kx - 1: kx + 2] = [0.9, 0.9, 0.1]
        images[i, y: y + h, x: x + w, 2] += 0.3
    return {
        "images": jnp.asarray(images),
        "boxes": jnp.asarray(boxes),
        "classes": jnp.asarray(classes),
        "mask": jnp.asarray(mask),
        "keypoints": jnp.asarray(kpts),
    }


class TestPoseLoss:
    def test_kpt_loss_present_and_finite(self, rng):
        params = init_params(POSE, seed=0)
        batch = pose_batch(rng)
        raw = forward_raw(params, batch["images"], POSE)
        loss, metrics = detection_loss(raw, batch, POSE, IMGSZ)
        assert "kpt_loss" in metrics and "kobj_loss" in metrics
        assert np.isfinite(float(loss))
        assert float(metrics["kpt_loss"]) >= 0

    def test_pose_train_step_decreases_loss(self, rng):
        params = init_params(POSE, seed=0)
        tc = TrainConfig(imgsz=IMGSZ, total_steps=40, warmup_steps=4,
                         learning_rate=0.003)
        opt = make_optimizer(tc)
        step = jax.jit(make_train_step(POSE, tc, opt))
        opt_state = opt.init(params)
        batch = pose_batch(rng)
        losses = []
        for _ in range(20):
            params, opt_state, m = step(params, opt_state, batch)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], f"no learning: {losses[0]}->{losses[-1]}"

    def test_perfect_kpts_near_zero_loc_loss(self, rng):
        """If predicted keypoints == gt keypoints the OKS term vanishes."""
        from hockey_tpu.train.assigner import AssignResult
        from hockey_tpu.train.losses import _keypoint_loss
        from hockey_tpu.models.yolov8 import anchor_points

        batch = pose_batch(rng, b=1, m=1)
        pts, strides = anchor_points(IMGSZ)
        pts, strides = jnp.asarray(pts), jnp.asarray(strides)
        a = pts.shape[0]
        # craft raw kpt maps whose decode equals the gt exactly for every anchor
        gt = np.asarray(batch["keypoints"][0, 0])  # (5, 3)
        kpt_raw = np.zeros((1, a, 5, 3), np.float32)
        p = np.asarray(pts)
        s = np.asarray(strides)
        for j in range(5):
            kpt_raw[0, :, j, 0] = (gt[j, 0] / s - (p[:, 0] - 0.5)) / 2.0
            kpt_raw[0, :, j, 1] = (gt[j, 1] / s - (p[:, 1] - 0.5)) / 2.0
            kpt_raw[0, :, j, 2] = 10.0  # confident visible
        sizes = [(8, 8), (4, 4), (2, 2)]
        raw = {"kpt": []}
        off = 0
        for (hh, ww) in sizes:
            n = hh * ww
            raw["kpt"].append(jnp.asarray(kpt_raw[:, off: off + n].reshape(1, hh, ww, 15)))
            off += n
        fg = jnp.ones((1, a))
        assign = AssignResult(
            target_boxes=jnp.broadcast_to(batch["boxes"][:, 0:1], (1, a, 4)).reshape(1, a, 4),
            target_scores=jnp.zeros((1, a, 1)),
            fg_mask=fg > 0,
            target_gt_idx=jnp.zeros((1, a), jnp.int32),
        )
        loc, vis = _keypoint_loss(raw, batch, POSE, assign, fg, fg, 1.0, pts, strides)
        assert float(loc) < 1e-3
        assert float(vis) < 1e-3


class TestViewTransformer:
    def test_roundtrip(self):
        img = np.asarray([[100, 200], [1500, 200], [200, 900], [1700, 950]], np.float64)
        rink = np.asarray([[11, 0], [189, 0], [11, 85], [189, 85]], np.float64)
        vt = ViewTransformer.from_points(img, rink)
        p = np.asarray([[800.0, 500.0]])
        back = vt.rink_to_image(vt.image_to_rink(p))
        np.testing.assert_allclose(back, p, atol=1e-6)

    def test_boxes_to_rink_anchor(self):
        img = np.asarray([[0, 0], [100, 0], [0, 100], [100, 100]], np.float64)
        rink = img / 10.0
        vt = ViewTransformer.from_points(img, rink)
        out = vt.boxes_to_rink(np.asarray([[10, 10, 30, 50]]))
        np.testing.assert_allclose(out, [[2.0, 5.0]], atol=1e-6)
