"""YOLOv8-in-JAX tests: shapes, decode, BN fusing, torch parity, checkpoint."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hockey_tpu.models.layers import (
    KeyGen,
    StatsCollector,
    conv_apply,
    conv_init,
    fuse_model,
)
from hockey_tpu.models.yolov8 import (
    MODEL_ZOO,
    YoloConfig,
    anchor_points,
    decode_boxes,
    decode_keypoints,
    forward_raw,
    init_params,
)

TINY = YoloConfig("n", num_classes=2)
TINY_POSE = YoloConfig("n", num_classes=1, num_keypoints=7)


class TestArchitecture:
    def test_forward_shapes(self):
        params = init_params(TINY, seed=0)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        raw = forward_raw(params, x, TINY)
        # strides 8/16/32 over 64px input -> 8/4/2 px maps
        assert [m.shape[1] for m in raw["box"]] == [8, 4, 2]
        assert raw["box"][0].shape == (1, 8, 8, 4 * TINY.reg_max)
        assert raw["cls"][0].shape == (1, 8, 8, 2)

    def test_pose_head_shapes(self):
        params = init_params(TINY_POSE, seed=0)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        raw = forward_raw(params, x, TINY_POSE)
        assert raw["kpt"][0].shape == (1, 8, 8, 21)
        kpts = decode_keypoints(raw, TINY_POSE, 64)
        assert kpts.shape == (1, 8 * 8 + 4 * 4 + 2 * 2, 7, 3)
        conf = np.asarray(kpts[..., 2])
        assert (conf >= 0).all() and (conf <= 1).all()

    def test_param_count_matches_reference_scale(self):
        """Reference player model logs 68,125,494 params (BASELINE.md 'Model
        summary' line) — YOLOv8x dimensions. Our x-detect should land within
        a few percent (unfused BN adds mean/var to the count)."""
        cfg = MODEL_ZOO["hockey-player-detection"]
        params = init_params(cfg, seed=0)
        leaves, _ = jax.tree_util.tree_flatten(params)
        n = sum(int(np.prod(l.shape)) for l in leaves)
        assert 64e6 < n < 74e6, f"param count {n/1e6:.1f}M out of range"

    def test_variant_channels(self):
        assert YoloConfig("l").channels == (64, 128, 256, 512, 512)
        assert YoloConfig("n").channels == (16, 32, 64, 128, 256)
        assert YoloConfig("m").channels == (48, 96, 192, 384, 576)


class TestDecode:
    def test_anchor_points_count_and_order(self):
        pts, strs = anchor_points(64)
        assert pts.shape == (64 + 16 + 4, 2)
        assert strs[0] == 8 and strs[-1] == 32
        np.testing.assert_allclose(pts[0], [0.5, 0.5])
        np.testing.assert_allclose(pts[1], [1.5, 0.5])  # x-fastest

    def test_decode_box_geometry(self):
        """With DFL logits peaked at bin d, boxes = anchor +/- d strides."""
        cfg = TINY
        imgsz = 64
        sizes = [(8, 8), (4, 4), (2, 2)]
        raw = {"box": [], "cls": []}
        d = 2  # peak bin
        for (h, w) in sizes:
            m = np.full((1, h, w, 4, cfg.reg_max), -20.0, np.float32)
            m[..., d] = 20.0
            raw["box"].append(jnp.asarray(m.reshape(1, h, w, -1)))
            raw["cls"].append(jnp.zeros((1, h, w, 2), jnp.float32))
        boxes, scores = decode_boxes(raw, cfg, imgsz)
        pts, strs = anchor_points(imgsz)
        want = np.concatenate([pts - d, pts + d], -1) * strs[:, None]
        np.testing.assert_allclose(np.asarray(boxes[0]), want, atol=1e-3)
        np.testing.assert_allclose(np.asarray(scores), 0.5, atol=1e-6)


class TestFusing:
    def test_fused_matches_unfused(self):
        kg = KeyGen(3)
        p = conv_init(kg, 8, 16, 3)
        # non-trivial BN stats
        p["bn"]["mean"] = jnp.asarray(np.random.default_rng(0).normal(size=16), jnp.float32)
        p["bn"]["var"] = jnp.asarray(np.random.default_rng(1).uniform(0.5, 2, 16), jnp.float32)
        x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 16, 16, 8)), jnp.float32)
        y1 = conv_apply(p, x, stride=2)
        y2 = conv_apply(fuse_model(p), x, stride=2)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-5)

    def test_full_model_fused_matches(self):
        params = init_params(TINY, seed=1)
        x = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
        r1 = forward_raw(params, x, TINY)
        r2 = forward_raw(fuse_model(params), x, TINY)
        for a, b in zip(r1["box"], r2["box"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


class TestTorchParity:
    """Numerical parity of our conv/BN/SiLU vs torch (SURVEY.md §4:
    'JAX forward vs. a trusted per-op trace')."""

    def test_conv_bn_silu_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        cin, cout, k, s = 5, 7, 3, 2
        w = rng.normal(size=(cout, cin, k, k)).astype(np.float32)
        x = rng.normal(size=(2, cin, 12, 12)).astype(np.float32)
        gamma = rng.uniform(0.5, 1.5, cout).astype(np.float32)
        beta = rng.normal(size=cout).astype(np.float32)
        mean = rng.normal(size=cout).astype(np.float32)
        var = rng.uniform(0.5, 2.0, cout).astype(np.float32)

        conv = torch.nn.Conv2d(cin, cout, k, s, k // 2, bias=False)
        conv.weight.data = torch.from_numpy(w)
        bn = torch.nn.BatchNorm2d(cout, eps=1e-3).eval()
        bn.weight.data = torch.from_numpy(gamma)
        bn.bias.data = torch.from_numpy(beta)
        bn.running_mean.data = torch.from_numpy(mean)
        bn.running_var.data = torch.from_numpy(var)
        with torch.no_grad():
            want = torch.nn.functional.silu(bn(conv(torch.from_numpy(x))))
        want = want.numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC

        p = {
            "w": jnp.asarray(w.transpose(2, 3, 1, 0)),  # OIHW -> HWIO
            "bn": {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta),
                   "mean": jnp.asarray(mean), "var": jnp.asarray(var)},
        }
        got = np.asarray(conv_apply(p, jnp.asarray(x.transpose(0, 2, 3, 1)), stride=s))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_maxpool_matches_torch(self):
        torch = pytest.importorskip("torch")
        from hockey_tpu.models.layers import _maxpool5

        x = np.random.default_rng(0).normal(size=(1, 4, 9, 9)).astype(np.float32)
        with torch.no_grad():
            want = torch.nn.functional.max_pool2d(
                torch.from_numpy(x), 5, 1, 2).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(_maxpool5(jnp.asarray(x.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestTrainingStats:
    def test_stats_collected_for_every_bn(self):
        params = init_params(TINY, seed=0)
        col = StatsCollector()
        x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 64, 64, 3)), jnp.float32)
        forward_raw(params, x, TINY, stats=col)
        paths = [p for p, _, _ in col.stats]
        assert len(paths) == len(set(paths)), "duplicate BN stat paths"
        # count BN layers in the tree
        n_bn = 0
        def count(t):
            nonlocal n_bn
            if isinstance(t, dict):
                if "bn" in t:
                    n_bn += 1
                for v in t.values():
                    count(v)
            elif isinstance(t, list):
                for v in t:
                    count(v)
        count(params)
        assert len(paths) == n_bn


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        from hockey_tpu.models.checkpoint import load_params, save_params

        params = init_params(TINY, seed=0)
        f = str(tmp_path / "m.msgpack")
        save_params(f, params)
        back = load_params(f)
        a, _ = jax.tree_util.tree_flatten(params)
        b, _ = jax.tree_util.tree_flatten(back)
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestDetectorMegastep:
    def test_end_to_end_shapes_and_validity(self):
        from hockey_tpu.core.config import Config
        from hockey_tpu.models.detector import Detector

        cfg = Config(nms_pre_topk=64, max_detections=16)
        det = Detector(
            "hockey-puck-detection", cfg, frame_hw=(108, 192), imgsz=64,
            conf=0.001, seed=0,
        )
        frames = np.random.default_rng(0).integers(
            0, 255, (2, 108, 192, 3), dtype=np.uint8)
        out = det.detect_batch(frames)
        assert out.boxes.shape == (2, 16, 4)
        # boxes are in original-frame coordinates
        b = np.asarray(out.boxes)
        assert (b[..., [0, 2]] <= 192 + 1e-3).all()
        assert (b[..., [1, 3]] <= 108 + 1e-3).all()
        host = det.detect(frames[0])
        assert host.boxes.shape[1] == 4
