"""Training tests: TAL assigner, v8 loss, train step convergence on a tiny
synthetic task, and multi-device (dp x fsdp) sharded training on the
virtual 8-CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from hockey_tpu.models.yolov8 import YoloConfig, anchor_points, init_params
from hockey_tpu.train.assigner import assign_batch
from hockey_tpu.train.losses import detection_loss
from hockey_tpu.train.trainer import (
    TrainConfig,
    make_optimizer,
    make_train_step,
    update_bn_stats,
)

TINY = YoloConfig("n", num_classes=2)
IMGSZ = 64


def synth_batch(rng, b=2, m=4):
    """Images with bright rectangles at the gt boxes."""
    images = rng.uniform(0, 0.3, (b, IMGSZ, IMGSZ, 3)).astype(np.float32)
    boxes = np.zeros((b, m, 4), np.float32)
    classes = np.zeros((b, m), np.int32)
    mask = np.zeros((b, m), bool)
    for i in range(b):
        for j in range(2):  # two real boxes per image
            x, y = rng.integers(4, 36, 2)
            w, h = rng.integers(12, 24, 2)
            boxes[i, j] = [x, y, min(x + w, 63), min(y + h, 63)]
            classes[i, j] = j % 2
            mask[i, j] = True
            images[i, int(y): int(boxes[i, j][3]), int(x): int(boxes[i, j][2])] = \
                [0.9, 0.2 + 0.6 * (j % 2), 0.1]
    return {
        "images": jnp.asarray(images),
        "boxes": jnp.asarray(boxes),
        "classes": jnp.asarray(classes),
        "mask": jnp.asarray(mask),
    }


class TestAssigner:
    def test_perfect_predictions_assigned(self):
        pts, strides = anchor_points(IMGSZ)
        pts_px = jnp.asarray(pts * strides[:, None])
        a = pts_px.shape[0]
        gt = jnp.asarray([[[8.0, 8, 32, 32], [40, 40, 60, 60]]])
        gt_cls = jnp.asarray([[0, 1]], jnp.int32)
        gt_mask = jnp.asarray([[True, True]])
        # predictions: every anchor predicts the nearest gt box perfectly
        d0 = jnp.linalg.norm(pts_px - jnp.asarray([20.0, 20.0]), axis=1)
        d1 = jnp.linalg.norm(pts_px - jnp.asarray([50.0, 50.0]), axis=1)
        nearest = (d1 < d0).astype(jnp.int32)
        pred_boxes = gt[0][nearest][None]
        pred_scores = jax.nn.one_hot(nearest, 2)[None] * 0.9
        res = assign_batch(pred_scores, pred_boxes, pts_px, gt, gt_cls, gt_mask)
        fg = np.asarray(res.fg_mask[0])
        assert fg.sum() > 0
        # assigned target boxes must be one of the two gts
        tb = np.asarray(res.target_boxes[0])[fg]
        for t in tb:
            assert (np.allclose(t, [8, 8, 32, 32]) or np.allclose(t, [40, 40, 60, 60]))
        # anchors inside gt0 got class 0 scores
        ts = np.asarray(res.target_scores[0])[fg]
        assert (ts.sum(-1) > 0).all()

    def test_no_gt_no_fg(self):
        pts, strides = anchor_points(IMGSZ)
        pts_px = jnp.asarray(pts * strides[:, None])
        a = pts_px.shape[0]
        res = assign_batch(
            jnp.zeros((1, a, 2)), jnp.zeros((1, a, 4)), pts_px,
            jnp.zeros((1, 4, 4)), jnp.zeros((1, 4), jnp.int32),
            jnp.zeros((1, 4), bool),
        )
        assert not np.asarray(res.fg_mask).any()


class TestLoss:
    def test_loss_finite_and_components(self, rng):
        params = init_params(TINY, seed=0)
        batch = synth_batch(rng)
        from hockey_tpu.models.yolov8 import forward_raw

        raw = forward_raw(params, batch["images"], TINY)
        loss, metrics = detection_loss(raw, batch, TINY, IMGSZ)
        assert np.isfinite(float(loss))
        for k in ("box_loss", "cls_loss", "dfl_loss"):
            assert float(metrics[k]) >= 0
        assert float(metrics["num_fg"]) > 0

    def test_grads_flow_everywhere(self, rng):
        params = init_params(TINY, seed=0)
        batch = synth_batch(rng)
        from hockey_tpu.models.yolov8 import forward_raw

        def f(p):
            return detection_loss(forward_raw(p, batch["images"], TINY),
                                  batch, TINY, IMGSZ)[0]

        grads = jax.grad(f)(params)
        leaves, _ = jax.tree_util.tree_flatten(grads)
        nonzero = sum(int(jnp.any(l != 0)) for l in leaves)
        assert nonzero > len(leaves) * 0.5, "most params received no gradient"


class TestTALStopGradient:
    """Regression for the training collapse: the task-aligned assignment
    must be gradient-free (ultralytics detaches predictions before TAL).
    With a leak, box/dfl losses pick up gradients w.r.t. cls logits (and
    cls loss w.r.t. box logits) through the soft targets, giving the
    optimizer a direct 'make predictions worse to shrink the targets'
    path — measured to collapse real runs within ~100 steps of peak LR."""

    def _raw_and_batch(self):
        key = jax.random.PRNGKey(3)
        sizes = [IMGSZ // s for s in (8, 16, 32)]
        raw = {
            "box": [0.1 * jax.random.normal(
                jax.random.fold_in(key, i), (2, s, s, 4 * TINY.reg_max))
                for i, s in enumerate(sizes)],
            "cls": [0.1 * jax.random.normal(
                jax.random.fold_in(key, 10 + i), (2, s, s, TINY.num_classes))
                for i, s in enumerate(sizes)],
        }
        batch = synth_batch(np.random.default_rng(0))
        # the scenario must actually assign anchors for the check to bite
        _, metrics = detection_loss(raw, batch, TINY, IMGSZ)
        assert float(metrics["num_fg"]) > 0
        return raw, batch

    def test_box_and_dfl_losses_have_no_cls_gradient(self):
        raw, batch = self._raw_and_batch()

        def box_plus_dfl(cls_list):
            _, m = detection_loss({"box": raw["box"], "cls": cls_list},
                                  batch, TINY, IMGSZ)
            return m["box_loss"] + m["dfl_loss"]

        g = jax.grad(box_plus_dfl)(raw["cls"])
        for lvl in g:
            np.testing.assert_array_equal(np.asarray(lvl), 0.0)

    def test_cls_loss_has_no_box_gradient(self):
        raw, batch = self._raw_and_batch()

        def cls_only(box_list):
            _, m = detection_loss({"box": box_list, "cls": raw["cls"]},
                                  batch, TINY, IMGSZ)
            return m["cls_loss"]

        g = jax.grad(cls_only)(raw["box"])
        for lvl in g:
            np.testing.assert_array_equal(np.asarray(lvl), 0.0)


class TestTrainStep:
    def test_learns_to_detect_the_boxes(self, rng):
        """Overfit one tiny batch and assert the model actually finds the
        rectangles. NOTE: the raw TAL loss is NOT monotone from random
        init — as predictions improve, IoU rises, so the soft targets
        (align/max * max_iou) GROW and the loss can rise while the model
        is learning. Detection quality is the real signal."""
        from hockey_tpu.models.detector import build_detect_fn
        from hockey_tpu.models.layers import fuse_for_inference
        from hockey_tpu.train.trainer import make_bn_stats_fn, precise_bn

        params = init_params(TINY, seed=0)
        tc = TrainConfig(imgsz=IMGSZ, total_steps=120, warmup_steps=10,
                         learning_rate=0.01, compute_dtype="float32")
        opt = make_optimizer(tc)
        opt_state = opt.init(params)
        step = jax.jit(make_train_step(TINY, tc, opt))
        batch = synth_batch(rng)  # overfit one batch
        losses = []
        for i in range(120):
            params, opt_state, m = step(params, opt_state, batch)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()

        params = precise_bn(params, make_bn_stats_fn(TINY, "float32"),
                            [batch["images"]])
        fn = build_detect_fn(TINY, imgsz=IMGSZ, frame_hw=(IMGSZ, IMGSZ),
                             conf=0.05, max_det=8, pre_topk=32)
        det = fn(fuse_for_inference(params),
                 (np.asarray(batch["images"]) * 255).astype(np.uint8))
        found = 0
        for i in range(2):  # each image has two gt boxes
            gt = np.asarray(batch["boxes"][i][np.asarray(batch["mask"][i])])
            pb = np.asarray(det.boxes[i])[np.asarray(det.valid[i])]
            if len(pb) == 0:
                continue
            x1 = np.maximum(pb[:, None, 0], gt[None, :, 0])
            y1 = np.maximum(pb[:, None, 1], gt[None, :, 1])
            x2 = np.minimum(pb[:, None, 2], gt[None, :, 2])
            y2 = np.minimum(pb[:, None, 3], gt[None, :, 3])
            inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
            pa = (pb[:, 2] - pb[:, 0]) * (pb[:, 3] - pb[:, 1])
            ga = (gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1])
            iou = inter / np.maximum(pa[:, None] + ga[None] - inter, 1e-9)
            found += int((iou.max(axis=0) >= 0.25).sum())
        assert found >= 2, f"only {found}/4 gt boxes found after overfit"

    def test_bn_stats_updated(self, rng):
        params = init_params(TINY, seed=0)
        tc = TrainConfig(imgsz=IMGSZ)
        opt = make_optimizer(tc)
        step = jax.jit(make_train_step(TINY, tc, opt))
        before = np.asarray(params["backbone"]["stem"]["bn"]["mean"])
        params2, _, _ = step(params, opt.init(params), synth_batch(rng))
        after = np.asarray(params2["backbone"]["stem"]["bn"]["mean"])
        assert not np.allclose(before, after), "BN running mean not updated"

    def test_update_bn_stats_is_functional(self, rng):
        from hockey_tpu.models.layers import StatsCollector
        from hockey_tpu.models.yolov8 import forward_raw

        params = init_params(TINY, seed=0)
        col = StatsCollector()
        forward_raw(params, jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32),
                    TINY, stats=col)
        before = np.asarray(params["backbone"]["stem"]["bn"]["mean"]).copy()
        update_bn_stats(params, col.stats)
        np.testing.assert_array_equal(
            np.asarray(params["backbone"]["stem"]["bn"]["mean"]), before)


class TestPreciseBN:
    def test_running_stats_become_averaged_batch_stats(self, rng):
        from hockey_tpu.models.layers import StatsCollector
        from hockey_tpu.models.yolov8 import forward_raw
        from hockey_tpu.train.trainer import make_bn_stats_fn, precise_bn

        params = init_params(TINY, seed=0)
        batches = [synth_batch(np.random.default_rng(s))["images"]
                   for s in (1, 2)]
        stats_fn = make_bn_stats_fn(TINY, compute_dtype="float32")
        out = precise_bn(params, stats_fn, batches)

        # independently aggregate one layer's batch stats
        per_batch = [jax.device_get(stats_fn(params, b)) for b in batches]
        path = next(iter(per_batch[0]))
        means = np.stack([p[path][0] for p in per_batch])
        vars_ = np.stack([p[path][1] for p in per_batch])
        mu = means.mean(0)
        var = (vars_ + means**2).mean(0) - mu**2

        from hockey_tpu.train.trainer import _resolve
        node = _resolve(out, path.split("/"))
        np.testing.assert_allclose(np.asarray(node["bn"]["mean"]), mu,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(node["bn"]["var"]), var,
                                   rtol=1e-4, atol=1e-5)
        # input tree untouched (functional)
        orig = _resolve(params, path.split("/"))
        assert not np.allclose(np.asarray(orig["bn"]["mean"]), mu)


class TestShardedTraining:
    def test_dp_fsdp_train_step_on_virtual_mesh(self, rng):
        from hockey_tpu.core.mesh import make_mesh
        from hockey_tpu.parallel.sharding import (
            jit_train_step,
            shard_batch,
            shard_params,
        )

        assert len(jax.devices()) == 8, "conftest should force 8 CPU devices"
        mesh = make_mesh(8, dp=4, fsdp=2)
        params = init_params(TINY, seed=0)
        tc = TrainConfig(imgsz=IMGSZ)
        opt = make_optimizer(tc)
        opt_state = opt.init(params)
        batch = synth_batch(rng, b=8)
        with mesh:
            params = shard_params(mesh, params)
            batch = shard_batch(mesh, batch)
            step = jit_train_step(make_train_step(TINY, tc, opt), mesh,
                                  params, opt_state, batch)
            params, opt_state, metrics = step(params, opt_state, batch)
        assert np.isfinite(float(metrics["loss"]))

    def test_sharded_matches_single_device(self, rng):
        """dp x fsdp sharding must not change the math (same loss as
        unsharded execution on the same batch)."""
        from hockey_tpu.core.mesh import make_mesh
        from hockey_tpu.parallel.sharding import (
            jit_train_step,
            shard_batch,
            shard_params,
        )

        params0 = init_params(TINY, seed=0)
        # f32 compute: this test checks sharding equivalence; bf16 shard
        # reduction-order noise (~1%) would need a meaninglessly loose rtol
        tc = TrainConfig(imgsz=IMGSZ, compute_dtype="float32")
        opt = make_optimizer(tc)
        batch = synth_batch(rng, b=8)

        step1 = jax.jit(make_train_step(TINY, tc, opt))
        _, _, m1 = step1(params0, opt.init(params0), batch)

        mesh = make_mesh(8, dp=4, fsdp=2)
        with mesh:
            ps = shard_params(mesh, params0)
            bs = shard_batch(mesh, batch)
            step8 = jit_train_step(make_train_step(TINY, tc, opt), mesh,
                                   ps, opt.init(params0), bs)
            _, _, m8 = step8(ps, opt.init(ps), bs)
        np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                                   rtol=1e-3)


class TestDataParallelInference:
    def test_detect_fn_shards_over_dp(self, rng):
        """Batched detection sharded over the dp axis of an 8-device mesh
        must match unsharded results exactly."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from hockey_tpu.core.mesh import make_mesh
        from hockey_tpu.models.detector import build_detect_fn
        from hockey_tpu.models.layers import fuse_model
        from hockey_tpu.models.yolov8 import YoloConfig, init_params
        from hockey_tpu.parallel.sharding import jit_detect_dp

        cfg = YoloConfig("n", num_classes=2)
        params = fuse_model(init_params(cfg, seed=0))
        fn = build_detect_fn(cfg, imgsz=64, frame_hw=(48, 96), conf=0.001,
                             pre_topk=32, max_det=8)
        frames = rng.integers(0, 255, (8, 48, 96, 3)).astype(np.uint8)

        ref = fn(params, jnp.asarray(frames))

        mesh = make_mesh(8, dp=8, fsdp=1)
        with mesh:
            sharded_fn = jit_detect_dp(fn, mesh, params)
            frames_sh = jax.device_put(
                jnp.asarray(frames), NamedSharding(mesh, P("dp")))
            out = sharded_fn(params, frames_sh)
        np.testing.assert_allclose(np.asarray(out.boxes), np.asarray(ref.boxes),
                                   atol=1e-2)
        np.testing.assert_array_equal(np.asarray(out.valid), np.asarray(ref.valid))


class TestAugmentations:
    def test_mosaic_merges_targets(self, rng):
        from hockey_tpu.train.data import SyntheticHockeyDataset, mosaic4

        ds = SyntheticHockeyDataset(imgsz=96, seed=0)
        items = [ds.load(i) for i in range(4)]
        out = mosaic4(items, rng)
        assert out["images"].shape == (96, 96, 3)
        assert out["mask"].any()
        b = out["boxes"][out["mask"]]
        assert (b[:, 0] >= 0).all() and (b[:, 2] <= 96).all()
        assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()

    def test_mixup_unions_targets(self, rng):
        from hockey_tpu.train.data import SyntheticHockeyDataset, mixup

        ds = SyntheticHockeyDataset(imgsz=96, seed=0)
        a, b = ds.load(0), ds.load(1)
        out = mixup(a, b, rng)
        assert out["mask"].sum() == min(a["mask"].sum() + b["mask"].sum(), 64)
        assert 0.0 <= out["images"].min() and out["images"].max() <= 1.0

    def test_batch_iterator_with_aug_probs(self, rng):
        from hockey_tpu.train.data import SyntheticHockeyDataset, batch_iterator

        ds = SyntheticHockeyDataset(imgsz=96, seed=0)
        batch = next(batch_iterator(ds, 4, 1, seed=0,
                                    mosaic_prob=1.0, mixup_prob=1.0))
        assert batch["images"].shape == (4, 96, 96, 3)
        assert batch["mask"].any()


class TestSyntheticRinkDataset:
    def test_item_contract(self):
        from hockey_tpu.train.data import SyntheticRinkDataset

        ds = SyntheticRinkDataset(imgsz=128, seed=0)
        item = ds.load(3)
        assert item["images"].shape == (128, 128, 3)
        assert item["keypoints"].shape == (4, 56, 3)
        assert item["mask"][0] and not item["mask"][1:].any()
        vis = item["keypoints"][0, :, 2] > 0.5
        # windowed cameras (visible fraction down to 0.42, data.py) crop
        # a large share of the 56 keypoints by design
        assert vis.sum() >= 15, "a meaningful share of keypoints in frame"
        pts = item["keypoints"][0, vis, :2]
        assert (pts >= 0).all() and (pts < 128).all()

    def test_deterministic(self):
        from hockey_tpu.train.data import SyntheticRinkDataset

        a = SyntheticRinkDataset(imgsz=96, seed=1).load(5)
        b = SyntheticRinkDataset(imgsz=96, seed=1).load(5)
        np.testing.assert_array_equal(a["images"], b["images"])
        np.testing.assert_array_equal(a["keypoints"], b["keypoints"])

    def test_window_cameras(self):
        """The camera family must include PARTIAL-rink windows: a model
        trained only on full-rink views regresses windowed broadcast
        frames toward the memorized layout (scripts/diag_homography.py:
        88 px keypoint error on span-0.82..0.95 clips)."""
        from hockey_tpu.train.data import SyntheticRinkDataset

        ds = SyntheticRinkDataset(imgsz=128, seed=9)
        vis_counts = []
        for i in range(32):
            item = ds.load(i)
            vis = item["keypoints"][0, :, 2] > 0.5
            vis_counts.append(int(vis.sum()))
            # out-of-frame keypoints are masked invisible, never clipped
            pts = item["keypoints"][0, vis, :2]
            assert (pts >= 0).all() and (pts < 128).all()
        # some views crop a meaningful share of the 56 keypoints...
        assert min(vis_counts) < 34, vis_counts
        # ...while the family still contains (near-)full-rink views
        assert max(vis_counts) >= 50, vis_counts

    def test_broadcast_camera_family(self):
        """The rich mixture's isotropic look-at family (round 5,
        COMPAT #32): valid finite homography, cheirality mask, and
        square-pixel intrinsics — density concentrated on the geometry
        deployment cameras actually produce."""
        from hockey_tpu.homography.ransac import project
        from hockey_tpu.train.data import SyntheticRinkDataset

        ds = SyntheticRinkDataset(imgsz=256, rich=True)
        rng = np.random.default_rng(7)
        for _ in range(8):
            h, front = ds._broadcast_camera(rng, 256)
            assert h.shape == (3, 3) and np.isfinite(h).all()
            assert front.shape == (56,) and front.dtype == bool
            pts = project(h, ds.table.astype(np.float64))
            assert np.isfinite(pts[front]).all()
        # rich items draw from all three camera branches and keep the
        # label contract
        vis_counts = []
        for i in range(24):
            item = ds.load(i)
            vis = item["keypoints"][0, :, 2] > 0.5
            pts = item["keypoints"][0, vis, :2]
            assert (pts >= 0).all() and (pts < 256).all()
            vis_counts.append(int(vis.sum()))
        assert max(vis_counts) >= 20, vis_counts
