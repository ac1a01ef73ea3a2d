"""Team classification tests: device feature parity, each strategy's
discrimination on synthetic jerseys, cascade fallback contract."""

import numpy as np
import pytest

import jax.numpy as jnp

from hockey_tpu.teams.base import MajorityVote, standardize_crops
from hockey_tpu.teams.facade import TeamClassifier
from hockey_tpu.teams.features import (
    color_prior_masks,
    hybrid_color_features,
    segmentation_features,
    simple_jersey_stats,
)
from hockey_tpu.teams.simple import SimpleTeamClassifier


def make_crop(color_bgr, h=128, w=64, ice=(235, 235, 235), noise=0.0, rng=None):
    """Synthetic player crop: ice background + colored torso rectangle."""
    crop = np.full((h, w, 3), ice, np.float32)
    # jersey spans the torso windows of every classifier variant
    # (simple: rows 25-75% cols 30-70%; segmentation prior: rows 15-60%)
    crop[int(h * 0.15): int(h * 0.78), int(w * 0.25): int(w * 0.75)] = color_bgr
    if noise and rng is not None:
        crop = crop + rng.normal(0, noise, crop.shape)
    return np.clip(crop, 0, 255).astype(np.uint8)


RED = (40, 40, 200)     # colored jersey (BGR)
WHITE = (250, 250, 250)  # white jersey


class TestFeatures:
    def test_hybrid_features_layout_vs_reference_math(self, rng):
        """Spot-check the 49-dim layout against direct numpy/cv2 math."""
        import cv2

        crop = make_crop(RED, noise=5.0, rng=rng)
        batch = jnp.asarray(crop[None].astype(np.float32))
        masks = jnp.ones((1, 128, 64), jnp.float32)
        feats = np.asarray(hybrid_color_features(batch, masks))[0]
        assert feats.shape == (49,)
        hsv = cv2.cvtColor(crop, cv2.COLOR_BGR2HSV)
        h_hist = cv2.calcHist([hsv], [0], None, [18], [0, 180]).flatten()
        h_hist = h_hist / (h_hist.sum() + 1e-7)
        np.testing.assert_allclose(feats[:18], h_hist, atol=0.02)
        np.testing.assert_allclose(feats[26 + 8], hsv.mean(axis=(0, 1))[0] / 255, atol=0.02)
        white_ratio = ((hsv[..., 2] > 200) & (hsv[..., 1] < 30)).mean()
        np.testing.assert_allclose(feats[-1], white_ratio, atol=0.03)

    def test_segmentation_features_white_vs_colored(self):
        crops = jnp.asarray(np.stack([
            make_crop(WHITE).astype(np.float32),
            make_crop(RED).astype(np.float32),
        ]))
        masks = color_prior_masks(crops)
        feats = np.asarray(segmentation_features(crops, masks))
        assert feats[0, 0] > 0.5, "white jersey white_ratio too low"
        assert feats[1, 0] < 0.2, "colored jersey white_ratio too high"
        assert feats[1, 2] > feats[0, 2], "colored jersey should have higher saturation"

    def test_color_prior_mask_hits_jersey(self):
        crop = jnp.asarray(make_crop(RED).astype(np.float32))
        mask = np.asarray(color_prior_masks(crop[None]))[0]
        # mask should cover mostly the torso region, not the ice
        assert mask[70, 32] == 1.0  # inside torso
        assert mask[5, 5] == 0.0    # ice corner
        assert mask.sum() > 300

    def test_insufficient_mask_defaults(self):
        crops = jnp.zeros((1, 128, 64, 3), jnp.float32)
        masks = jnp.zeros((1, 128, 64), jnp.float32)
        feats = np.asarray(segmentation_features(crops, masks))[0]
        np.testing.assert_allclose(feats, [0.5, 0.0, 0.0, 128.0])


class TestMajorityVote:
    def test_vote_overrides_flicker(self):
        v = MajorityVote(window=10, min_votes=3)
        ids = np.asarray([7])
        for _ in range(4):
            out = v.update(ids, np.asarray([1]))
        out = v.update(ids, np.asarray([0]))  # single flicker
        assert out[0] == 1

    def test_no_ids_passthrough(self):
        v = MajorityVote()
        out = v.update(None, np.asarray([0, 1]))
        np.testing.assert_array_equal(out, [0, 1])


class TestSimpleClassifier:
    def test_white_vs_colored(self):
        clf = SimpleTeamClassifier()
        crops = [make_crop(WHITE), make_crop(RED)]
        teams = clf.predict(crops)
        assert teams[0] == 0 and teams[1] == 1


class TestSegmentationClassifier:
    def test_fit_predict_separates_teams(self, rng):
        from hockey_tpu.teams.segmentation import SegmentationTeamClassifier

        clf = SegmentationTeamClassifier()
        crops = [make_crop(WHITE, noise=8, rng=rng) for _ in range(10)] + \
                [make_crop(RED, noise=8, rng=rng) for _ in range(10)]
        clf.fit(crops)
        assert clf.kmeans is not None
        teams = clf.predict([make_crop(WHITE, noise=8, rng=rng),
                             make_crop(RED, noise=8, rng=rng)])
        assert teams[0] == 0 and teams[1] == 1

    def test_masks_stored_for_visualization(self, rng):
        from hockey_tpu.teams.segmentation import SegmentationTeamClassifier

        clf = SegmentationTeamClassifier(visualize_segmentation=True)
        crops = [make_crop(RED)]
        clf.predict(crops, tracker_ids=np.asarray([3]))
        masks = clf.get_segmentation_masks([3])
        assert 3 in masks and masks[3].shape == (128, 64)


class TestHybridClassifier:
    def test_fit_predict_with_knn(self, rng):
        from hockey_tpu.teams.hybrid import HybridTeamClassifier

        clf = HybridTeamClassifier()
        crops = [make_crop(WHITE, noise=8, rng=rng) for _ in range(8)] + \
                [make_crop(RED, noise=8, rng=rng) for _ in range(8)]
        clf.fit(crops)
        assert clf.fitted_features is not None
        teams = clf.predict([make_crop(WHITE, noise=8, rng=rng),
                             make_crop(RED, noise=8, rng=rng)])
        assert teams[0] == 0 and teams[1] == 1

    def test_fit_requires_enough_crops(self):
        from hockey_tpu.teams.hybrid import HybridTeamClassifier

        with pytest.raises(ValueError):
            HybridTeamClassifier().fit([make_crop(RED)])


class TestRobustClassifier:
    def test_fit_predict_assignments(self, rng):
        from hockey_tpu.teams.robust import RobustTeamClassifier

        clf = RobustTeamClassifier()
        crops = [make_crop(WHITE, noise=8, rng=rng) for _ in range(12)] + \
                [make_crop(RED, noise=8, rng=rng) for _ in range(12)]
        clf.fit(crops)
        a = clf.predict([make_crop(WHITE, noise=8, rng=rng),
                         make_crop(RED, noise=8, rng=rng)])
        labels = clf.get_team_labels(a)
        assert labels[0] == 0 and labels[1] == 1
        confs = clf.get_confidences(a)
        assert (confs >= 0).all() and (confs <= 1).all()

    def test_temporal_consistency_override(self, rng):
        from hockey_tpu.teams.robust import (
            PlayerProfile,
            RobustTeamClassifier,
            TeamAssignment,
        )

        clf = RobustTeamClassifier()
        clf.player_profiles[1] = PlayerProfile(1, [0] * 10, [0.9] * 10, 0)
        a = clf._apply_temporal_consistency(TeamAssignment(1, 0.5), 1)
        # reference semantics: disagreeing assignment keeps its team (max
        # consistency with the appended vote is 4/5 = 0.8, not > 0.8) but
        # its confidence is penalized by consistency * 0.3
        assert a.team_id == 1
        assert a.confidence < 0.5
        # an agreeing assignment gets a consistency bonus instead
        b = clf._apply_temporal_consistency(TeamAssignment(0, 0.5), 1)
        assert b.team_id == 0 and b.confidence > 0.5


class TestInteractiveClassifier:
    def test_headless_examples_and_predict(self, rng):
        from hockey_tpu.teams.interactive import InteractiveTeamClassifier

        clf = InteractiveTeamClassifier()
        ok = clf.initialize_from_examples(
            [make_crop(WHITE, noise=5, rng=rng) for _ in range(3)],
            [make_crop(RED, noise=5, rng=rng) for _ in range(3)],
        )
        assert ok
        teams = clf.predict([make_crop(WHITE, noise=5, rng=rng),
                             make_crop(RED, noise=5, rng=rng)])
        assert teams[0] == 0 and teams[1] == 1

    def test_predict_without_init_raises(self):
        from hockey_tpu.teams.interactive import InteractiveTeamClassifier

        with pytest.raises(ValueError):
            InteractiveTeamClassifier().predict([make_crop(RED)])


class TestFacadeCascade:
    def test_default_is_segmentation(self):
        clf = TeamClassifier()
        assert clf.active_strategy == "segmentation"

    def test_flags_control_strategy(self):
        clf = TeamClassifier(use_segmentation=False, use_interactive=False,
                             use_robust=False, use_hybrid=False)
        assert clf.active_strategy == "simple"

    def test_fit_failure_demotes(self, rng, monkeypatch):
        clf = TeamClassifier(use_interactive=False, use_robust=False,
                             use_hybrid=False)
        # too few crops for segmentation kmeans fit -> but seg fit returns
        # silently; force a crash to exercise the demotion path
        def boom(*a, **k):
            raise RuntimeError("boom")

        monkeypatch.setattr(clf._impl, "fit", boom)
        crops = [make_crop(RED) for _ in range(4)]
        clf.fit(crops)
        assert clf.active_strategy == "simple"
        teams = clf.predict([make_crop(WHITE), make_crop(RED)])
        assert list(teams) == [0, 1]

    def test_team_names(self):
        clf = TeamClassifier()
        clf.set_team_names({0: "TOR", 1: "DET"})
        assert clf.get_team_name(0) == "TOR"
        assert clf.get_team_name(1) == "DET"
        assert clf.get_team_name(5) == "Team 5"

    def test_end_to_end_fit_predict(self, rng):
        clf = TeamClassifier()
        crops = [make_crop(WHITE, noise=8, rng=rng) for _ in range(10)] + \
                [make_crop(RED, noise=8, rng=rng) for _ in range(10)]
        clf.fit(crops, positions=[(i * 10.0, 100.0) for i in range(20)])
        teams = clf.predict(
            [make_crop(WHITE, noise=8, rng=rng), make_crop(RED, noise=8, rng=rng)],
            tracker_ids=np.asarray([1, 2]),
        )
        assert list(teams) == [0, 1]


class TestCropResize:
    def test_crop_and_resize_matches_region(self, rng):
        from hockey_tpu.ops.crop_resize import crop_and_resize

        frame = rng.integers(0, 255, (100, 200, 3)).astype(np.float32)
        boxes = jnp.asarray([[50.0, 20, 100, 80]])
        out = np.asarray(crop_and_resize(jnp.asarray(frame), boxes, (60, 50)))
        assert out.shape == (1, 60, 50, 3)
        # center pixel should match the frame's region center
        np.testing.assert_allclose(out[0, 30, 25], frame[50, 75], atol=2.0)

    def test_standardize_crops_handles_empty(self):
        out = standardize_crops([np.zeros((0, 0, 3), np.uint8), None])
        assert out.shape == (2, 128, 64, 3)


class TestFramePredictFastPath:
    def test_predict_from_frame_matches_crop_predict(self, rng):
        """Device frame-sampling path must agree with the host-crop path."""
        from hockey_tpu.teams.segmentation import SegmentationTeamClassifier

        frame = np.full((400, 600, 3), 235, np.uint8)
        # two players drawn directly in the frame
        frame[100:226, 100:164] = WHITE
        frame[100:226, 400:464] = RED
        boxes = np.asarray([[95, 80, 175, 260], [395, 80, 475, 260]], np.float32)

        clf = SegmentationTeamClassifier()
        crops = [make_crop(WHITE, noise=6, rng=rng) for _ in range(8)] + \
                [make_crop(RED, noise=6, rng=rng) for _ in range(8)]
        clf.fit(crops)
        fast = clf.predict_from_frame(frame, boxes, np.asarray([1, 2]))
        host_crops = [frame[80:260, 95:175], frame[80:260, 395:475]]
        clf2 = SegmentationTeamClassifier()
        clf2.kmeans = clf.kmeans
        slow = clf2.predict(host_crops, np.asarray([1, 2]))
        np.testing.assert_array_equal(fast, slow)

    def test_facade_frame_predict_fallback(self, rng):
        """Strategies without a fast path fall back to host crops."""
        frame = np.full((300, 400, 3), 235, np.uint8)
        frame[50:176, 50:114] = RED
        boxes = np.asarray([[45, 30, 125, 210]], np.float32)
        clf = TeamClassifier(use_segmentation=False, use_interactive=False,
                             use_robust=False, use_hybrid=False)
        teams = clf.predict_from_frame(frame, boxes, np.asarray([1]))
        assert len(teams) == 1

    def test_capacity_padding_consistent(self, rng):
        from hockey_tpu.teams.segmentation import SegmentationTeamClassifier

        clf = SegmentationTeamClassifier()
        frame = np.full((300, 400, 3), 235, np.uint8)
        frame[50:176, 50:114] = RED
        b = np.asarray([[45, 30, 125, 210]], np.float32)
        one = clf.predict_from_frame(frame, b)
        # 40 boxes forces the capacity to grow past the default 32
        many = clf.predict_from_frame(frame, np.repeat(b, 40, 0))
        assert len(many) == 40
        assert (many == one[0]).all()


class TestInteractiveMontage:
    def test_visualize_examples_layout(self, rng):
        """Montage parity with reference team_interactive.py:357-410: two
        100-px rows of example crops with 10-px gaps + count labels."""
        from hockey_tpu.teams.interactive import InteractiveTeamClassifier

        c = InteractiveTeamClassifier()
        assert c.visualize_examples() is None  # before initialization
        crops0 = [np.full((80, 40, 3), 240, np.uint8) for _ in range(3)]
        crops1 = [np.full((60, 30, 3), (0, 0, 180), np.uint8)
                  for _ in range(2)]
        assert c.initialize_from_examples(crops0, crops1)
        canvas = c.visualize_examples()
        assert canvas is not None and canvas.dtype == np.uint8
        # 2 rows of 100 px + 3 gaps of 10 + 60 header space
        assert canvas.shape[0] == 100 * 2 + 10 * 3 + 60
        # team-0 row: 3 crops at 50px wide + 2 gaps
        assert canvas.shape[1] == 3 * 50 + 2 * 10
        # crops actually pasted (not all white)
        assert (canvas < 200).any()


class TestTrainedEmbeddings:
    def test_color_ambiguous_teams_separate(self):
        """Two teams with the SAME hue but different patterns (solid vs
        hoops) must separate in the trained embedding space — the signal
        color features alone cannot provide (reference contract:
        team_robust.py:59-97 leans on visual embeddings for this)."""
        import pytest

        from hockey_tpu.models import mobilenetv3 as mnv3
        from hockey_tpu.teams.embed_train import render_design

        params = mnv3.load_default_params()
        if params is None:
            pytest.skip("shipped embedding checkpoint not present")
        rng = np.random.default_rng(5)
        base = np.asarray([40.0, 40.0, 200.0])  # same red hue for both
        da = {"base": base, "second": np.asarray([240.0, 240.0, 240.0]),
              "pattern": "solid"}
        db = {"base": base, "second": np.asarray([240.0, 240.0, 240.0]),
              "pattern": "hoops"}
        crops = [render_design(rng, da) for _ in range(8)] + \
                [render_design(rng, db) for _ in range(8)]
        import jax.numpy as jnp

        z = np.asarray(mnv3.embed(
            params, mnv3.preprocess_bgr(jnp.asarray(np.stack(crops)))))
        z = z / (np.linalg.norm(z, axis=1, keepdims=True) + 1e-6)
        sim = z @ z.T
        within = (sim[:8, :8].sum() - 8 + sim[8:, 8:].sum() - 8) / (2 * 56)
        across = sim[:8, 8:].mean()
        assert within > across + 0.08, (
            f"within {within:.3f} vs across {across:.3f}")
        # 2-means on the embeddings must recover the two patterns
        from sklearn.cluster import KMeans

        labels = KMeans(n_clusters=2, random_state=0, n_init=10).fit(z).labels_
        acc = max((labels[:8] == labels[0]).mean()
                  + (labels[8:] != labels[0]).mean(),
                  (labels[:8] != labels[0]).mean()
                  + (labels[8:] == labels[0]).mean()) / 2
        assert acc >= 0.9, f"cluster accuracy {acc}"
