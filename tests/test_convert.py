"""Weight-converter tests: synthesize an ultralytics-style state dict for
the tiny variant, convert, and check every tensor landed (values + layout).
(The real .pt checkpoints are gitignored upstream and unavailable here —
SURVEY.md §0 — so this validates the mapping's internal consistency.)"""

import numpy as np
import pytest

import jax

from hockey_tpu.models.convert import _BACKBONE_IDX, convert_state_dict
from hockey_tpu.models.yolov8 import YoloConfig, init_params

TINY = YoloConfig("n", num_classes=2)


def synth_state_dict(cfg: YoloConfig, rng) -> dict:
    """Build a state dict with the ultralytics key layout, shaped to match
    our init tree (OIHW conv weights)."""
    ours = init_params(cfg, seed=0)
    sd = {}

    def conv_entries(prefix, p):
        w = np.asarray(p["w"])  # HWIO
        sd[f"{prefix}.conv.weight"] = rng.normal(
            size=(w.shape[3], w.shape[2], w.shape[0], w.shape[1])).astype(np.float32)
        if "bn" in p:
            c = w.shape[3]
            sd[f"{prefix}.bn.weight"] = rng.normal(size=c).astype(np.float32)
            sd[f"{prefix}.bn.bias"] = rng.normal(size=c).astype(np.float32)
            sd[f"{prefix}.bn.running_mean"] = rng.normal(size=c).astype(np.float32)
            sd[f"{prefix}.bn.running_var"] = rng.uniform(0.5, 2, c).astype(np.float32)

    def c2f_entries(prefix, p):
        conv_entries(f"{prefix}.cv1", p["cv1"])
        conv_entries(f"{prefix}.cv2", p["cv2"])
        for i, m in enumerate(p["m"]):
            conv_entries(f"{prefix}.m.{i}.cv1", m["cv1"])
            conv_entries(f"{prefix}.m.{i}.cv2", m["cv2"])

    for idx, (group, name) in _BACKBONE_IDX.items():
        p = ours[group][name]
        mp = f"model.{idx}"
        if name.startswith(("stem", "down")):
            conv_entries(mp, p)
        elif name == "sppf":
            conv_entries(f"{mp}.cv1", p["cv1"])
            conv_entries(f"{mp}.cv2", p["cv2"])
        else:
            c2f_entries(mp, p)

    for br_torch, br_ours in (("cv2", "reg"), ("cv3", "cls")):
        for lvl in range(3):
            dst = ours["head"][br_ours][lvl]
            mp = f"model.22.{br_torch}.{lvl}"
            conv_entries(f"{mp}.0", dst["cv1"])
            conv_entries(f"{mp}.1", dst["cv2"])
            w = np.asarray(dst["out"]["w"])
            sd[f"{mp}.2.weight"] = rng.normal(
                size=(w.shape[3], w.shape[2], 1, 1)).astype(np.float32)
            sd[f"{mp}.2.bias"] = rng.normal(size=w.shape[3]).astype(np.float32)
    return sd


class TestConverter:
    def test_all_tensors_land_with_layout(self, rng):
        sd = synth_state_dict(TINY, rng)
        params = convert_state_dict(sd, TINY)
        # stem kernel: OIHW -> HWIO transpose
        got = np.asarray(params["backbone"]["stem"]["w"])
        want = np.transpose(sd["model.0.conv.weight"], (2, 3, 1, 0))
        np.testing.assert_allclose(got, want)
        # BN stats carried over
        np.testing.assert_allclose(
            np.asarray(params["backbone"]["stem"]["bn"]["mean"]),
            sd["model.0.bn.running_mean"])
        # deep block: last neck c2f bottleneck conv
        got = np.asarray(params["neck"]["c2f_d2"]["m"][0]["cv1"]["w"])
        want = np.transpose(sd["model.21.m.0.cv1.conv.weight"], (2, 3, 1, 0))
        np.testing.assert_allclose(got, want)
        # head plain conv bias
        np.testing.assert_allclose(
            np.asarray(params["head"]["cls"][2]["out"]["b"]),
            sd["model.22.cv3.2.2.bias"])

    def test_converted_tree_runs_forward(self, rng):
        import jax.numpy as jnp

        from hockey_tpu.models.yolov8 import forward_raw

        sd = synth_state_dict(TINY, rng)
        params = convert_state_dict(sd, TINY)
        out = forward_raw(params, jnp.zeros((1, 64, 64, 3), jnp.float32), TINY)
        assert out["box"][0].shape == (1, 8, 8, 64)

    def test_missing_key_raises(self, rng):
        sd = synth_state_dict(TINY, rng)
        del sd["model.0.conv.weight"]
        with pytest.raises(KeyError):
            convert_state_dict(sd, TINY)
