"""Pallas NMS suppression kernel: interpret-mode parity on CPU (the
compiled kernel is exercised on real TPU by the detection megastep)."""

import numpy as np

import jax.numpy as jnp

from hockey_tpu.ops.iou import box_iou
from hockey_tpu.ops.nms import _suppress_exact
from hockey_tpu.ops.pallas.nms_kernel import suppress_pallas


def test_pallas_suppress_matches_exact(rng):
    k = 128
    boxes = rng.uniform(0, 500, (k, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(10, 80, (k, 2))
    iou = box_iou(jnp.asarray(boxes), jnp.asarray(boxes))
    keep0 = jnp.asarray(rng.uniform(size=k) > 0.1)
    ref = np.asarray(_suppress_exact(iou, keep0, 0.5))
    got = np.asarray(suppress_pallas(iou, keep0, 0.5, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_pallas_suppress_all_disjoint(rng):
    k = 64
    # boxes on a diagonal, no overlap: everything valid survives
    xs = np.arange(k, dtype=np.float32) * 100
    boxes = np.stack([xs, xs, xs + 50, xs + 50], axis=1)
    iou = box_iou(jnp.asarray(boxes), jnp.asarray(boxes))
    keep0 = jnp.ones(k, bool)
    got = np.asarray(suppress_pallas(iou, keep0, 0.5, interpret=True))
    assert got.all()
