"""Ship a trained checkpoint as a package default.

Copies a training checkpoint into hockey_tpu/data/weights/<model>.msgpack
(f16-compressed master; load_params restores f32), where
models/checkpoint.py:shipped_weights_path resolves it as the default for
Detector/model-manager loads.

    python scripts/ship_checkpoint.py checkpoints/player_x.msgpack.best \
        hockey-player-detection
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    # host-side file conversion: force the CPU backend so shipping never
    # contends with a training run on the TPU tunnel (plain env vars are
    # overridden by the axon sitecustomize; jax.config wins)
    import jax

    jax.config.update("jax_platforms", "cpu")
    src, model = sys.argv[1], sys.argv[2]
    from hockey_tpu.models.checkpoint import load_params, save_params
    from hockey_tpu.models.yolov8 import MODEL_ZOO

    assert model in MODEL_ZOO, f"unknown model {model}"
    params = load_params(src)
    dst = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "hockey_tpu", "data", "weights", f"{model}.msgpack")
    save_params(dst, params, dtype="float16")
    print(f"shipped {src} -> {dst} ({os.path.getsize(dst) / 1e6:.1f} MB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
