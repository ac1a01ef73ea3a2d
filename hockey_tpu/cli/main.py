"""CLI entry point.

Flag parity with reference hockey/main.py:387-419 (--source_path,
--target_path, --device, --rink-keypoints) plus the documented-but-missing
flags (README.md:126-139): --mode with the four processing modes and
--show-2d-map, and TPU-native additions (--headless for CI/benchmarks,
--frame-batch, checkpoints, --json-metrics, --calibration).
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

from ..core.config import Config, ProcessingMode


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Hockey Vision Analytics (TPU-native)")
    p.add_argument("--source_path", type=str, default=None,
                   help="Path to the source video file (required unless "
                        "--sources is given).")
    p.add_argument("--target_path", type=str, default=None,
                   help="Path to save the output video.")
    p.add_argument("--device", type=str, default="tpu",
                   help="Device hint ('tpu', 'cpu'); JAX picks the backend.")
    p.add_argument("--rink-keypoints", action="store_true",
                   help="Enable rink keypoint detection.")
    p.add_argument("--mode", type=str, default="TEAM_CLASSIFICATION",
                   choices=[m.value for m in ProcessingMode],
                   help="Processing mode (README.md:134-139).")
    p.add_argument("--show-2d-map", action="store_true",
                   help="Overlay the 2D overhead rink map.")
    p.add_argument("--calibration", type=str, default=None,
                   help="Calibration profile JSON to load (2D map).")
    p.add_argument("--headless", action="store_true",
                   help="No OpenCV windows; use default/provided team names.")
    p.add_argument("--team-names", type=str, default=None,
                   help="Comma-separated 'HOME,AWAY' names (headless init).")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="Player-model msgpack checkpoint.")
    p.add_argument("--rink-checkpoint", type=str, default=None)
    p.add_argument("--puck-checkpoint", type=str, default=None)
    p.add_argument("--frame-batch", type=int, default=None,
                   help="Frames per device detection batch.")
    p.add_argument("--imgsz", type=int, default=None,
                   help="Detection resolution (default 1280).")
    p.add_argument("--conf", type=float, default=None,
                   help="Detection confidence threshold (default 0.4).")
    p.add_argument("--annotator", type=str, default="box",
                   choices=["box", "ellipse", "styled"],
                   help="Player annotator style: rectangles (reference "
                        "default), ground ellipses, or styled label chips.")
    p.add_argument("--json-metrics", type=str, default=None,
                   help="Write per-stage timing/counters JSON here.")
    p.add_argument("--limit-frames", type=int, default=None,
                   help="Stop after N output frames.")
    p.add_argument("--sources", type=str, default=None,
                   help="Comma-separated clip list for multi-clip batch "
                        "mode (one device megastep per frame across clips; "
                        "overrides --source_path).")
    p.add_argument("--resume", type=str, default=None,
                   help="Resume from a run-state file (core/session.py).")
    p.add_argument("--save-state", type=str, default=None,
                   help="Write run state here (for later --resume).")
    p.add_argument("--save-state-every", type=int, default=300,
                   help="Autosave interval in frames when --save-state set.")
    p.add_argument("--profile", type=str, default=None,
                   help="Capture a jax.profiler trace to this directory.")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.headless:
        os.environ["HOCKEY_TPU_HEADLESS"] = "1"

    if args.sources:
        return _main_multiclip(args)

    if not args.source_path:
        raise SystemExit("--source_path (or --sources) is required")
    if not Path(args.source_path).exists():
        raise FileNotFoundError(f"Source video not found: {args.source_path}")

    config = Config()
    if args.frame_batch:
        config.frame_batch = args.frame_batch
    if args.imgsz:
        config.detection_imgsz = args.imgsz
    if args.conf is not None:
        config.detection_confidence = args.conf
    config.annotator_style = args.annotator

    from ..pipeline import VideoProcessor, process_video_with_display
    from ..video.io import VideoInfo

    info = VideoInfo.from_video_path(args.source_path)
    team_names = None
    if args.team_names:
        parts = args.team_names.split(",")
        if len(parts) == 2:
            team_names = (parts[0].strip(), parts[1].strip())

    processor = VideoProcessor(
        config=config,
        device=args.device,
        enable_rink_keypoints=args.rink_keypoints,
        mode=ProcessingMode(args.mode),
        frame_hw=(info.height, info.width),
        checkpoint=args.checkpoint,
        rink_checkpoint=args.rink_checkpoint,
        puck_checkpoint=args.puck_checkpoint,
        team_names=team_names,
        show_2d_map=args.show_2d_map,
        calibration_profile=args.calibration,
    )

    from ..utils.profiling import device_trace

    trace_ctx = device_trace(args.profile)
    trace_ctx.__enter__()

    start_frame = 0
    if args.resume:
        from ..core.session import load_run_state

        start_frame = load_run_state(args.resume, processor)
        print(f"Resumed from {args.resume} at frame {start_frame}")

    if args.limit_frames or args.resume or args.save_state:
        import itertools

        import cv2

        from ..core.session import save_run_state
        from ..pipeline import VideoSinkWriter

        gen = processor.process_video(args.source_path,
                                      start_frame=start_frame,
                                      skip_init=bool(args.resume))
        if args.limit_frames:
            gen = itertools.islice(gen, args.limit_frames)
        sink = VideoSinkWriter(args.target_path, info) if args.target_path else None
        n = 0
        try:
            for frame in gen:
                if sink:
                    sink.write(frame)
                n += 1
                if args.save_state and n % args.save_state_every == 0:
                    save_run_state(args.save_state, processor, start_frame + n)
                if not args.headless:
                    cv2.imshow("Hockey Vision", frame)
                    if cv2.waitKey(1) & 0xFF == ord("q"):
                        break
            if args.save_state:
                save_run_state(args.save_state, processor, start_frame + n)
                print(f"Run state saved to {args.save_state}")
        finally:
            # always finalize the mp4 (moov atom) and tear down windows,
            # even on exceptions or a q-quit
            if sink:
                sink.close()
            if not args.headless:
                cv2.destroyAllWindows()
    else:
        n = process_video_with_display(
            processor, args.source_path, args.target_path,
            display=not args.headless,
        )

    trace_ctx.__exit__(None, None, None)
    print(f"Processed {n} frames.")
    processor.timers.dump_json(args.json_metrics)
    if args.json_metrics:
        print(f"Metrics written to {args.json_metrics}")
    return 0


def _main_multiclip(args) -> int:
    """Multi-clip batch mode: K clips, one device megastep per frame row."""
    sources = [s.strip() for s in args.sources.split(",") if s.strip()]
    for s in sources:
        if not Path(s).exists():
            raise FileNotFoundError(f"Source video not found: {s}")

    config = Config()
    if args.imgsz:
        config.detection_imgsz = args.imgsz
    if args.conf is not None:
        config.detection_confidence = args.conf

    from ..multiclip import MultiClipProcessor

    team_names = None
    if args.team_names:
        parts = args.team_names.split(",")
        if len(parts) == 2:
            team_names = (parts[0].strip(), parts[1].strip())

    mp = MultiClipProcessor(
        sources, config=config, mode=ProcessingMode(args.mode),
        team_names=team_names, checkpoint=args.checkpoint,
    )
    targets = None
    if args.target_path:
        base = Path(args.target_path)
        targets = [str(base.with_name(f"{base.stem}_{i}{base.suffix}"))
                   for i in range(len(sources))]
    counts = mp.run(targets, limit_frames=args.limit_frames)
    print(f"Processed {counts} frames across {len(sources)} clips.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
