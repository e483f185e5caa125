"""pvot command-line interface.

Mirrors the reference CLI surface (tracker_ghc/src/main.cpp:57-79 and
run_tracker.sh:16-27):

    pvot [video] [--cpu|--shared|--const|--const_tiled|--batch=N]
         [--record] [--first]

plus headless extensions the reference lacks (its ROI selection is GUI-only,
record_tracker hard-fails without DISPLAY, main.cpp:281-285):

    --roi X,Y,W,H     template box, skips the GUI selector
    --start-frame K   template source frame (reference: interactive preview)
    --output PATH     override the generated output path
    --max-frames N    stop after N tracked frames
    --synthetic WxHxF generate a deterministic clip instead of reading a file
    --strategy, --chunk-size, --search-radius, ... tracking knobs (the
                      reference's compile-time constants, main.cpp:10-23)

Output naming matches generate_output_path (main.cpp:28-47):
output/<base>_<mode>[_<batch>]<ext>, with mkdir("output").
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import List, Optional, Tuple

import numpy as np

from pvot.config import TrackerConfig


# Reference mode-flag spelling (main.cpp:63-75).
_MODE_FLAGS = {
    "--cpu": "cpu",
    "--shared": "shared",
    "--const": "const",
    "--const_tiled": "const_tiled",
}


def generate_output_path(video_path: str, mode: str, batch_size: int) -> str:
    """Port of generate_output_path (tracker_ghc/src/main.cpp:28-47)."""
    base = os.path.basename(video_path)
    root, ext = os.path.splitext(base)
    if not ext:
        ext = ".mp4"
        root = base
    os.makedirs("output", exist_ok=True)
    filename = f"output/{root}_{mode}"
    if mode == "batch" and batch_size > 0:
        filename += f"_{batch_size}"
    return filename + ext


def parse_args(argv: List[str]):
    """Hand-rolled to accept the reference's exact flag spelling (including
    --batch=N) alongside the extended options."""
    mode = "cuda"  # reference default (main.cpp:59)
    batch_size = 0
    passthrough = []
    for arg in argv:
        if arg in _MODE_FLAGS:
            mode = _MODE_FLAGS[arg]
        elif arg.startswith("--batch="):
            mode = "batch"
            batch_size = max(1, int(arg.split("=", 1)[1] or 1))
        else:
            passthrough.append(arg)

    p = argparse.ArgumentParser(
        prog="pvot",
        description="TPU-native NCC video object tracker",
    )
    p.add_argument("video", nargs="?", default="data/car.mp4")
    p.add_argument("--record", action="store_true", help="write annotated video")
    p.add_argument("--first", action="store_true", help="template from first frame")
    p.add_argument("--roi", type=str, default=None, help="X,Y,W,H template box (headless)")
    p.add_argument("--start-frame", type=int, default=0)
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--max-frames", type=int, default=0)
    p.add_argument("--synthetic", type=str, default=None, metavar="WxHxF")
    p.add_argument("--strategy", choices=["fused", "full"], default="fused")
    p.add_argument("--chunk-size", type=int, default=32)
    p.add_argument("--search-radius", type=int, default=None)
    p.add_argument("--search-radius-x", type=int, default=TrackerConfig.search_radius_x)
    p.add_argument("--search-radius-y", type=int, default=TrackerConfig.search_radius_y)
    p.add_argument("--min-confidence", type=float, default=TrackerConfig.min_confidence)
    p.add_argument("--global-confidence", type=float, default=TrackerConfig.global_confidence)
    p.add_argument("--strong-confidence", type=float, default=TrackerConfig.strong_confidence)
    p.add_argument("--template-update-lr", type=float, default=TrackerConfig.template_update_lr)
    p.add_argument("--lost-frame-threshold", type=int, default=TrackerConfig.lost_frame_threshold)
    p.add_argument(
        "--no-global-search", action="store_true",
        help="disable lost-object re-acquisition (the reference Windows-tree"
             "/main_old behavior)",
    )
    p.add_argument("--no-display", action="store_true", help="never open GUI windows")
    p.add_argument(
        "--checkpoint-out", type=str, default=None,
        help="save the final tracker state (bbox/template/counters) to this .npz",
    )
    p.add_argument(
        "--resume", type=str, default=None,
        help="resume from a tracker-state .npz instead of selecting a ROI",
    )
    args = p.parse_args(passthrough)
    args.mode = mode
    args.batch_size = batch_size
    if args.search_radius is not None:
        args.search_radius_x = args.search_radius_y = args.search_radius
    return args


def _config_from_args(args) -> TrackerConfig:
    return TrackerConfig(
        search_radius_x=args.search_radius_x,
        search_radius_y=args.search_radius_y,
        batch_size=args.batch_size or TrackerConfig.batch_size,
        min_confidence=args.min_confidence,
        global_confidence=args.global_confidence,
        strong_confidence=args.strong_confidence,
        template_update_lr=args.template_update_lr,
        lost_frame_threshold=args.lost_frame_threshold,
        enable_global_search=not args.no_global_search,
    ).validate()


def _load_frames(args) -> Tuple[np.ndarray, float]:
    """Returns (BGR frames (F,H,W,3) uint8, fps)."""
    if args.synthetic:
        from pvot.io.synthetic import SyntheticSpec, generate_bgr_frames

        try:
            w, h, f = (int(v) for v in args.synthetic.lower().split("x"))
        except ValueError:
            print(
                f"Invalid --synthetic {args.synthetic!r}: expected WxHxF, "
                "e.g. 1280x720x300",
                file=sys.stderr,
            )
            raise SystemExit(2)
        spec = SyntheticSpec(width=w, height=h, num_frames=f)
        return np.stack(list(generate_bgr_frames(spec))), 30.0
    from pvot.io.video import VideoReader

    with VideoReader(args.video) as r:
        fps = r.fps
        frames = list(r)
    if not frames:
        print(f"Cannot open video: {args.video}", file=sys.stderr)
        raise SystemExit(-1)
    return np.stack(frames), fps


def _select_roi(args, frames_bgr: np.ndarray) -> Tuple[int, Tuple[int, int, int, int]]:
    """Template selection: --roi (headless) or GUI selectROI like the
    reference (main.cpp:287-319)."""
    start = min(args.start_frame, len(frames_bgr) - 1)
    if args.first:
        start = 0
    if args.roi:
        try:
            x, y, w, h = (int(v) for v in args.roi.split(","))
        except ValueError:
            print(
                f"Invalid --roi {args.roi!r}: expected X,Y,W,H integers",
                file=sys.stderr,
            )
            raise SystemExit(2)
        fh, fw = frames_bgr.shape[1:3]
        if w <= 0 or h <= 0:
            print("No template selected", file=sys.stderr)
            raise SystemExit(-1)
        if x < 0 or y < 0 or x + w > fw or y + h > fh:
            print(
                f"--roi {args.roi} lies outside the {fw}x{fh} frame",
                file=sys.stderr,
            )
            raise SystemExit(2)
        return start, (x, y, w, h)
    if args.no_display or not os.environ.get("DISPLAY"):
        print(
            "DISPLAY not set\n(headless runs need --roi X,Y,W,H)",
            file=sys.stderr,
        )
        raise SystemExit(-1)
    import cv2

    frame = frames_bgr[start]
    if not args.first:
        # Frame-preview browser: ENTER selects, ESC quits (main.cpp:295-312).
        print(
            "Use the preview window to pick a frame that contains the target object.\n"
            "Press ENTER to select the current frame. Press ESC to quit."
        )
        cv2.namedWindow("Frame Preview", cv2.WINDOW_NORMAL)
        idx = start
        while True:
            if idx >= len(frames_bgr):
                print("Reached End of Video.", file=sys.stderr)
                raise SystemExit(-1)
            frame = frames_bgr[idx]
            cv2.imshow("Frame Preview", frame)
            key = cv2.waitKey(30)
            if key == 27:
                print("Template selection cancelled by user.")
                raise SystemExit(0)
            if key in (13, 10):
                break
            idx += 1
        cv2.destroyWindow("Frame Preview")
        start = idx
    roi = cv2.selectROI("Select Template", frame, False, False)
    cv2.destroyWindow("Select Template")
    if roi[2] == 0 or roi[3] == 0:
        print("No template selected", file=sys.stderr)
        raise SystemExit(-1)
    return start, tuple(int(v) for v in roi)


def _draw_bbox(frame_bgr: np.ndarray, bbox, color=(0, 255, 0)) -> None:
    import cv2

    x, y, w, h = (int(v) for v in bbox)
    cv2.rectangle(frame_bgr, (x, y), (x + w, y + h), color, 2)


def _draw_fps(frame_bgr: np.ndarray, fps: float) -> None:
    import cv2

    cv2.putText(
        frame_bgr, f"FPS: {fps:.1f}", (20, 30),
        cv2.FONT_HERSHEY_SIMPLEX, 0.8, (0, 255, 0), 2,
    )


def run_tracking(args) -> int:
    import jax.numpy as jnp

    from pvot.io.gray import bgr_to_gray_u8, gray_u8_to_f32
    from pvot.tracker.scan import track_video, track_video_batched
    from pvot.tracker.state import init_state

    config = _config_from_args(args)
    frames_bgr, fps = _load_frames(args)
    if args.resume:
        # Resume a stream: state (bbox/template/counters) comes from the
        # checkpoint; the video supplies the remaining frames.  The
        # reference has no such facility (SURVEY.md §5 checkpoint row).
        from pvot.utils.checkpoint import load_state

        state = load_state(args.resume)
        roi = tuple(int(v) for v in (
            state.bbox_x, state.bbox_y, state.bbox_w, state.bbox_h
        ))
        start = 0
        # Frame 0 is tracked (not a template source) when resuming.
        frames_bgr = np.concatenate([frames_bgr[:1], frames_bgr], axis=0)
    else:
        start, roi = _select_roi(args, frames_bgr)
        state = None
    frames_bgr = frames_bgr[start:]
    if args.max_frames:
        frames_bgr = frames_bgr[: args.max_frames + 1]

    from pvot.runtime import native

    gray = native.bgr_to_gray_u8(frames_bgr)
    if state is None:
        x, y, w, h = roi
        templ = gray_u8_to_f32(gray[0])[y : y + h, x : x + w]
        state = init_state(jnp.asarray(templ), roi)

    backend = args.mode
    mode_label = args.mode
    print(f"Tracking mode: {mode_label}" + (
        f" (batch size: {args.batch_size})" if args.mode == "batch" else ""
    ))

    writer = None
    output_path = None
    if args.record:
        from pvot.io.video import VideoWriter

        output_path = args.output or generate_output_path(
            args.video if not args.synthetic else "synthetic.mp4",
            mode_label,
            args.batch_size,
        )
        fh, fw = gray.shape[1:]
        writer = VideoWriter(output_path, fps, (fw, fh))
        print(f"Output video: {output_path}")
        first = frames_bgr[0].copy()
        _draw_bbox(first, roi)
        writer.write(first)

    print("Tracking...")
    t_start = time.perf_counter()
    if args.mode == "batch":
        final, out = track_video_batched(
            gray[1:], state, config,
            batch_size=args.batch_size, strategy=args.strategy, backend="xla",
        )
    else:
        final, out = track_video(
            gray[1:], state, config,
            strategy=args.strategy, backend=backend, chunk_size=args.chunk_size,
        )
    elapsed = time.perf_counter() - t_start
    total_frames = len(gray)  # includes the template frame, like main.cpp:356
    avg_fps = total_frames / elapsed if elapsed > 0 else 0.0

    show = not args.record and not args.no_display and os.environ.get("DISPLAY")
    if writer or show:
        import cv2

        for i, bbox in enumerate(np.asarray(out.bbox)):
            frame = frames_bgr[i + 1]
            _draw_bbox(frame, bbox)
            _draw_fps(frame, avg_fps)
            if writer:
                writer.write(frame)
            if show:
                cv2.imshow("Tracking", frame)
                if cv2.waitKey(1) == 27:
                    break
        if writer:
            writer.close()

    if args.checkpoint_out:
        from pvot.utils.checkpoint import save_state

        save_state(args.checkpoint_out, final)
        print(f"Checkpoint saved: {args.checkpoint_out}")

    kind = "Recorded" if args.record else "Interactive"
    # Summary format matches the reference (main.cpp:485-488).
    print(
        f"{kind} tracking summary: frames={total_frames}, "
        f"time={elapsed:.6g} s, FPS={avg_fps:.6g}"
    )
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    args = parse_args(list(sys.argv[1:] if argv is None else argv))
    return run_tracking(args)


if __name__ == "__main__":
    raise SystemExit(main())
