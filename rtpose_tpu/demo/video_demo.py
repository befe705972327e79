"""Video-file demo (reference video_demo.py).

Unlike the reference (which buffers all frames and processes them one at a
time, video_demo.py:86-125), frames are streamed and processed in batches
through one jitted call — batching is the TPU throughput lever.

    python -m rtpose_tpu.demo.video_demo --video in.mp4 --output out.avi
"""

from __future__ import annotations

import argparse
import time


from .picture_demo import add_common_args, build_pipeline


def open_video(path):
    """VideoCapture with rotation-metadata handling (the reference probes
    ffmpeg for the rotate tag, video_demo.py:29-46; cv2 >= 4.5 exposes it
    as CAP_PROP_ORIENTATION_META / _AUTO)."""
    import cv2
    cap = cv2.VideoCapture(path)
    if cap.isOpened() and hasattr(cv2, "CAP_PROP_ORIENTATION_AUTO"):
        cap.set(cv2.CAP_PROP_ORIENTATION_AUTO, 1)
    return cap


def iter_batches(cap, batch_size):
    import cv2
    done = False
    while not done:
        frames = []
        for _ in range(batch_size):
            ok, frame = cap.read()
            if not ok:
                done = True
                break
            frames.append(frame)
        if frames:
            yield frames


def main():
    import cv2

    from ..utils.draw import draw_people

    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--video", required=True)
    parser.add_argument("--output", default="output.avi")
    parser.add_argument("--fps", type=float, default=20.0)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--no-device-resize", dest="device_resize",
                        action="store_false",
                        help="resize frames on host instead of in-graph")
    # video frames are usually smaller than --input-size: shipping the raw
    # frame + in-graph resize doubles pipelined FPS (bench_device_resize)
    parser.set_defaults(device_resize=True)
    args = parser.parse_args()

    pipe = build_pipeline(args)
    cap = open_video(args.video)
    if not cap.isOpened():
        raise FileNotFoundError(args.video)

    writer = None
    n = 0
    t0 = time.time()

    def emit(frames, people_lists, metas):
        nonlocal writer, n
        for frame, people, meta in zip(frames, people_lists, metas):
            out = draw_people(frame, people, meta)
            if writer is None:
                writer = cv2.VideoWriter(
                    args.output, cv2.VideoWriter_fourcc(*"XVID"), args.fps,
                    (out.shape[1], out.shape[0]))
            writer.write(out)
            n += 1

    # depth-2 pipeline: batch k+1's transfer+compute runs while batch k's
    # results are read back and rendered
    pending = None
    for frames in iter_batches(cap, args.batch):
        ticket = pipe.run_batch_submit(frames)
        if pending is not None:
            emit(pending[0], *pipe.run_batch_collect(pending[1]))
        pending = (frames, ticket)
    if pending is not None:
        emit(pending[0], *pipe.run_batch_collect(pending[1]))
    if writer is not None:
        writer.release()
    cap.release()
    dt = time.time() - t0
    print(f"processed {n} frames in {dt:.1f}s ({n / max(dt, 1e-9):.1f} FPS)"
          f" -> {args.output}")


if __name__ == "__main__":
    main()
