"""Webcam demo (reference demo/web_demo.py): live capture loop, quit on q.

    python -m rtpose_tpu.demo.web_demo --camera 0
"""

from __future__ import annotations

import argparse
import time

from .picture_demo import add_common_args, build_pipeline


def main():
    import cv2

    from ..utils.draw import draw_people

    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--camera", type=int, default=0)
    args = parser.parse_args()

    pipe = build_pipeline(args)
    cap = cv2.VideoCapture(args.camera)
    if not cap.isOpened():
        raise RuntimeError(f"cannot open camera {args.camera}")

    last = time.time()
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        people, _h, _p, meta = pipe.run(frame)
        out = draw_people(frame, people, meta)
        now = time.time()
        fps = 1.0 / max(now - last, 1e-9)
        last = now
        cv2.putText(out, f"{fps:.1f} FPS", (10, 30),
                    cv2.FONT_HERSHEY_SIMPLEX, 1.0, (0, 255, 0), 2)
        cv2.imshow("rtpose-tpu", out)
        if cv2.waitKey(1) & 0xFF == ord("q"):
            break
    cap.release()
    cv2.destroyAllWindows()


if __name__ == "__main__":
    main()
