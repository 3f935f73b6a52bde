"""Video-file frame source for the stream surfaces.

The reference consumes a LIVE camera stream over ROS topics (reference
scripts/fcn_object_detector.py:330-331 subscribes the camera image
topic; launch/fcn_object_detector.launch wires it to usb_cam).  Without
ROS the equivalent offline input is a camera *recording*: this module
decodes a video file into BGR frames with per-frame timestamps so
``cli replay --video`` / ``cli launch --video`` drive the same node
graphs a ``rosbag play`` of the camera topic would — including the
stamp-based time synchronizers.

Decoding is OpenCV (``cv2.VideoCapture``), host-side: frames feed the
topic bus exactly like image files, and the device sees the same
uint8 BGR arrays either way.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

import numpy as np

__all__ = ["iter_video_frames", "read_video_frames"]


def iter_video_frames(path: str,
                      stride: int = 1,
                      max_frames: Optional[int] = None,
                      ) -> Iterator[Tuple[float, np.ndarray]]:
    """Yield ``(stamp_seconds, bgr_frame)`` from a video file.

    ``stride`` keeps every Nth frame (decimation for long recordings);
    stamps are the *source* timestamps (frame_index / fps), so sync
    policies observe real capture cadence even under decimation.
    ``max_frames`` bounds the number of frames *yielded*.
    """
    import cv2 as cv

    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    cap = cv.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {path}")
    fps = cap.get(cv.CAP_PROP_FPS)
    if not fps or fps <= 0 or not np.isfinite(fps):
        fps = 30.0  # containers without an fps header
    try:
        idx = 0
        yielded = 0
        while True:
            if max_frames is not None and yielded >= max_frames:
                return
            ok, frame = cap.read()
            if not ok:
                return
            if idx % stride == 0:
                yield idx / fps, frame
                yielded += 1
            idx += 1
    finally:
        cap.release()


def read_video_frames(path: str,
                      stride: int = 1,
                      max_frames: Optional[int] = None,
                      ) -> Tuple[List[np.ndarray], List[float]]:
    """Decode a video file into ``(frames, stamps)`` lists (see
    :func:`iter_video_frames`)."""
    frames: List[np.ndarray] = []
    stamps: List[float] = []
    for stamp, frame in iter_video_frames(path, stride=stride,
                                          max_frames=max_frames):
        frames.append(frame)
        stamps.append(stamp)
    return frames, stamps
