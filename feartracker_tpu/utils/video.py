"""Video IO via OpenCV (RGB, like the reference's imageio path in
demo_video.py:51-58; this environment has no ffmpeg-backed imageio plugin)."""

from __future__ import annotations

from typing import Iterator, List, Optional

import cv2
import numpy as np


def read_video(path: str, max_frames: Optional[int] = None) -> np.ndarray:
    """Decode a whole video to (T, H, W, 3) RGB uint8."""
    frames = list(iter_video(path, max_frames))
    if not frames:
        raise IOError(f"no frames decoded from {path}")
    return np.stack(frames)


def iter_video(path: str, max_frames: Optional[int] = None) -> Iterator[np.ndarray]:
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video {path}")
    count = 0
    try:
        while max_frames is None or count < max_frames:
            ok, frame = cap.read()
            if not ok:
                break
            yield cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            count += 1
    finally:
        cap.release()


def video_fps(path: str) -> float:
    cap = cv2.VideoCapture(path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    cap.release()
    return fps


def write_video(path: str, frames: List[np.ndarray], fps: float = 30.0) -> None:
    h, w = frames[0].shape[:2]
    out = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for f in frames:
        out.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    out.release()


def draw_bbox(image: np.ndarray, bbox, color=(0, 255, 0), width: int = 5) -> np.ndarray:
    """(ref: demo_video.py:31-35)"""
    image = image.copy()
    x, y, w, h = map(int, bbox)
    return cv2.rectangle(image, (x, y), (x + w, y + h), color, width)
