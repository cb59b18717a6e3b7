"""Keyframe detection and frame generation from video.

Host-side stage (video decode is host work in any design), re-building
the reference's PySceneDetect-derived detector
(reference: ofgen_pixel_inpaint.py:127-176, 272-313): per-frame Canny
edges on the HSV luma with median-adaptive thresholds, dilation with a
resolution-derived kernel, and a mean-pixel-distance trigger whose
threshold decays linearly with the gap since the last keyframe.

Fix kept deliberate (SURVEY §7 quirks): the reference's EOF check
``if ret is None`` never fires (cv2 returns False); here EOF is handled
correctly.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Iterator, Optional, Tuple

import numpy as np


def mean_pixel_distance(left: np.ndarray, right: np.ndarray) -> float:
    """Mean |a-b| between two 2D uint8 images."""
    num = float(left.shape[0] * left.shape[1])
    return float(np.sum(np.abs(left.astype(np.int32)
                               - right.astype(np.int32))) / num)


def estimated_kernel_size(frame_width: int, frame_height: int) -> int:
    size = 4 + round(math.sqrt(frame_width * frame_height) / 192)
    return size + 1 if size % 2 == 0 else size


class EdgeDetector:
    """Canny + dilate keyframe edge maps (adaptive-threshold)."""

    def __init__(self):
        self._kernel: Optional[np.ndarray] = None

    def __call__(self, frame_bgr: np.ndarray) -> np.ndarray:
        import cv2
        lum = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2HSV)[:, :, 2]
        if self._kernel is None:
            k = estimated_kernel_size(lum.shape[1], lum.shape[0])
            self._kernel = np.ones((k, k), np.uint8)
        sigma = 1.0 / 3.0
        median = np.median(lum)
        low = int(max(0, (1.0 - sigma) * median))
        high = int(min(255, (1.0 + sigma) * median))
        edges = cv2.Canny(lum, low, high)
        return cv2.dilate(edges, self._kernel)


@dataclass
class FrameGenConfig:
    size: Tuple[int, int] = (512, 768)     # (width, height) cv2 order
    keep_every: int = 3
    threshold: float = 8.5
    min_gap: int = -1
    max_gap: int = -1


def frame_generator(video_file: str, cfg: FrameGenConfig = FrameGenConfig()
                    ) -> Iterator[Tuple[np.ndarray, bool, int]]:
    """Yield (frame_bgr, is_key_frame, index) — the reference's
    frame_generator contract (ofgen_pixel_inpaint.py:272-313)."""
    import cv2
    video = cv2.VideoCapture(video_file)
    fps = video.get(cv2.CAP_PROP_FPS) or 30.0
    min_gap = int(10 * fps / 30) if cfg.min_gap == -1 else \
        int(max(1, cfg.min_gap) * fps / 30)
    max_gap = int(300 * fps / 30) if cfg.max_gap == -1 else \
        int(max(10, cfg.max_gap) * fps / 30)
    del min_gap  # tracked for parity; the reference computes but ignores it

    detector = EdgeDetector()
    ctr = -1
    ctr_valid = -1
    gap = 0
    key_edges: Optional[np.ndarray] = None
    try:
        while True:
            ctr += 1
            gap += 1
            ret, frame = video.read()
            if not ret:
                break
            if ctr % cfg.keep_every != 0:
                continue
            frame = cv2.resize(frame, cfg.size, interpolation=cv2.INTER_AREA)
            ctr_valid += 1
            if key_edges is None:
                key_edges = detector(frame)
                yield frame, True, ctr_valid
                continue
            edges = detector(frame)
            delta = mean_pixel_distance(edges, key_edges)
            threshold = cfg.threshold * (max_gap - gap) / max_gap
            if threshold < delta:
                key_edges = edges
                gap = 0
                yield frame, True, ctr_valid
            else:
                yield frame, False, ctr_valid
    finally:
        video.release()


def array_frame_generator(frames, cfg: FrameGenConfig = FrameGenConfig()):
    """Same detector over an in-memory [N, H, W, 3] BGR uint8 array —
    for tests and for the native frame pipe."""
    import cv2
    detector = EdgeDetector()
    key_edges = None
    gap = 0
    max_gap = 300
    ctr_valid = -1
    for i, frame in enumerate(frames):
        gap += 1
        if i % cfg.keep_every != 0:
            continue
        if tuple(frame.shape[1::-1]) != cfg.size:
            frame = cv2.resize(frame, cfg.size, interpolation=cv2.INTER_AREA)
        ctr_valid += 1
        if key_edges is None:
            key_edges = detector(frame)
            yield frame, True, ctr_valid
            continue
        edges = detector(frame)
        delta = mean_pixel_distance(edges, key_edges)
        if cfg.threshold * (max_gap - gap) / max_gap < delta:
            key_edges = edges
            gap = 0
            yield frame, True, ctr_valid
        else:
            yield frame, False, ctr_valid
