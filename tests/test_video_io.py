"""Video-file path: frame_generator over a real encoded clip."""

import numpy as np
import pytest

from sd_animation_optical_flow_tpu.pipelines.keyframes import (
    FrameGenConfig, frame_generator)
from tests.test_pipeline import _synthetic_frames


def _write_video(path, frames, fps=30):
    import cv2
    h, w = frames[0].shape[:2]
    for fourcc in ("MJPG", "XVID", "mp4v"):
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*fourcc), fps,
                             (w, h))
        if vw.isOpened():
            for f in frames:
                vw.write(f)
            vw.release()
            return True
        vw.release()
    return False


def test_frame_generator_over_encoded_video(tmp_path):
    frames = _synthetic_frames(12, 64, 64)
    path = str(tmp_path / "clip.avi")
    if not _write_video(path, frames):
        pytest.skip("no cv2 video encoder available")
    out = list(frame_generator(path, FrameGenConfig(
        size=(64, 64), keep_every=3, threshold=24.0)))
    assert len(out) == 4                      # 12 frames, keep_every=3
    assert out[0][1] is True                  # first frame is a keyframe
    idxs = [i for _, _, i in out]
    assert idxs == [0, 1, 2, 3]
    # the mid-clip inversion (scene cut) should appear as a keyframe
    assert any(k for _, k, i in out[1:])


def test_frame_generator_eof_handling(tmp_path):
    # the reference's `if ret is None` never fires; ours must terminate
    frames = _synthetic_frames(3, 32, 32)
    path = str(tmp_path / "c.avi")
    if not _write_video(path, frames):
        pytest.skip("no cv2 video encoder available")
    out = list(frame_generator(path, FrameGenConfig(size=(32, 32),
                                                    keep_every=1)))
    assert len(out) == 3
