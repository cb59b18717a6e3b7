"""Native C++ frame pipeline tests (builds libframeloader.so)."""

import numpy as np
import pytest

from sd_animation_optical_flow_tpu.native.framepipe import FramePipe


def test_native_builds_and_roundtrips(tmp_path):
    shape = (8, 12, 3)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (5, *shape), dtype=np.uint8)
    with FramePipe(str(tmp_path / "frames"), 5, shape) as fp:
        assert fp.native, "g++ build failed — native path required here"
        for i, f in enumerate(frames):
            fp.put(i, f)
        fp.flush()
        for i in range(5):
            np.testing.assert_array_equal(fp.get(i), frames[i])
        stats = fp.stats()
        assert stats["writes"] == 5


def test_sequential_prefetch_hits(tmp_path):
    shape = (16, 16, 3)
    n = 32
    with FramePipe(str(tmp_path / "frames"), n, shape, prefetch=8) as fp:
        assert fp.native
        for i in range(n):
            fp.put(i, np.full(shape, i, np.uint8))
        fp.flush()
        import time
        out = []
        for i in range(n):
            frame = fp.get(i)
            out.append(int(frame[0, 0, 0]))
            time.sleep(0.002)   # give the prefetcher headroom
        assert out == list(range(n))
        # read-ahead should have served a decent share from cache
        assert fp.stats()["cache_hits"] > 0


def test_missing_frame_raises(tmp_path):
    with FramePipe(str(tmp_path / "frames"), 3, (4, 4, 3)) as fp:
        with pytest.raises(FileNotFoundError):
            fp.get(1)
