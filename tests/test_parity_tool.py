"""Warp-PSNR parity harness tests."""

import numpy as np

from sd_animation_optical_flow_tpu.utils import parity as P


def test_psnr_masked():
    a = np.zeros((8, 8, 3), np.uint8)
    b = a.copy()
    b[:4] = 10                       # top half differs
    mask = np.zeros((8, 8, 3), bool)
    mask[4:] = True                  # compare only the bottom half
    assert P.psnr(a, b, mask) == float("inf")
    assert P.psnr(a, b) < 40


def test_compare_dirs(tmp_path):
    import cv2
    ours = tmp_path / "ours"
    ref = tmp_path / "ref"
    ours.mkdir()
    ref.mkdir()
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    for i in range(3):
        noisy = np.clip(img.astype(int)
                        + rng.integers(-2, 3, img.shape), 0, 255
                        ).astype(np.uint8)
        cv2.imwrite(str(ours / f"converted_{i:06d}.png"), noisy)
        cv2.imwrite(str(ref / f"converted_{i:06d}.png"), img)
        conf = np.full((16, 16), 255, np.uint8)
        conf[:8] = 0                 # top half marked inpainted
        cv2.imwrite(str(ours / f"pixel_confidence_{i:06d}.png"), conf)
    report = P.compare_dirs(str(ours), str(ref))
    assert report["frames"] == 3
    assert report["mean_psnr"] > 40          # ±2 noise ~= 44 dB
    assert report["per_frame"][0]["warped_frac"] == 0.5
    assert isinstance(report["gate_40db"], bool)


def test_cli_verify_parity_gate(tmp_path, capsys):
    """`cli.py verify-parity --ours DIR --ref-frames DIR` (VERDICT r3
    ask #8): one command scores an output dir against reference frames
    and gates on 40 dB — exit 0 when matching, SystemExit(1) when not."""
    import cv2
    import pytest

    from sd_animation_optical_flow_tpu import cli

    ours = tmp_path / "ours"
    ref = tmp_path / "ref"
    ours.mkdir()
    ref.mkdir()
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    for i in range(2):
        cv2.imwrite(str(ours / f"converted_{i:06d}.png"), img)
        cv2.imwrite(str(ref / f"converted_{i:06d}.png"), img)

    base = ["verify-parity", "-i", "unused.mp4", "-o", str(tmp_path / "w"),
            "--ref-frames", str(ref), "--ours", str(ours)]
    cli.main(base)                       # identical frames: gate passes
    assert '"gate_40db": true' in capsys.readouterr().out

    bad = np.clip(img.astype(int) + 40, 0, 255).astype(np.uint8)
    cv2.imwrite(str(ours / "converted_000001.png"), bad)
    with pytest.raises(SystemExit) as e:
        cli.main(base)
    assert e.value.code == 1
