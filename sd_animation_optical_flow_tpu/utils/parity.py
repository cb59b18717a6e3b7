"""Output-parity measurement against reference frame directories.

The BASELINE quality gate is warped-region PSNR >= 40 dB vs the PyTorch
reference's `converted_%06d.png` outputs (BASELINE.md). This module
measures it: given two output directories (ours vs reference) and
optionally the per-frame confidence maps, compute per-frame and
aggregate PSNR over the warped (high-confidence) region — the region
where outputs must match bit-closely; inpainted (low-confidence) pixels
are generative and excluded by the gate's definition.
"""

from __future__ import annotations

import glob
import json
import os
import re
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, mask: Optional[np.ndarray] = None,
         peak: float = 255.0) -> float:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    if mask is not None:
        m = mask.astype(bool)
        if not m.any():
            return float("nan")
        diff2 = ((a - b) ** 2)[m]
    else:
        diff2 = (a - b) ** 2
    mse = diff2.mean()
    return float("inf") if mse == 0 else 10.0 * np.log10(peak ** 2 / mse)


@dataclass
class FramePair:
    index: int
    ours: str
    reference: str
    confidence: Optional[str] = None


def collect_pairs(ours_dir: str, ref_dir: str,
                  pattern: str = "converted_*.png") -> List[FramePair]:
    def index_of(path):
        m = re.search(r"(\d+)\.png$", os.path.basename(path))
        return int(m.group(1)) if m else -1

    ours = {index_of(p): p for p in
            glob.glob(os.path.join(ours_dir, pattern))}
    refs = {index_of(p): p for p in
            glob.glob(os.path.join(ref_dir, pattern))}
    pairs = []
    for idx in sorted(set(ours) & set(refs)):
        conf = os.path.join(ours_dir, f"pixel_confidence_{idx:06d}.png")
        pairs.append(FramePair(idx, ours[idx], refs[idx],
                               conf if os.path.exists(conf) else None))
    return pairs


def compare_dirs(ours_dir: str, ref_dir: str, *,
                 conf_thres: int = 242) -> Dict:
    """Aggregate warped-region PSNR report. conf_thres on the 0-255
    confidence map (242 ~ 0.95) selects the warped region."""
    import cv2
    pairs = collect_pairs(ours_dir, ref_dir)
    per_frame = []
    for p in pairs:
        a = cv2.imread(p.ours)
        b = cv2.imread(p.reference)
        if a is None or b is None or a.shape != b.shape:
            per_frame.append({"index": p.index, "psnr": None,
                              "note": "unreadable or shape mismatch"})
            continue
        mask = None
        if p.confidence:
            conf = cv2.imread(p.confidence, cv2.IMREAD_GRAYSCALE)
            if conf is not None:
                mask = np.repeat((conf >= conf_thres)[:, :, None], 3, 2)
        per_frame.append({"index": p.index,
                          "psnr": round(psnr(a, b, mask), 3),
                          "warped_frac": (round(float(mask.mean()), 4)
                                          if mask is not None else 1.0)})
    vals = [f["psnr"] for f in per_frame if f["psnr"] is not None]
    # identical frames score inf — that PASSES the gate (it is the
    # best possible parity, not a missing measurement); only the mean
    # needs the finite subset
    finite = [v for v in vals if np.isfinite(v)]
    mean = (round(float(np.mean(finite)), 3) if finite
            else (float("inf") if vals else None))
    return {
        "frames": len(pairs),
        "mean_psnr": mean,
        "min_psnr": round(float(np.min(vals)), 3) if vals else None,
        "gate_40db": bool(vals and len(vals) == len(per_frame)
                          and np.min(vals) >= 40.0),
        "per_frame": per_frame,
    }


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(
        description="warped-region PSNR parity vs reference outputs")
    ap.add_argument("ours")
    ap.add_argument("reference")
    ap.add_argument("--conf-thres", type=int, default=242)
    args = ap.parse_args(argv)
    print(json.dumps(compare_dirs(args.ours, args.reference,
                                  conf_thres=args.conf_thres), indent=2))


if __name__ == "__main__":
    main()
