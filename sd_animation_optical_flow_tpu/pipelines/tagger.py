"""Booru tag prompting (WD-1.4 tagger equivalent, gated).

The reference tags every frame with an ONNX WD-v1.4 SwinV2 tagger and
builds the positive prompt from the tag set
(reference: booru_tagger.py:15-101, ofgen_pixel_inpaint.py:179-183).
onnxruntime is optional here: when the runtime or the model files are
absent, a fixed-prompt fallback keeps pipelines runnable (the prompt
prefix contract is preserved either way).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

PROMPT_PREFIX = "masterpiece,best quality,"
NEGATIVE_PROMPT = "worst quality, low quality, normal quality"


class Tagger:
    """ONNX tagger when available; otherwise a stable fallback."""

    def __init__(self, model_path: Optional[str] = None,
                 tags_path: Optional[str] = None,
                 threshold: float = 0.75):
        self.threshold = threshold
        self._session = None
        self._tags = None
        if model_path and tags_path:
            try:
                import csv
                import onnxruntime as ort
                self._session = ort.InferenceSession(
                    model_path, providers=["CPUExecutionProvider"])
                with open(tags_path) as f:
                    self._tags = [row["name"] for row in csv.DictReader(f)]
            except Exception:
                self._session = None
                self._tags = None

    @classmethod
    def from_session(cls, session, tags, threshold: float = 0.75):
        """Build a Tagger around an existing ONNX-like session (any
        object with get_inputs()/run()); exercises the real inference
        branch without onnxruntime — used by tests and by callers that
        manage their own runtime."""
        t = cls(threshold=threshold)
        t._session = session
        t._tags = list(tags)
        return t

    @property
    def available(self) -> bool:
        return self._session is not None

    def _preprocess(self, img_bgr: np.ndarray) -> np.ndarray:
        """Pad to square with white, resize to the model input
        (booru_tagger.py:15-38)."""
        import cv2
        size = self._session.get_inputs()[0].shape[1]
        h, w = img_bgr.shape[:2]
        side = max(h, w)
        canvas = np.full((side, side, 3), 255, np.uint8)
        y0 = (side - h) // 2
        x0 = (side - w) // 2
        canvas[y0:y0 + h, x0:x0 + w] = img_bgr
        interp = cv2.INTER_AREA if side > size else cv2.INTER_CUBIC
        canvas = cv2.resize(canvas, (size, size), interpolation=interp)
        return canvas.astype(np.float32)[None]

    def label_cv2_bgr(self, img_bgr: np.ndarray) -> Dict[str, float]:
        """-> {tag: confidence} above threshold; first 4 model outputs
        are ratings and are skipped (booru_tagger.py:94-100)."""
        if not self.available:
            return {}
        inp = self._preprocess(img_bgr)
        name = self._session.get_inputs()[0].name
        probs = self._session.run(None, {name: inp})[0][0]
        out = {}
        for tag, p in zip(self._tags[4:], probs[4:]):
            if p > self.threshold:
                out[tag] = float(p)
        return out

    def build_prompt(self, img_bgr: np.ndarray, extra: str = "",
                     blacklist=()) -> str:
        """Positive prompt assembly (ofgen_pixel_inpaint.py:179-183):
        prefix + tags joined with ',', underscores spaced."""
        tags = self.label_cv2_bgr(img_bgr)
        body = ",".join(t for t in tags if t not in set(blacklist))
        body = body.replace("_", " ")
        return PROMPT_PREFIX + (extra + "," if extra else "") + body
