"""Detection visualization (host side).

The reference's observability is cv.imshow windows with filled class-
colored rectangles, green outlines and class labels (reference
scripts/fcn_object_detector.py:141-174) plus an alpha blend (:168-169).
tpufcn renders the same overlay to an array (no GUI dependency) so it
can be saved, published on the bus, or piped to a viewer.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import cv2 as cv
import numpy as np


def class_colors(n: int, seed: int = 0) -> List[Tuple[int, int, int]]:
    """Stable random per-class BGR colors (reference assigns random
    colors per class, fcn_object_detector.py:446-461)."""
    rng = np.random.default_rng(seed)
    return [tuple(int(v) for v in rng.integers(0, 256, 3)) for _ in range(n)]


def draw_detections(frame_bgr: np.ndarray,
                    detections: Sequence[Tuple[Sequence[float], int, float]],
                    names: Optional[Sequence[str]] = None,
                    alpha: float = 0.3,
                    seed: int = 0) -> np.ndarray:
    """Render (box, label, confidence) tuples like the reference overlay.

    detections: output of DetectionResult.to_lists()[i].
    Returns a new image; the input is untouched.
    """
    n_cls = max((l for _, l, _ in detections), default=0) + 1
    colors = class_colors(max(n_cls, 1), seed)
    canvas = frame_bgr.copy()
    for box, label, conf in detections:
        x1, y1, x2, y2 = [int(v) for v in box[:4]]
        cv.rectangle(canvas, (x1, y1), (x2, y2), colors[label], -1)
        cv.rectangle(canvas, (x1, y1), (x2, y2), (0, 255, 0), 4)
        text = (names[label] if names and label < len(names)
                else f"object_{label}")
        cv.putText(canvas, f"{text} {conf:.2f}", (x1, max(y1 - 4, 12)),
                   cv.FONT_HERSHEY_PLAIN, 2, (255, 0, 0), 2, cv.LINE_8)
    out = frame_bgr.copy()
    cv.addWeighted(frame_bgr, alpha, canvas, 1.0 - alpha, 0, out)
    return out


def colorize_pmap(pmap_u8: np.ndarray) -> np.ndarray:
    """JET colormap over a mono8 probability map (reference debug views,
    argumentation_engine.py:644)."""
    return cv.applyColorMap(pmap_u8, cv.COLORMAP_JET)


def feature_grid(features: np.ndarray, pad: int = 1) -> np.ndarray:
    """Tile a (H, W, C) activation tensor into a near-square uint8
    mosaic — the reference's ``vis_square`` feature-map debug view
    (fcn_object_detector.py:416-426: pad each map, normalize to [0, 1],
    arrange ceil(sqrt(C))² tiles row-major).

    Accepts NHWC too (first image is shown).  Returns (GH, GW) uint8.
    """
    f = np.asarray(features, np.float32)
    if f.ndim == 4:
        f = f[0]
    if f.ndim != 3:
        raise ValueError(f"expected (H, W, C) features, got {f.shape}")
    f = np.moveaxis(f, -1, 0)                      # (C, H, W)
    lo, hi = f.min(), f.max()
    f = (f - lo) / (hi - lo) if hi > lo else np.zeros_like(f)
    n = int(np.ceil(np.sqrt(f.shape[0])))
    f = np.pad(f, ((0, n * n - f.shape[0]), (0, pad), (0, pad)),
               constant_values=1.0)                # white separators
    c, h, w = f.shape
    grid = (f.reshape(n, n, h, w)
             .transpose(0, 2, 1, 3)
             .reshape(n * h, n * w))
    return (grid * 255.0 + 0.5).astype(np.uint8)
