"""Box geometry primitives (pure jax.numpy, fully batched).

The reference implements IoU twice as ``JaccardCoeff`` (reference
scripts/data_argumentation_layer/argumentation_engine.py:24-55 and a copy
in scripts/misc/create_training_lmdb.py).  Its ``iou`` has a deliberate
quirk: the plain intersection-over-union is divided by the area ratio
``area(a)/area(b)`` (argumentation_engine.py:32-35), i.e. the returned
score is ``IoU * area(b) / area(a)``.  Both the plain and the scaled
variants are provided; the label-grid encoder uses the scaled one to match
reference training semantics exactly.

Rect convention: ``(x, y, w, h)`` rows, any leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def _area(rect):
    return rect[..., 2] * rect[..., 3]


def _intersection_wh(a, b):
    """Intersection box (w, h); (0, 0) if the boxes do not overlap.

    Mirrors the reference behaviour where zero intersection short-circuits
    the score to 0 (argumentation_engine.py:27-29).
    """
    x = jnp.maximum(a[..., 0], b[..., 0])
    y = jnp.maximum(a[..., 1], b[..., 1])
    w = jnp.minimum(a[..., 0] + a[..., 2], b[..., 0] + b[..., 2]) - x
    h = jnp.minimum(a[..., 1] + a[..., 3], b[..., 1] + b[..., 3]) - y
    empty = (w < 0) | (h < 0)
    return jnp.where(empty, 0.0, w), jnp.where(empty, 0.0, h)


def iou_xywh(a, b):
    """Plain IoU between (x,y,w,h) rects (broadcasting)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    iw, ih = _intersection_wh(a, b)
    inter = iw * ih
    ux = jnp.minimum(a[..., 0], b[..., 0])
    uy = jnp.minimum(a[..., 1], b[..., 1])
    uw = jnp.maximum(a[..., 0] + a[..., 2], b[..., 0] + b[..., 2]) - ux
    uh = jnp.maximum(a[..., 1] + a[..., 3], b[..., 1] + b[..., 3]) - uy
    union_bbox_area = uw * uh  # NOTE: area of the union *bounding box*
    return jnp.where(inter > 0, inter / union_bbox_area, 0.0)


def scaled_iou_xywh(a, b):
    """Reference ``JaccardCoeff.iou``: IoU-over-union-bbox / (area(a)/area(b)).

    Note two deviations from textbook IoU, both kept for parity:
    * the denominator is the area of the union's *bounding box*, not the
      true union area (argumentation_engine.py:47-52 computes the
      enclosing rect);
    * the result is divided by ``area(a)/area(b)``.
    """
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    base = iou_xywh(a, b)
    ratio = _area(a) / _area(b)
    return jnp.where(base > 0, base / ratio, 0.0)


def rects_to_corners(rects):
    """(x,y,w,h) -> (x1,y1,x2,y2)."""
    rects = jnp.asarray(rects)
    return jnp.concatenate(
        [rects[..., :2], rects[..., :2] + rects[..., 2:4]], axis=-1)


def corners_to_rects(corners):
    """(x1,y1,x2,y2) -> (x,y,w,h)."""
    corners = jnp.asarray(corners)
    return jnp.concatenate(
        [corners[..., :2], corners[..., 2:4] - corners[..., :2]], axis=-1)


def iou_corners(a, b):
    """Plain IoU between (x1,y1,x2,y2) boxes with true union area."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    ix1 = jnp.maximum(a[..., 0], b[..., 0])
    iy1 = jnp.maximum(a[..., 1], b[..., 1])
    ix2 = jnp.minimum(a[..., 2], b[..., 2])
    iy2 = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
    area_a = jnp.maximum(a[..., 2] - a[..., 0], 0.0) * jnp.maximum(a[..., 3] - a[..., 1], 0.0)
    area_b = jnp.maximum(b[..., 2] - b[..., 0], 0.0) * jnp.maximum(b[..., 3] - b[..., 1], 0.0)
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / union, 0.0)
