"""DetectNet-style grid-label encoder and grid->box decoder.

The reference implements the encoder twice on the host in per-cell Python
loops (reference scripts/data_argumentation_layer/argumentation_engine.py:69-109
and scripts/misc/create_training_lmdb.py:229-268) and the decoder twice
(reference scripts/fcn_object_detector.py:357-394 and
scripts/boundary_adjustment/boundary_refinement.py:265-302).  Here each
exists exactly once, fully vectorized, jit/vmap-able, running on device.

Semantics preserved from the reference encoder
(argumentation_engine.py:81-109):

* a grid cell is "covered" by a GT rect when the *scaled* Jaccard score
  (see :func:`tpufcn.ops.boxes.scaled_iou_xywh`) exceeds ``iou_thresh``
  (reference ``FLT_EPSILON_ = 0.1``);
* per covered cell, class ``k`` writes 4 channels ``[4k, 4k+4)``:
  - bbox block: GT corner coordinates relative to the cell origin,
  - size block: ``(1/w, 1/h, 1/w, 1/h)``,
  - obj block: ``cell_area / rect_area``,
  - coverage block: 1.0;
* the scalar foreground map gets 1.0 at class channel ``label``;
* GT rects are applied in order with last-writer-wins per cell (the
  reference's sequential loop), reproduced here with ``lax.scan``.

Layouts are TPU-native NHWC: grids are ``(gh, gw, C)`` / ``(gh, gw, 4C)``
(channel-last).  Channel ordering within the last axis matches the Caffe
CHW channel order, so a transpose is the only difference when comparing
with reference tensors.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpufcn.core.config import GridConfig
from tpufcn.ops.boxes import scaled_iou_xywh


class GridLabels(NamedTuple):
    """The six training tops of the reference data layer (reference
    scripts/data_argumentation_layer/data_argumentation_layer.py:57-72),
    minus the image: shapes for grid (gh, gw)."""

    coverage: jax.Array      # (gh, gw, C)  foreground probability target
    bbox: jax.Array          # (gh, gw, 4C) corner offsets rel. cell origin
    size: jax.Array          # (gh, gw, 4C) (1/w, 1/h, 1/w, 1/h) per class
    obj: jax.Array           # (gh, gw, 4C) cell_area / rect_area
    coverage_block: jax.Array  # (gh, gw, 4C) binary coverage mask


def grid_cells(grid: GridConfig) -> jax.Array:
    """(gh, gw, 4) array of cell rects ``(x, y, stride, stride)``.

    Mirrors reference ``grid_region`` (argumentation_engine.py:283-292).
    """
    gh, gw, s = grid.grid_h, grid.grid_w, grid.stride
    xs = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 1) * s
    ys = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 0) * s
    wh = jnp.full((gh, gw), float(s), jnp.float32)
    return jnp.stack([xs, ys, wh, wh], axis=-1)


def encode_grid_labels(rects: jax.Array,
                       labels: jax.Array,
                       valid: jax.Array,
                       grid: GridConfig,
                       iou_thresh: float = 0.1) -> GridLabels:
    """Encode GT boxes into DetectNet label grids for one image.

    Args:
      rects: (M, 4) float (x, y, w, h) GT boxes (padded to capacity M).
      labels: (M,) int32 class ids in [0, C).
      valid: (M,) bool mask for real (non-padding) boxes.
      grid: static grid geometry.
      iou_thresh: scaled-IoU coverage threshold (reference FLT_EPSILON_).

    Returns:
      GridLabels with (gh, gw, C) / (gh, gw, 4C) channel-last tensors.
    """
    gh, gw, C = grid.grid_h, grid.grid_w, grid.num_classes
    cells = grid_cells(grid)                       # (gh, gw, 4)
    cell_area = jnp.float32(grid.stride * grid.stride)

    init = GridLabels(
        coverage=jnp.zeros((gh, gw, C), jnp.float32),
        bbox=jnp.zeros((gh, gw, C, 4), jnp.float32),
        size=jnp.zeros((gh, gw, C, 4), jnp.float32),
        obj=jnp.zeros((gh, gw, C, 4), jnp.float32),
        coverage_block=jnp.zeros((gh, gw, C, 4), jnp.float32),
    )

    def step(state: GridLabels, inp):
        rect, label, ok = inp
        x, y, w, h = rect[0], rect[1], rect[2], rect[3]
        score = scaled_iou_xywh(cells, rect)       # (gh, gw)
        region = (score > iou_thresh) & ok         # (gh, gw)

        cls = jax.nn.one_hot(label, C, dtype=jnp.bool_)      # (C,)
        hit = region[..., None] & cls                        # (gh, gw, C)
        hit4 = hit[..., None]                                # (gh, gw, C, 1)

        corners = jnp.stack([
            x - cells[..., 0],
            y - cells[..., 1],
            (x + w) - cells[..., 0],
            (y + h) - cells[..., 1],
        ], axis=-1)                                           # (gh, gw, 4)
        corners = jnp.broadcast_to(corners[:, :, None, :], (gh, gw, C, 4))

        inv = jnp.stack([1.0 / w, 1.0 / h, 1.0 / w, 1.0 / h])
        size_v = jnp.broadcast_to(inv, (gh, gw, C, 4))
        obj_v = jnp.broadcast_to(cell_area / (w * h), (gh, gw, C, 4))

        new = GridLabels(
            coverage=jnp.where(hit, 1.0, state.coverage),
            bbox=jnp.where(hit4, corners, state.bbox),
            size=jnp.where(hit4, size_v, state.size),
            obj=jnp.where(hit4, obj_v, state.obj),
            coverage_block=jnp.where(hit4, 1.0, state.coverage_block),
        )
        return new, None

    rects = jnp.asarray(rects, jnp.float32)
    labels = jnp.asarray(labels, jnp.int32)
    valid = jnp.asarray(valid, jnp.bool_)
    out, _ = jax.lax.scan(step, init, (rects, labels, valid))
    return GridLabels(
        coverage=out.coverage,
        bbox=out.bbox.reshape(gh, gw, 4 * C),
        size=out.size.reshape(gh, gw, 4 * C),
        obj=out.obj.reshape(gh, gw, 4 * C),
        coverage_block=out.coverage_block.reshape(gh, gw, 4 * C),
    )


def encode_grid_labels_batch(rects, labels, valid, grid: GridConfig,
                             iou_thresh: float = 0.1) -> GridLabels:
    """Batched encoder: leading batch axis on rects/labels/valid."""
    return jax.vmap(
        lambda r, l, v: encode_grid_labels(r, l, v, grid, iou_thresh)
    )(rects, labels, valid)


def decode_gridboxes(coverage: jax.Array,
                     bbox: jax.Array,
                     grid: GridConfig,
                     prob_thresh: float = 0.5):
    """Decode coverage + bbox grids to candidate corner boxes, all classes.

    Fixed-capacity device formulation of reference ``gridbox_to_boxes``
    (scripts/fcn_object_detector.py:357-394): every grid cell yields a
    candidate ``(x1, y1, x2, y2) = bbox_offsets + cell_origin``; cells with
    ``coverage < prob_thresh`` are masked invalid rather than dropped, so
    shapes stay static under jit.

    Args:
      coverage: (gh, gw, C) per-class coverage probability.
      bbox: (gh, gw, 4C) per-class corner offsets (Caffe channel order).
      grid: static geometry (decode cell size = im / grid, reference
        fcn_object_detector.py:362-369).
      prob_thresh: coverage mask threshold.

    Returns:
      boxes: (C, G, 4) float corner boxes, G = gh*gw.
      cvg:   (C, G) coverage values.
      valid: (C, G) bool mask of above-threshold cells.
    """
    gh, gw, C = grid.grid_h, grid.grid_w, grid.num_classes
    G = gh * gw
    cw, ch = float(grid.cell_w), float(grid.cell_h)

    mx = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 1) * cw
    my = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 0) * ch
    origin = jnp.stack([mx, my, mx, my], axis=-1)          # (gh, gw, 4)

    offsets = bbox.reshape(gh, gw, C, 4)
    boxes = offsets + origin[:, :, None, :]                # (gh, gw, C, 4)
    boxes = boxes.transpose(2, 0, 1, 3).reshape(C, G, 4)

    cvg = coverage.transpose(2, 0, 1).reshape(C, G)
    valid = cvg >= prob_thresh
    return boxes, cvg, valid
