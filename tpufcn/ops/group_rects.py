"""On-device ``cv::groupRectangles``-equivalent box-grouping NMS.

The reference delegates NMS to OpenCV's ``groupRectangles(minBoxes=3,
eps=0.2)`` on the host (reference scripts/fcn_object_detector.py:337-351,
duplicated at scripts/boundary_adjustment/boundary_refinement.py:249-263).
That algorithm is:

1. cluster rectangles into connected components of the ``SimilarRects``
   predicate (positions/sizes within ``eps * (min(w)+min(h))/2`` of each
   other), computed by transitive closure (OpenCV ``partition``);
2. average the members of each cluster (rounded to int);
3. keep clusters with strictly more than ``groupThreshold`` members,
   weight = member count;
4. suppress a surviving cluster contained (within an eps margin) inside a
   bigger surviving cluster when the bigger one has more votes
   (``n2 > max(3, n1) || n1 < 3``).

This is data-dependent-shape on the host; here it is reformulated with
fixed capacity and validity masks so it stays jittable and runs on device:
the similarity graph is an ``N x N`` boolean matrix, connected components
are found by iterated min-label propagation (a ``while_loop`` that
converges in graph-diameter steps), and cluster averaging is a masked
matmul that rides the MXU.

Faithfulness notes:
* The reference passes **corner** boxes ``(x1, y1, x2, y2)`` where OpenCV
  expects ``(x, y, w, h)`` — i.e. the clustering math treats ``x2`` as a
  width and ``y2`` as a height, exactly as NVIDIA DetectNet's original
  code did.  We reproduce that field interpretation; callers pass corner
  boxes just like the reference.
* OpenCV receives integer rects; inputs are rounded to nearest-even
  (``cvRound`` semantics) on entry, and cluster means are rounded the
  same way (``saturate_cast<int>``).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


class GroupedRects(NamedTuple):
    rects: jax.Array    # (N, 4) averaged cluster rects (slot = root index)
    weights: jax.Array  # (N,) int32 member counts
    valid: jax.Array    # (N,) bool — surviving clusters


def _similar(rects: jax.Array, valid: jax.Array, eps: float) -> jax.Array:
    """(N, N) SimilarRects adjacency over (x, y, w, h)-interpreted rows."""
    x, y, w, h = rects[:, 0], rects[:, 1], rects[:, 2], rects[:, 3]
    delta = eps * (jnp.minimum(w[:, None], w[None, :]) +
                   jnp.minimum(h[:, None], h[None, :])) * 0.5
    close = (
        (jnp.abs(x[:, None] - x[None, :]) <= delta)
        & (jnp.abs(y[:, None] - y[None, :]) <= delta)
        & (jnp.abs((x + w)[:, None] - (x + w)[None, :]) <= delta)
        & (jnp.abs((y + h)[:, None] - (y + h)[None, :]) <= delta)
    )
    return close & valid[:, None] & valid[None, :]


def _connected_components(adj: jax.Array, valid: jax.Array) -> jax.Array:
    """Connected-component labels via boolean transitive closure.

    The closure is computed by repeated squaring of the adjacency matrix —
    ceil(log2(N)) batched matmuls that ride the MXU in bfloat16 (entries
    are 0/1 and row sums are <= N, so ">0" is exact in bf16) — instead of
    a sequential label-propagation loop, which is HBM-bound on TPU.

    Returns (N,) int32 labels; a component's label is its smallest member
    index (OpenCV ``partition`` classes, reindexed).  Invalid rows keep
    their own index.
    """
    n = adj.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    # self-loops make the closure reflexive so labels include self
    a = (adj | jnp.eye(n, dtype=bool)).astype(jnp.bfloat16)
    steps = max(1, math.ceil(math.log2(max(n - 1, 2))))
    for _ in range(steps):
        a = (jnp.matmul(a, a) > 0).astype(jnp.bfloat16)
    reach = a > 0
    labels = jnp.min(jnp.where(reach, idx[None, :], jnp.int32(n)), axis=1)
    return jnp.where(valid, jnp.minimum(labels, idx), idx)


def group_rectangles(rects: jax.Array,
                     valid: jax.Array,
                     group_threshold: int = 3,
                     eps: float = 0.2) -> GroupedRects:
    """Device groupRectangles over a fixed-capacity box set.

    Args:
      rects: (N, 4) candidate boxes.  Interpreted per OpenCV field order
        ``(x, y, w, h)``; the detector passes corner boxes, matching the
        reference call (fcn_object_detector.py:341-342).
      valid: (N,) bool candidate mask.
      group_threshold: keep clusters with count > group_threshold.
      eps: similarity tolerance.

    Returns:
      GroupedRects with results in root-index slots.
    """
    n = rects.shape[0]
    rects = jnp.rint(jnp.asarray(rects, jnp.float32))
    valid = jnp.asarray(valid, jnp.bool_)

    adj = _similar(rects, valid, eps)
    labels = _connected_components(adj, valid)

    # Cluster aggregation: membership[i, r] = (labels[i] == r) & valid[i].
    member = (labels[:, None] == jnp.arange(n, dtype=jnp.int32)[None, :])
    member = member & valid[:, None]
    memf = member.astype(jnp.float32)
    counts = jnp.sum(memf, axis=0)                         # (N,)
    # Full precision: sums are integers up to ~1e5 and bf16 MXU passes
    # would mis-round them; this contraction is only (N, N) x (N, 4).
    sums = jnp.matmul(memf.T, rects,
                      precision=jax.lax.Precision.HIGHEST)  # (N, 4)
    means = jnp.rint(sums / jnp.maximum(counts[:, None], 1.0))

    weights = counts.astype(jnp.int32)
    survive = weights > group_threshold                    # (N,)

    # Containment suppression among survivors (reference semantics from
    # OpenCV groupRectangles' second loop).
    x, y = means[:, 0], means[:, 1]
    w, h = means[:, 2], means[:, 3]
    dx = jnp.rint(w * eps)
    dy = jnp.rint(h * eps)
    n1 = weights[:, None].astype(jnp.int32)                # row i
    n2 = weights[None, :].astype(jnp.int32)                # col j
    inside = (
        (x[:, None] >= (x - dx)[None, :])
        & (y[:, None] >= (y - dy)[None, :])
        & ((x + w)[:, None] <= (x + w + dx)[None, :])
        & ((y + h)[:, None] <= (y + h + dy)[None, :])
    )
    dominated = inside & (
        (n2 > jnp.maximum(3, n1)) | (n1 < 3)
    ) & survive[None, :] & (~jnp.eye(n, dtype=bool))
    suppressed = jnp.any(dominated, axis=1)

    out_valid = survive & ~suppressed
    return GroupedRects(
        rects=jnp.where(out_valid[:, None], means, 0.0),
        weights=jnp.where(out_valid, weights, 0),
        valid=out_valid,
    )


class Detections(NamedTuple):
    boxes: jax.Array       # (N, 4) corner boxes (x1, y1, x2, y2)
    confidence: jax.Array  # (N,) log(votes)
    valid: jax.Array       # (N,) bool


def vote_boxes(propose_boxes: jax.Array,
               valid: jax.Array,
               group_threshold: int = 3,
               eps: float = 0.2,
               min_height: int = 20) -> Detections:
    """Reference ``vote_boxes`` (fcn_object_detector.py:337-351) on device:
    group candidate corner boxes, reject grouped rects shorter than
    ``min_height`` pixels (``rect[3] - rect[1] >= 20``), confidence is the
    log of the vote count."""
    grouped = group_rectangles(propose_boxes, valid, group_threshold, eps)
    tall = (grouped.rects[:, 3] - grouped.rects[:, 1]) >= min_height
    ok = grouped.valid & tall
    conf = jnp.where(ok, jnp.log(jnp.maximum(grouped.weights, 1).astype(jnp.float32)), 0.0)
    return Detections(boxes=grouped.rects, confidence=conf, valid=ok)


def vote_boxes_batched(propose_boxes: jax.Array,
                       valid: jax.Array,
                       group_threshold: int = 3,
                       eps: float = 0.2,
                       min_height: int = 20) -> Detections:
    """Batched vote_boxes over (M, K, 4)/(M, K) candidates.

    On TPU with K a multiple of 128 this dispatches to the fused Pallas
    kernel (tpufcn/ops/pallas/group_rects.py — whole algorithm in VMEM
    per instance); otherwise a vmapped XLA path.  Identical semantics,
    shared golden tests.
    """
    if jax.default_backend() == "tpu" and propose_boxes.shape[-2] % 128 == 0:
        from tpufcn.ops.pallas.group_rects import group_rectangles_pallas
        g = group_rectangles_pallas(propose_boxes, valid,
                                    group_threshold, eps)
        tall = (g.rects[..., 3] - g.rects[..., 1]) >= min_height
        ok = g.valid & tall
        conf = jnp.where(
            ok, jnp.log(jnp.maximum(g.weights, 1).astype(jnp.float32)), 0.0)
        return Detections(boxes=g.rects, confidence=conf, valid=ok)
    return jax.vmap(
        lambda b, v: vote_boxes(b, v, group_threshold, eps, min_height)
    )(propose_boxes, valid)
