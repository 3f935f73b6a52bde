"""Unit tests: device groupRectangles / vote_boxes vs numpy golden."""

import numpy as np
import jax.numpy as jnp

from tpufcn.ops.group_rects import group_rectangles, vote_boxes

from golden import golden_group_rectangles, golden_vote_boxes


def _clustered_corner_boxes(rng, n_clusters, per_cluster, jitter=4.0):
    """Corner boxes (x1, y1, x2, y2) jittered around cluster prototypes —
    the shape of data the detector actually feeds (decoded grid cells)."""
    boxes = []
    for _ in range(n_clusters):
        x1 = rng.uniform(0, 300)
        y1 = rng.uniform(0, 300)
        x2 = x1 + rng.uniform(60, 140)
        y2 = y1 + rng.uniform(60, 140)
        for _ in range(per_cluster):
            boxes.append([x1 + rng.normal(0, jitter), y1 + rng.normal(0, jitter),
                          x2 + rng.normal(0, jitter), y2 + rng.normal(0, jitter)])
    return np.asarray(boxes, np.float32)


def _sorted(items):
    return sorted(tuple(map(float, it)) for it in items)


def test_group_matches_golden_clustered(rng):
    CAP = 32  # fixed capacity: one compile for all trials
    for trial in range(8):
        boxes = _clustered_corner_boxes(
            rng, n_clusters=int(rng.integers(1, 4)),
            per_cluster=int(rng.integers(2, 9)))
        n = len(boxes)
        padded = np.zeros((CAP, 4), np.float32)
        padded[:n] = boxes
        got = group_rectangles(jnp.asarray(padded),
                               jnp.asarray(np.arange(CAP) < n),
                               group_threshold=3, eps=0.2)
        want_rects, want_w = golden_group_rectangles(boxes, 3, 0.2)

        g_valid = np.asarray(got.valid)
        g_rects = np.asarray(got.rects)[g_valid]
        g_w = np.asarray(got.weights)[g_valid]

        got_items = _sorted(np.concatenate([g_rects, g_w[:, None]], -1))
        want_items = _sorted([list(r) + [w] for r, w in zip(want_rects, want_w)])
        assert got_items == want_items, f"trial {trial}"


def test_group_random_boxes(rng):
    """Fully random (mostly singleton) boxes: everything filtered out the
    same way in both implementations."""
    CAP = 40  # fixed capacity: one compile for all trials
    for _ in range(5):
        n = int(rng.integers(1, CAP))
        boxes = rng.uniform(0, 400, size=(CAP, 4)).astype(np.float32)
        mask = np.arange(CAP) < n
        got = group_rectangles(jnp.asarray(boxes), jnp.asarray(mask), 3, 0.2)
        want_rects, want_w = golden_group_rectangles(boxes[:n], 3, 0.2)
        g_valid = np.asarray(got.valid)
        got_items = _sorted(np.concatenate(
            [np.asarray(got.rects)[g_valid],
             np.asarray(got.weights)[g_valid][:, None]], -1))
        want_items = _sorted([list(r) + [w] for r, w in zip(want_rects, want_w)])
        assert got_items == want_items


def test_group_respects_validity_mask(rng):
    boxes = _clustered_corner_boxes(rng, 1, 6)
    full = group_rectangles(jnp.asarray(boxes), jnp.ones(len(boxes), bool), 3, 0.2)
    # mask half the cluster below the vote threshold
    mask = np.zeros(len(boxes), bool)
    mask[:3] = True
    part = group_rectangles(jnp.asarray(boxes), jnp.asarray(mask), 3, 0.2)
    assert np.asarray(full.valid).sum() == 1
    assert np.asarray(part.valid).sum() == 0  # 3 votes is not > 3


def test_vote_boxes_height_filter_and_confidence(rng):
    boxes = _clustered_corner_boxes(rng, 2, 6)
    det = vote_boxes(jnp.asarray(boxes), jnp.ones(len(boxes), bool),
                     group_threshold=3, eps=0.2, min_height=20)
    want = golden_vote_boxes(boxes, 3, 0.2, 20)
    v = np.asarray(det.valid)
    got = _sorted(np.concatenate(
        [np.asarray(det.boxes)[v], np.asarray(det.confidence)[v][:, None]], -1))
    want_items = _sorted(want)
    assert len(got) == len(want_items)
    for g, w in zip(got, want_items):
        # boxes exact; confidence to f32-log accuracy
        np.testing.assert_allclose(g[:4], w[:4], atol=0)
        np.testing.assert_allclose(g[4], w[4], rtol=1e-3)


def test_group_empty():
    out = group_rectangles(jnp.zeros((8, 4)), jnp.zeros(8, bool), 3, 0.2)
    assert not bool(np.asarray(out.valid).any())
