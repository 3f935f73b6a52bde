"""Unit tests: grid label encoder / decoder vs numpy goldens + round-trip."""

import numpy as np
import jax.numpy as jnp

from tpufcn.core.config import GridConfig
from tpufcn.ops.boxes import scaled_iou_xywh
from tpufcn.ops.grid_codec import (
    encode_grid_labels, encode_grid_labels_batch, decode_gridboxes)

from golden import golden_scaled_iou, golden_encode, golden_decode


def random_rects(rng, n, im_w, im_h, min_side=24):
    rects = []
    for _ in range(n):
        w = rng.integers(min_side, im_w // 2)
        h = rng.integers(min_side, im_h // 2)
        x = rng.integers(0, im_w - w)
        y = rng.integers(0, im_h - h)
        rects.append([x, y, w, h])
    return np.asarray(rects, np.float32)


def test_scaled_iou_matches_golden(rng):
    for _ in range(200):
        a = random_rects(rng, 1, 224, 224, 4)[0]
        b = random_rects(rng, 1, 224, 224, 4)[0]
        got = float(scaled_iou_xywh(jnp.asarray(a), jnp.asarray(b)))
        want = golden_scaled_iou(a, b)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_encode_matches_golden(rng):
    grid = GridConfig(im_width=224, im_height=224, stride=16, num_classes=3)
    for _ in range(5):
        n = int(rng.integers(1, 5))
        rects = random_rects(rng, n, 224, 224)
        labels = rng.integers(0, 3, size=n).astype(np.int32)
        valid = np.ones(n, bool)

        out = encode_grid_labels(rects, labels, valid, grid)
        g_cov, g_bbox, g_size, g_obj, g_blk = golden_encode(
            rects, labels, 224, 224, 16, 3)

        # device tensors are HWC; goldens CHW
        np.testing.assert_allclose(np.moveaxis(np.asarray(out.coverage), -1, 0),
                                   g_cov, atol=1e-5)
        np.testing.assert_allclose(np.moveaxis(np.asarray(out.bbox), -1, 0),
                                   g_bbox, atol=1e-4)
        np.testing.assert_allclose(np.moveaxis(np.asarray(out.size), -1, 0),
                                   g_size, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.moveaxis(np.asarray(out.obj), -1, 0),
                                   g_obj, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.moveaxis(np.asarray(out.coverage_block), -1, 0),
                                   g_blk, atol=1e-5)


def test_encode_padding_ignored(rng):
    grid = GridConfig(im_width=224, im_height=224, stride=16, num_classes=2)
    rects = random_rects(rng, 3, 224, 224)
    labels = np.array([0, 1, 0], np.int32)
    full = encode_grid_labels(rects, labels, np.array([True, True, False]), grid)
    only2 = encode_grid_labels(rects[:2], labels[:2], np.ones(2, bool), grid)
    np.testing.assert_array_equal(np.asarray(full.coverage), np.asarray(only2.coverage))
    np.testing.assert_array_equal(np.asarray(full.bbox), np.asarray(only2.bbox))


def test_decode_matches_golden(rng):
    grid = GridConfig(im_width=448, im_height=448, stride=8, num_classes=2)
    gh, gw = grid.grid_h, grid.grid_w
    cvg = rng.random((gh, gw, 2), dtype=np.float32)
    bbox = (rng.random((gh, gw, 8), dtype=np.float32) * 60 - 10).astype(np.float32)

    boxes, cvgs, valid = decode_gridboxes(jnp.asarray(cvg), jnp.asarray(bbox),
                                          grid, prob_thresh=0.5)
    for c in range(2):
        g_boxes, g_cvgs = golden_decode(
            cvg[:, :, c], np.moveaxis(bbox[:, :, 4 * c:4 * c + 4], -1, 0),
            448, 448, 8, 0.5)
        got_boxes = np.asarray(boxes[c])[np.asarray(valid[c])]
        got_cvgs = np.asarray(cvgs[c])[np.asarray(valid[c])]
        np.testing.assert_allclose(got_boxes, g_boxes, atol=1e-4)
        np.testing.assert_allclose(got_cvgs, g_cvgs, atol=1e-6)


def test_encode_decode_roundtrip(rng):
    """decode(encode(boxes)) recovers the GT corners on covered cells."""
    grid = GridConfig(im_width=224, im_height=224, stride=8, num_classes=1)
    rects = np.array([[64, 48, 80, 96]], np.float32)
    labels = np.zeros(1, np.int32)
    enc = encode_grid_labels(rects, labels, np.ones(1, bool), grid)

    boxes, _, valid = decode_gridboxes(enc.coverage, enc.bbox, grid, 0.5)
    got = np.asarray(boxes[0])[np.asarray(valid[0])]
    assert got.shape[0] > 0
    want = np.array([64, 48, 144, 144], np.float32)
    np.testing.assert_allclose(got, np.tile(want, (got.shape[0], 1)), atol=1e-4)


def test_encode_batch_shapes(rng):
    grid = GridConfig(im_width=224, im_height=224, stride=16, num_classes=3)
    B, M = 4, 6
    rects = np.stack([random_rects(rng, M, 224, 224) for _ in range(B)])
    labels = rng.integers(0, 3, size=(B, M)).astype(np.int32)
    valid = np.ones((B, M), bool)
    out = encode_grid_labels_batch(rects, labels, valid, grid)
    assert out.coverage.shape == (B, 14, 14, 3)
    assert out.bbox.shape == (B, 14, 14, 12)
