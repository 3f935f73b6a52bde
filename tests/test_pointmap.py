"""C++ point-map node: builds the shared library, validates Otsu /
regions / clustering against numpy+cv2 oracles, runs the fused pipeline
and the bus-synced node end-to-end."""

import numpy as np
import cv2 as cv
import pytest

from tpufcn.pointmap import PointMapLib, PointMapNode
from tpufcn.serve.bus import TopicBus


@pytest.fixture(scope="module")
def lib():
    return PointMapLib()


def test_otsu_matches_opencv(lib, rng):
    img = np.concatenate([
        rng.normal(60, 10, 3000), rng.normal(190, 12, 2000)
    ]).clip(0, 255).astype(np.uint8).reshape(50, 100)
    want, _ = cv.threshold(img, 0, 255, cv.THRESH_BINARY + cv.THRESH_OTSU)
    got = lib.otsu(img)
    assert abs(got - want) <= 1


def test_region_rects(lib):
    img = np.zeros((60, 80), np.uint8)
    img[5:30, 10:40] = 255      # area 750 > 400
    img[40:44, 60:66] = 255     # area 24 < 400 -> dropped
    rects = lib.region_rects(img, thresh=-1, area_thresh=400)
    assert rects.shape == (1, 4)
    np.testing.assert_array_equal(rects[0], [10, 5, 30, 25])


def test_euclidean_cluster_two_blobs(lib, rng):
    a = rng.normal(0, 0.004, size=(300, 3)).astype(np.float32)
    b = rng.normal(0, 0.004, size=(250, 3)).astype(np.float32) + 1.0
    noise = np.full((5, 3), 5.0, np.float32)  # tiny cluster -> dropped
    xyz = np.concatenate([a, b, noise])
    labels, k = lib.euclidean_cluster(xyz, tol=0.02, min_size=100,
                                      max_size=25000)
    assert k == 2
    assert len(set(labels[:300])) == 1 and labels[0] >= 0
    assert len(set(labels[300:550])) == 1
    assert (labels[550:] == -1).all()


def test_full_process(lib, rng):
    h, w = 60, 80
    # organized cloud: two planes at different depths
    cloud = np.full((h, w, 3), np.nan, np.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    cloud[..., 0] = xs * 0.01
    cloud[..., 1] = ys * 0.01
    cloud[..., 2] = 1.0
    # object mask and pmap agree on a region
    mask = np.zeros((h, w), np.uint8)
    pmap = np.zeros((h, w), np.uint8)
    mask[10:40, 10:50] = 200
    pmap[12:38, 12:48] = 180
    labels, k = lib.process(cloud, mask, pmap, cluster_tol=0.03,
                            min_cluster=100, max_cluster=25000)
    assert k == 1
    sel = labels >= 0
    assert sel.sum() >= 900       # the masked region clustered
    assert sel[:10].sum() == 0    # nothing outside


def test_pointmap_node_on_bus(lib, rng):
    bus = TopicBus()
    node = PointMapNode(bus, lib=lib, cluster_tol=0.03)
    got = {}
    bus.subscribe("/output/points", lambda m: got.setdefault("pts", m.data),
                  queue_size=4)
    bus.subscribe("/output/indices", lambda m: got.setdefault("idx", m.data),
                  queue_size=4)

    h, w = 40, 50
    cloud = np.zeros((h, w, 3), np.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    cloud[..., 0] = xs * 0.01
    cloud[..., 1] = ys * 0.01
    cloud[..., 2] = 1.0
    mask = np.zeros((h, w), np.uint8)
    mask[5:35, 5:45] = 255
    pmap = mask.copy()

    bus.publish("cloud", cloud, stamp=1.0)
    bus.publish("mask", mask, stamp=1.01)
    bus.publish("pmap", pmap, stamp=1.02)
    bus.publish("coefficients", None, stamp=1.03)
    bus.spin_once()
    bus.spin_once()
    assert node.processed == 1
    assert "pts" in got and got["pts"].shape[1] == 3
    assert "idx" in got and len(got["idx"]) >= 1


def test_fused_mask_polarity(lib):
    """Pin both fused-mask polarities (PARITY.md "Known deviations").

    Two object-mask regions; the probability map confirms only one.
    tpufcn default (keep_matched=True) clusters the CONFIRMED region;
    keep_matched=False reproduces the reference XOR complement
    (reference src/fcn_point_map_node.cpp:57-92): points come from the
    UNMATCHED remainder.
    """
    h, w = 60, 100
    cloud = np.zeros((h, w, 3), np.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    cloud[..., 0] = xs * 0.01
    cloud[..., 1] = ys * 0.01
    cloud[..., 2] = 1.0
    mask = np.zeros((h, w), np.uint8)
    mask[10:40, 5:40] = 220    # region A (matched by pmap)
    mask[10:40, 60:95] = 220   # region B (no pmap support)
    pmap = np.zeros((h, w), np.uint8)
    pmap[12:38, 7:38] = 200

    labels, k = lib.process(cloud, mask, pmap, cluster_tol=0.03,
                            min_cluster=100, keep_matched=True)
    assert k == 1
    sel = labels >= 0
    assert sel[:, :40].sum() >= 900 and sel[:, 60:].sum() == 0

    labels, k = lib.process(cloud, mask, pmap, cluster_tol=0.03,
                            min_cluster=100, keep_matched=False)
    assert k == 1
    sel = labels >= 0
    assert sel[:, 60:].sum() >= 900 and sel[:, :40].sum() == 0


def test_overlapping_matched_rects_no_double_flip(lib):
    """Two disjoint regions whose bounding rects OVERLAP, both matched.

    A per-rect XOR would flip the nested region's pixels twice (once
    for each covering rect) and erase it; the reference copies regions
    then applies ONE global bitwise_xor, so overlap must be idempotent
    (regression for the fused-mask rewrite in fcn_point_map.cpp).
    """
    h, w = 70, 110
    cloud = np.zeros((h, w, 3), np.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    cloud[..., 0] = xs * 0.01
    cloud[..., 1] = ys * 0.01
    cloud[..., 2] = 1.0
    mask = np.zeros((h, w), np.uint8)
    # region A: an L whose bounding rect encloses region B's rect
    mask[5:56, 5:16] = 220      # vertical bar
    mask[45:56, 5:66] = 220     # horizontal bar (connected to it)
    # region B: disjoint blob nested inside A's bounding rect
    mask[10:36, 30:61] = 220
    pmap = mask.copy()          # every region rect matches itself

    labels, k = lib.process(cloud, mask, pmap, cluster_tol=0.03,
                            min_cluster=100, keep_matched=True)
    assert k == 2               # B survives: no double-flip in overlap
    sel = labels >= 0
    assert sel[10:36, 30:61].sum() >= 700
