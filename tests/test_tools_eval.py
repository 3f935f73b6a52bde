"""Tools (capture, ROI classifier, refinement, ranking) + mAP evaluator."""

import os

import numpy as np
import cv2 as cv
import pytest

from tpufcn.data.manifest import DetectionSample, read_detection_manifest
from tpufcn.serve.bus import TopicBus
from tpufcn.tools import (
    BoundaryRefiner, CnnCodeExtractor, ImageRectWriter, RankObjectProposals,
    ROIClassifier)
from tpufcn.tools.boundary_refinement import ncc_track
from tpufcn.tools.features import bhattacharyya, chi_square
from tpufcn.train.evaluate import (
    average_precision, box_iou_corners, evaluate_detections,
    evaluate_segmentation)


@pytest.fixture(scope="module")
def extractor():
    import jax.numpy as jnp
    return CnnCodeExtractor(input_size=64, dtype=jnp.float32)


def _scene(rng, ox, oy):
    img = rng.integers(0, 60, (120, 160, 3)).astype(np.uint8)
    # textured object (constant patches make NCC tracking degenerate)
    gy, gx = np.mgrid[0:40, 0:30]
    patch = np.stack([30 + gx * 4, 200 - gy * 3, 120 + ((gx + gy) % 7) * 10],
                     axis=-1).clip(0, 255).astype(np.uint8)
    img[oy:oy + 40, ox:ox + 30] = patch
    return img


def test_capture_node(tmp_path, rng):
    bus = TopicBus()
    w = ImageRectWriter(bus, str(tmp_path / "cap"), label=2)
    img = rng.integers(0, 255, (60, 80, 3)).astype(np.uint8)
    bus.publish("/camera/rgb/image_rect_color", img, stamp=1.0)
    bus.publish("/object_rect", [-5, 10, 200, 30], stamp=1.0)  # clamped
    bus.spin_once()
    assert w.counter == 1
    samples = read_detection_manifest(w.manifest)
    assert samples[0].labels[0] == 1  # label 2, 1-based -> 1
    np.testing.assert_array_equal(samples[0].rects[0], [0, 10, 80, 30])


def test_ncc_track_follows_shift(rng):
    prev = _scene(rng, 40, 30)
    cur = _scene(rng, 48, 36)
    rect = ncc_track(prev, [40, 30, 30, 40], cur)
    assert abs(rect[0] - 48) <= 2 and abs(rect[1] - 36) <= 2


def test_boundary_refiner_manifest(tmp_path, rng, extractor):
    paths = []
    for i in range(4):
        img = _scene(rng, 40 + 4 * i, 30 + 2 * i)
        p = str(tmp_path / f"f{i}.png")
        cv.imwrite(p, img)
        paths.append(p)
    samples = [DetectionSample(p, np.array([[38, 28, 34, 44]]),
                               np.array([0])) for p in paths]
    ref = BoundaryRefiner(extractor=extractor)
    out = str(tmp_path / "refined.txt")
    n = ref.refine_manifest(samples, out)
    assert n == 4
    refined = read_detection_manifest(out)
    assert len(refined) == 4


def test_roi_classifier_trained_head(rng, extractor):
    imgs = [_scene(rng, 40, 30) for _ in range(4)]
    clf = ROIClassifier(num_classes=2, extractor=extractor)
    # train the head: class 1 = the green box crop, class 0 = noise crop
    crops = ([i[30:70, 40:70] for i in imgs]
             + [i[0:30, 0:30] for i in imgs])
    codes = extractor(crops)
    labels = np.array([1] * 4 + [0] * 4)
    clf.fit_head(codes, labels, 2)
    dets = clf(imgs[0], [[40, 30, 30, 40], [0, 0, 30, 30]])
    assert any(l == 1 for _, l, _ in dets)


def test_rank_proposals_filters_outlier(tmp_path, rng, extractor):
    paths = []
    for i in range(6):
        if i == 3:  # outlier frame: no object, random noise
            img = rng.integers(0, 255, (120, 160, 3)).astype(np.uint8)
        else:
            img = _scene(rng, 40, 30)
        p = str(tmp_path / f"r{i}.png")
        cv.imwrite(p, img)
        paths.append(p)
    samples = [DetectionSample(p, np.array([[40, 30, 30, 40]]),
                               np.array([0])) for p in paths]
    # tight threshold: untrained-backbone codes are highly correlated, so
    # distances are small in absolute terms (outlier ~0.06 vs inliers ~0)
    ranker = RankObjectProposals(extractor=extractor, distance_thresh=0.03)
    keep = ranker.rank(samples)
    assert keep[0]
    assert not keep[3]          # the outlier is rejected
    out = str(tmp_path / "train2.txt")
    n = ranker.write_filtered(samples, out)
    assert n == int(keep.sum())


def test_distance_measures():
    a = np.array([1.0, 0, 0])
    assert bhattacharyya(a, a) < 1e-6
    assert bhattacharyya(a, np.array([0, 1.0, 0])) > 0.9
    assert chi_square(a, a) == 0.0


def test_box_iou_and_ap():
    a = np.array([[0, 0, 10, 10]])
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15]])
    ious = box_iou_corners(a, b)
    np.testing.assert_allclose(ious[0, 0], 1.0)
    assert 0.1 < ious[0, 1] < 0.2
    r = np.array([0.5, 1.0])
    p = np.array([1.0, 0.5])
    assert 0.5 < average_precision(r, p) <= 1.0


def test_evaluate_segmentation_hand_golden():
    """4x4 maps, 3 classes, hand-computed confusion:

    gt:   0 0 1 1      pred: 0 0 1 1
          0 0 1 1            0 2 1 1
          2 2 2 2            2 2 2 0
          0 0 0 0            0 0 0 0

    class 0: tp=7, gt=8, pred=8  -> IoU 7/9
    class 1: tp=4, gt=4, pred=4  -> IoU 1.0
    class 2: tp=3, gt=4, pred=4  -> IoU 3/5
    """
    gt = np.array([[0, 0, 1, 1], [0, 0, 1, 1],
                   [2, 2, 2, 2], [0, 0, 0, 0]])
    pred = np.array([[0, 0, 1, 1], [0, 2, 1, 1],
                     [2, 2, 2, 0], [0, 0, 0, 0]])
    res = evaluate_segmentation([gt], [pred], num_classes=3)
    assert res["iou"][0] == pytest.approx(7 / 9)
    assert res["iou"][1] == pytest.approx(1.0)
    assert res["iou"][2] == pytest.approx(3 / 5)
    assert res["mean_iou"] == pytest.approx((7 / 9 + 1.0 + 3 / 5) / 3)
    assert res["pixel_accuracy"] == pytest.approx(14 / 16)
    assert res["mean_class_accuracy"] == pytest.approx(
        (7 / 8 + 4 / 4 + 3 / 4) / 3)
    # perfect prediction
    perf = evaluate_segmentation([gt], [gt], num_classes=3)
    assert perf["mean_iou"] == pytest.approx(1.0)
    assert perf["pixel_accuracy"] == pytest.approx(1.0)
    # absent classes (only bg present) don't enter the mean; a class
    # hallucinated by the prediction does (as IoU 0)
    z = np.zeros((4, 4), np.int64)
    res0 = evaluate_segmentation([z], [pred], num_classes=3)
    assert set(res0["iou"]) == {0, 1, 2}
    assert res0["iou"][1] == 0.0
    # ignore_label drops those GT pixels entirely
    resi = evaluate_segmentation([gt], [pred], num_classes=3,
                                 ignore_label=2)
    assert 2 in resi["iou"]            # still present via predictions
    assert resi["iou"][2] == 0.0       # ... with no matching GT
    assert resi["iou"][1] == pytest.approx(1.0)
    # pooled across images == one concatenated map
    res2 = evaluate_segmentation([gt, gt], [pred, gt], num_classes=3)
    assert res2["confusion"].sum() == 32
    # out-of-range GT (num_classes typo) is counted and warned about,
    # never silently dropped
    with pytest.warns(UserWarning, match="outside"):
        resw = evaluate_segmentation([gt], [np.clip(pred, 0, 1)],
                                     num_classes=2)
    assert resw["invalid_gt_pixels"] == 4      # the class-2 GT pixels
    assert res["invalid_gt_pixels"] == 0


def test_evaluate_detections_perfect_and_miss():
    gt = [(np.array([[0, 0, 10, 10]]), np.array([0])),
          (np.array([[20, 20, 40, 40]]), np.array([0]))]
    # perfect detections
    dets = [(np.array([[0, 0, 10, 10]]), np.array([0]), np.array([0.9])),
            (np.array([[20, 20, 40, 40]]), np.array([0]), np.array([0.8]))]
    res = evaluate_detections(gt, dets, num_classes=1)
    assert res["mAP"] == pytest.approx(1.0)
    # one miss
    dets2 = [(np.array([[0, 0, 10, 10]]), np.array([0]), np.array([0.9])),
             (np.zeros((0, 4)), np.zeros(0), np.zeros(0))]
    res2 = evaluate_detections(gt, dets2, num_classes=1)
    assert res2["mAP"] == pytest.approx(0.5)


def test_capture_node_resumes_numbering(tmp_path, rng):
    """A second capture session into the same out_dir must continue the
    frame numbering (the appended manifest still references the first
    session's files) instead of overwriting 00000000.jpg onward."""
    out = str(tmp_path / "cap2")
    for session, expect in ((0, "00000000.jpg"), (1, "00000001.jpg")):
        bus = TopicBus()
        w = ImageRectWriter(bus, out, label=1)
        img = rng.integers(0, 255, (60, 80, 3)).astype(np.uint8)
        bus.publish("/camera/rgb/image_rect_color", img, stamp=1.0)
        bus.publish("/object_rect", [5, 5, 20, 20], stamp=1.0)
        bus.spin_once()
        assert os.path.exists(os.path.join(out, expect))
    samples = read_detection_manifest(
        os.path.join(out, "train.txt"))
    assert len(samples) == 2
    assert samples[0].image_path != samples[1].image_path


def test_crop_clamps_out_of_frame_rect(rng, extractor):
    """A tracker box fully right of / below the frame must yield a
    non-empty crop (cv.resize aborts on empty input) in both the
    refiner and the ranking tool."""
    img = rng.integers(0, 255, (40, 50, 3)).astype(np.uint8)
    refiner = BoundaryRefiner(extractor=extractor)
    for rect in ([60, 10, 20, 20], [10, 45, 20, 20], [-30, -30, 10, 10]):
        crop = refiner._crop(img, rect)
        assert crop.size > 0
        extractor([crop])  # must not raise

    ip = str(rng.integers(0, 10))  # path unused thanks to imread stub
    ranker = RankObjectProposals(
        extractor=extractor, imread=lambda _: img)
    codes = ranker.codes_for([DetectionSample(
        ip, np.asarray([[60, 45, 20, 20]]), np.asarray([0]))])
    assert codes.shape[0] == 1


def test_refine_multi_rect_sample_keeps_invariant(tmp_path, rng, extractor):
    """refine() walks single-object sequences (rects[0] only, like the
    reference); a multi-box VOC sample must come back with matching
    (1, 4) rects and (1,) labels, not 1 rect + M labels."""
    paths = []
    for i in range(2):
        img = _scene(rng, 40 + 4 * i, 30)
        p = str(tmp_path / f"m{i}.png")
        cv.imwrite(p, img)
        paths.append(p)
    samples = [DetectionSample(
        p, np.asarray([[40, 30, 30, 40], [5, 5, 10, 10]]),
        np.asarray([0, 3])) for p in paths]
    refined = BoundaryRefiner(extractor=extractor).refine(samples)
    for s in refined:
        assert s.rects.shape == (1, 4)
        assert s.labels.shape == (1,)
        assert s.labels[0] == 0


def test_boundary_refiner_live_node(rng, extractor):
    """Live mode (reference is_online path :326-339, callback :158-245):
    synced (image, rect) pairs -> tracked rect published in frame
    coords; the first pair only seeds the template."""
    from tpufcn.tools import BoundaryRefinerNode

    bus = TopicBus()
    got = []
    bus.subscribe("/boundary_refinement/rect", got.append)
    node = BoundaryRefinerNode(
        bus, refiner=BoundaryRefiner(extractor=extractor))

    for t, (ox, oy) in enumerate([(40, 30), (46, 34)]):
        bus.publish("/camera/rgb/image_rect_color", _scene(rng, ox, oy),
                    stamp=float(t))
        # the stale rect from frame 0: the tracker should move it
        bus.publish("/object_rect", [40, 30, 30, 40], stamp=float(t))
        bus.spin_once()
    bus.spin_once()  # drain the node's published result to the listener

    assert len(got) == 1  # first pair seeds only
    x, y, w, h = got[0].data
    assert (w, h) == (30, 40)
    assert abs(x - 46) <= 3 and abs(y - 34) <= 3


def test_roi_classifier_node(rng, extractor):
    """The reference's disabled subscribe mode as a bus node: detector
    rects come in as corner-point pairs, confirmed proposals go out the
    same way with classifier labels."""
    from tpufcn.serve.stream import RectsMsg
    from tpufcn.tools import ROIClassifier, ROIClassifierNode

    # train a head that separates bright-object crops (class 1) from
    # background crops (class 0)
    imgs = [_scene(rng, 30 + i, 25) for i in range(8)]
    crops = [im[25:65, 30 + i:60 + i] for i, im in enumerate(imgs)]
    bgs = [im[80:110, 100:140] for im in imgs]
    codes = extractor(crops + bgs)
    labels = np.array([1] * 8 + [0] * 8)
    clf = ROIClassifier(num_classes=2, extractor=extractor)
    clf.fit_head(codes, labels, num_classes=2)

    bus = TopicBus()
    got = []
    bus.subscribe("/rcnn_detector/rects", got.append)
    ROIClassifierNode(bus, clf)
    frame = _scene(rng, 40, 30)
    bus.publish("image", frame, stamp=1.0)
    bus.publish("/fcn_object_detector/rects",
                RectsMsg([(40, 30), (70, 70), (100, 80), (140, 110)],
                         [0, 0], [0.5, 0.5]), stamp=1.0)
    bus.spin_once()
    bus.spin_once()
    assert len(got) == 1
    out = got[0].data
    # the object rect survives as class 1; the background rect's fate
    # depends only on its class-0 confidence (never labeled object)
    assert (40, 30) in out.points
    kept = {out.points[2 * i]: l for i, l in enumerate(out.labels)}
    assert kept[(40, 30)] == 1
    assert all(l == 0 for p, l in kept.items() if p == (100, 80))
