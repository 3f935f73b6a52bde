"""Hard synthetic benchmark (tpufcn/data/hardbench.py) + gate harness.

The round-3 accuracy gates train on these scenes; these tests pin the
properties that make the gate hard (VERDICT round-2 #1): class =
shape x texture conjunction, mismatched-pairing distractors, partial
occlusion, and a wide object scale range.
"""

import numpy as np
import pytest

from tpufcn.core.config import GridConfig
from tpufcn.data.hardbench import (
    BOX_CAPACITY, CLASS_DEFS, build_eval_set, distractor_defs,
    hard_pipeline, make_hard_backgrounds, make_hard_dataset,
    render_object)


def test_distractors_disjoint_from_classes():
    for classes in (4, 5, 6):
        used = set(CLASS_DEFS[:classes])
        dis = distractor_defs(classes)
        assert dis, "no distractor pairings left"
        assert not used & set(dis)
        # every distractor reuses a class shape or texture (hard
        # negative), never the conjunction
        shapes = {s for s, _ in used}
        textures = {t for _, t in used}
        assert all(s in shapes or t in textures for s, t in dis)


def test_render_object_shapes_and_masks():
    rng = np.random.default_rng(0)
    for shape in ("rect", "ellipse", "triangle"):
        for tex in ("checker", "rings", "stripes", "speckle"):
            patch, mask = render_object(shape, tex, 40, 56, rng)
            assert patch.shape == (40, 56, 3) and patch.dtype == np.uint8
            assert mask.shape == (40, 56)
            assert mask.sum() > 0
            # textures carry two distinguishable colors
            sel = mask > 0
            assert patch[sel].std() > 10


def test_dataset_and_backgrounds(tmp_path):
    rng = np.random.default_rng(3)
    samples = make_hard_dataset(str(tmp_path), rng, classes=4, per_class=3)
    assert len(samples) == 12
    assert sorted({s.label for s in samples}) == [0, 1, 2, 3]
    bgs = make_hard_backgrounds(str(tmp_path), rng, classes=4, n=2)
    assert len(bgs) == 2
    import cv2 as cv
    bg = cv.imread(bgs[0])
    assert bg.shape == (384, 512, 3)


def test_pipeline_occlusion_and_scale_range(tmp_path):
    grid = GridConfig(224, 224, stride=16, num_classes=4)
    pipe = hard_pipeline(str(tmp_path), grid, batch_size=4, seed=1)
    heights, overlaps, counts = [], 0, []
    from tpufcn.train.evaluate import box_iou_corners
    for _ in range(8):
        b = pipe.batch(4)
        assert b["image"].shape == (4, 224, 224, 3)
        assert b["rects"].shape == (4, BOX_CAPACITY, 4)
        for i in range(4):
            v = b["valid"][i]
            r = b["rects"][i][v]
            counts.append(int(v.sum()))
            heights += [float(h) for h in r[:, 3]]
            if len(r) >= 2:
                c = np.concatenate([r[:, :2], r[:, :2] + r[:, 2:4]], axis=1)
                iou = box_iou_corners(c, c)
                np.fill_diagonal(iou, 0)
                overlaps += int((iou > 0.05).sum()) // 2
    assert np.mean(counts) >= 2.0, "expected 2+ objects per scene"
    assert overlaps >= 3, "occlusion should occur regularly"
    # wide scale range: >= 4x spread between small and large objects
    assert max(heights) / max(min(heights), 1.0) >= 4.0
    # pipeline is seed-reproducible
    pipe2 = hard_pipeline(str(tmp_path), grid, batch_size=4, seed=1)
    for _ in range(8):
        b2 = pipe2.batch(4)
    assert np.array_equal(b2["image"], b["image"])


def test_eval_set_counts_and_determinism(tmp_path):
    grid = GridConfig(128, 128, stride=16, num_classes=4)
    images, gts, segs = build_eval_set(str(tmp_path), grid, classes=4,
                                       n_images=16, chunk=8)
    assert images.shape == (16, 128, 128, 3)
    assert segs.shape == (16, 128, 128)
    n_gt = sum(len(g[1]) for g in gts)
    assert n_gt >= 32          # ~2.5+ objects/scene at 16 images
    # seg masks carry label+1 values
    assert 0 < segs.max() <= 4
    images2, gts2, _ = build_eval_set(str(tmp_path), grid, classes=4,
                                      n_images=16, chunk=8)
    assert np.array_equal(images, images2)
    assert all(np.array_equal(a[0], b[0]) for a, b in zip(gts, gts2))


def test_run_bench_gates_budget_skip(tmp_path):
    """A deadline that no family's calibrated est_s fits inside skips
    EVERY gate (no training starts) and still reports one entry per
    family — the degraded-but-reported behavior bench.py relies on so
    an external timeout can't kill the process mid-gate."""
    import time

    from tpufcn.train.gates import bench_gate_configs, run_bench_gates

    sunk = []
    out = run_bench_gates(root=str(tmp_path), log=lambda m: None,
                          deadline=time.time() + 1.0, sink=sunk.append)
    assert set(out) == set(bench_gate_configs())
    for name, res in out.items():
        assert res == {"skipped": "budget",
                       "est_s": bench_gate_configs()[name]["est_s"]}
    # nothing ran, so the after-each-family sink never fired
    assert sunk == []


def test_gate_configs_have_cost_estimates():
    """Every tracked gate carries a calibrated wall-time estimate (the
    budget fitter is only as good as its costs) and the run order puts
    the most expensive family last so budgets degrade gracefully."""
    from tpufcn.train.gates import bench_gate_configs

    cfgs = bench_gate_configs()
    ests = [c["est_s"] for c in cfgs.values()]
    assert all(e > 0 for e in ests)
    assert max(ests) == list(cfgs.values())[-1]["est_s"]


@pytest.mark.slow
def test_detection_gate_smoke(tmp_path):
    """End-to-end gate harness on a tiny config (CPU): trains, scores,
    reports counts and per-seed stats."""
    from tpufcn.train.gates import detection_gate
    out = detection_gate("vgg_detectnet_train", classes=4,
                         im=64, stride=8, steps=4, batch=2, n_cached=2,
                         seeds=(0,), eval_images=8,
                         root=str(tmp_path))
    assert set(out) >= {"exact", "n_gt", "n_det", "seeds"}
    assert out["n_gt"] >= 16
    assert 0.0 <= out["exact"]["mAP"] <= 1.0
    assert len(out["exact"]["per_seed"]) == 1


def test_cached_host_batches_deterministic_roundtrip(tmp_path):
    """The gate's disk-memoized host-composited scene cache returns the
    identical batches on a warm re-load (gates.py _cached_host_batches:
    the fixed epoch set the gates train on, composed once per
    (geometry, classes, batch, n, seed))."""
    import numpy as np
    from tpufcn.core.config import GridConfig
    from tpufcn.train.gates import _cached_host_batches

    grid = GridConfig(64, 64, stride=16, num_classes=3)
    b1 = _cached_host_batches(str(tmp_path), grid, classes=3, batch=2,
                              n_cached=3, seed=7)
    import glob
    assert glob.glob(str(tmp_path / "hard_train_*.npz"))
    b2 = _cached_host_batches(str(tmp_path), grid, classes=3, batch=2,
                              n_cached=3, seed=7)
    assert len(b1) == len(b2) == 3
    assert set(b1[0]) == {"image", "rects", "labels", "valid", "seg"}
    for a, b in zip(b1, b2):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
    assert b1[0]["seg"].dtype == np.int32   # restored from u8 storage
    # a different seed composes different scenes
    b3 = _cached_host_batches(str(tmp_path), grid, classes=3, batch=2,
                              n_cached=3, seed=8)
    assert not np.array_equal(b1[0]["image"], b3[0]["image"])
