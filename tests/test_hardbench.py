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
    """A deadline that no family's calibrated estimate fits inside
    skips EVERY gate (no training starts) and still reports one entry
    per family — the degraded-but-reported behavior bench.py relies on
    so an external timeout can't kill the process mid-gate.  With a
    cold root, the first-touch ``est_s0`` is the budgeted estimate."""
    import time

    from tpufcn.train.gates import bench_gate_configs, run_bench_gates

    sunk = []
    out = run_bench_gates(root=str(tmp_path), log=lambda m: None,
                          deadline=time.time() + 1.0, sink=sunk.append)
    assert set(out) == set(bench_gate_configs())
    for name, cfg in bench_gate_configs().items():
        assert out[name] == {"skipped": "budget",
                             "est_s": cfg.get("est_s0", cfg["est_s"])}
    # nothing ran, so the after-each-unit sink never fired
    assert sunk == []


def test_plan_gate_units_breadth_first():
    """Pass 0 covers seed[0] of EVERY family in config order; later
    passes append seeds in SEED_APPEND_PRIORITY order (largest known
    spread first), one per pass."""
    from tpufcn.train.gates import plan_gate_units

    cfgs = {"a": {"seeds": (0, 1)}, "b": {"seeds": (0,)},
            "voc": {}, "fcn8s": {"seeds": (0, 1, 2)}}
    units = plan_gate_units(cfgs)
    assert units[:4] == [("a", 0), ("b", 0), ("voc", 0), ("fcn8s", 0)]
    # pass 1: fcn8s (priority) before a (unranked); pass 2: fcn8s only
    assert units[4:] == [("fcn8s", 1), ("a", 1), ("fcn8s", 2)]


def test_merge_family_per_seed():
    """Unit results merge by concatenating per-seed lists and
    recomputing mean/min/max; diagnostics accumulate."""
    from tpufcn.train.gates import _merge_family

    a = {"exact": {"mAP": 0.2, "min": 0.2, "max": 0.2, "per_seed": [0.2]},
         "fp8": {"mAP": 0.18, "min": 0.18, "max": 0.18, "per_seed": [0.18]},
         "seeds": [0], "n_gt": 50, "n_det": 40, "train_s": 10.0,
         "eval_s": 2.0, "wall_s": 12.0}
    b = {"exact": {"mAP": 0.4, "min": 0.4, "max": 0.4, "per_seed": [0.4]},
         "fp8": {"mAP": 0.38, "min": 0.38, "max": 0.38, "per_seed": [0.38]},
         "seeds": [1], "n_gt": 50, "n_det": 44, "train_s": 11.0,
         "eval_s": 2.0, "wall_s": 13.0}
    m = _merge_family(a, b)
    assert m["exact"] == {"mAP": 0.3, "min": 0.2, "max": 0.4,
                          "per_seed": [0.2, 0.4]}
    assert m["seeds"] == [0, 1]
    assert m["n_det"] == 44 and m["train_s"] == 21.0 and m["wall_s"] == 25.0
    # placeholder (skipped) old results are replaced, not merged
    assert _merge_family({"skipped": "budget", "est_s": 9}, b) == b
    # a later-seed error keeps the measured seeds and notes the error
    m = _merge_family(a, {"error": "RuntimeError: boom", "wall_s": 1.0})
    assert m["exact"]["per_seed"] == [0.2] and "error_later_seed" in m


def test_run_bench_gates_unit_scheduler(monkeypatch, tmp_path):
    """The budgeted unit scheduler (VERDICT r04 #1): breadth-first pass
    0 under a tight budget, per-UNIT est checks (a multi-seed family is
    never admitted on 1/N of the needed time), seed passes resume via
    ``prior``, and partial families report seeds_skipped."""
    import time as time_mod

    from tpufcn.train import gates

    clock = [1_000_000.0]
    monkeypatch.setattr(time_mod, "time", lambda: clock[0])

    cfgs = {
        "det2": dict(kind="detection", model="m", seeds=(0, 1), est_s=10),
        "seg1": dict(kind="segmentation", seeds=(0,), est_s=10),
        "voc": dict(kind="voc", est_s=10),
    }
    calls = []

    def fake_det(model, root, seeds, log, **kw):
        calls.append(("det", seeds))
        clock[0] += 10
        return {"exact": {"mAP": 0.5, "min": 0.5, "max": 0.5,
                          "per_seed": [0.5]}, "seeds": list(seeds)}

    def fake_seg(root, seeds, log, **kw):
        calls.append(("seg", seeds))
        clock[0] += 10
        return {"exact": {"mIoU": 0.8, "min": 0.8, "max": 0.8,
                          "per_seed": [0.8]}, "seeds": list(seeds)}

    def fake_voc(**kw):
        calls.append(("voc", None))
        clock[0] += 10
        return {"mAP": 0.4}

    monkeypatch.setattr(gates, "bench_gate_configs",
                        lambda tier="bench": cfgs)
    monkeypatch.setattr(gates, "detection_gate", fake_det)
    monkeypatch.setattr(gates, "segmentation_gate", fake_seg)
    monkeypatch.setattr(gates, "voc_fixture_gate", fake_voc)
    monkeypatch.setattr(gates, "_unit_cold", lambda *a: False)

    # budget fits pass 0 (3 units x 10s) but NOT det2's second seed:
    # breadth first means every family reports a real result
    out = gates.run_bench_gates(root=str(tmp_path), log=lambda m: None,
                                deadline=1_000_000.0 + 35)
    # pass 0 ran every family once, then det2's seed 1 no longer fits
    assert calls == [("det", (0,)), ("seg", (0,)), ("voc", None)]
    assert out["det2"]["exact"]["per_seed"] == [0.5]
    assert out["det2"]["seeds_skipped"] == 1
    assert out["seg1"]["exact"]["per_seed"] == [0.8]
    assert out["voc"]["mAP"] == 0.4

    # generous budget: pass 0 then the append pass; per-seed merge
    calls.clear()
    clock[0] = 1_000_000.0
    out = gates.run_bench_gates(root=str(tmp_path), log=lambda m: None,
                                deadline=1_000_000.0 + 1000)
    assert [c for c in calls] == [("det", (0,)), ("seg", (0,)),
                                  ("voc", None), ("det", (1,))]
    assert out["det2"]["exact"]["per_seed"] == [0.5, 0.5]
    assert out["det2"]["seeds"] == [0, 1]

    # split invocation (bench.py: pass 0, extras, then the rest): the
    # second call merges into `prior` without re-running pass 0
    calls.clear()
    clock[0] = 1_000_000.0
    p0 = gates.run_bench_gates(root=str(tmp_path), log=lambda m: None,
                               deadline=1_000_000.0 + 1000, passes=(0,))
    assert [c for c in calls] == [("det", (0,)), ("seg", (0,)),
                                  ("voc", None)]
    rest = gates.run_bench_gates(root=str(tmp_path), log=lambda m: None,
                                 deadline=1_000_000.0 + 1000,
                                 passes=range(1, 8), prior=p0)
    assert calls[-1] == ("det", (1,))
    assert rest["det2"]["exact"]["per_seed"] == [0.5, 0.5]
    assert rest["voc"]["mAP"] == 0.4


def test_run_bench_gates_adaptive_degradation(monkeypatch, tmp_path):
    """Observed unit walls rescale later estimates (median ratio): a 3x
    tunnel-degraded run stops admitting units that nominally 'fit' on
    stale est_s — forward-skip instead of a mid-gate external kill."""
    import time as time_mod

    from tpufcn.train import gates

    clock = [1_000_000.0]
    monkeypatch.setattr(time_mod, "time", lambda: clock[0])

    cfgs = {
        "a": dict(kind="detection", model="m", seeds=(0,), est_s=10),
        "b": dict(kind="detection", model="m", seeds=(0,), est_s=10),
        "c": dict(kind="detection", model="m", seeds=(0,), est_s=10),
    }

    def slow_det(model, root, seeds, log, **kw):
        clock[0] += 30          # 3x the estimate
        return {"exact": {"mAP": 0.5, "min": 0.5, "max": 0.5,
                          "per_seed": [0.5]}, "seeds": list(seeds)}

    monkeypatch.setattr(gates, "bench_gate_configs",
                        lambda tier="bench": cfgs)
    monkeypatch.setattr(gates, "detection_gate", slow_det)
    monkeypatch.setattr(gates, "_unit_cold", lambda *a: False)

    # budget 70s: naive est admits all three (3 x 10s); the adaptive
    # factor (ratio 3 after unit a) prices b at 30s (fits: 30+30=60)
    # and c at 30s (does not: 60+30 > 70)
    out = gates.run_bench_gates(root=str(tmp_path), log=lambda m: None,
                                deadline=1_000_000.0 + 70)
    assert "exact" in out["a"] and "exact" in out["b"]
    assert out["c"] == {"skipped": "budget", "est_s": 30}


def test_pretrain_path_resolves_across_invocations(monkeypatch, tmp_path):
    """The bench pass split (pass 0 -> extras -> seed passes) runs
    run_bench_gates twice; a pretrain unit completed in pass 0 must be
    re-resolved from ``prior`` so later-pass fine-tune seeds still get
    the backbone instead of silently training from scratch."""
    import time as time_mod

    from tpufcn.train import gates

    clock = [1_000_000.0]
    monkeypatch.setattr(time_mod, "time", lambda: clock[0])

    cfgs = {
        "pre": dict(kind="pretrain", classes=6, steps=4, est_s=1),
        "vgg": dict(kind="detection", model="m", seeds=(0, 1),
                    pretrain=True, est_s=1),
    }
    weights_seen = []

    def fake_det(model, root, seeds, log, weights=None, **kw):
        weights_seen.append(weights)
        clock[0] += 1
        return {"exact": {"mAP": 0.1, "min": 0.1, "max": 0.1,
                          "per_seed": [0.1]}, "seeds": list(seeds)}

    def fake_pretrain(root, log, **kw):
        clock[0] += 1
        return "/fake/backbone.caffemodel"

    import tpufcn.train.pretrain as pretrain_mod
    monkeypatch.setattr(gates, "bench_gate_configs",
                        lambda tier="bench": cfgs)
    monkeypatch.setattr(gates, "detection_gate", fake_det)
    monkeypatch.setattr(pretrain_mod, "cached_vgg16_pretrain",
                        fake_pretrain)
    monkeypatch.setattr(gates, "_unit_cold", lambda *a: False)

    p0 = gates.run_bench_gates(root=str(tmp_path), log=lambda m: None,
                               deadline=1_000_000.0 + 100, passes=(0,))
    assert p0["pre"]["path"] == "/fake/backbone.caffemodel"
    assert p0["vgg"]["pretrained"] is True
    rest = gates.run_bench_gates(root=str(tmp_path), log=lambda m: None,
                                 deadline=1_000_000.0 + 100,
                                 passes=range(1, 8), prior=p0)
    # BOTH seeds fine-tuned from the pass-0 backbone
    assert weights_seen == ["/fake/backbone.caffemodel"] * 2
    assert rest["vgg"]["exact"]["per_seed"] == [0.1, 0.1]


def test_warm_gate_caches_composes_missing(monkeypatch, tmp_path):
    """warm_gate_caches touches every tier input: composes what is
    missing, reports what is already on disk, and warms the cached
    pretrain via its cache path."""
    from tpufcn.train import gates

    cfgs = {
        "pre": dict(kind="pretrain", classes=6, steps=4, est_s=1),
        "voc": dict(kind="voc", est_s=1),
        "det": dict(kind="detection", model="googlenet_detectnet",
                    classes=4, im=64, stride=16, batch=2, n_cached=2,
                    eval_images=2, seeds=(0,), est_s=1),
    }
    monkeypatch.setattr(gates, "bench_gate_configs",
                        lambda tier="bench": cfgs)

    composed = []
    monkeypatch.setattr(gates, "_cached_host_batches",
                        lambda *a, **k: composed.append("train"))
    monkeypatch.setattr(gates, "build_eval_set",
                        lambda *a, **k: composed.append("eval"))
    import tpufcn.train.pretrain as pretrain_mod

    def fake_cached(root, log=None, **kw):
        p = pretrain_mod.pretrain_cache_path(root, **kw)
        open(p, "wb").close()
        composed.append("pretrain")
        return p

    monkeypatch.setattr(pretrain_mod, "cached_vgg16_pretrain",
                        fake_cached)

    out = gates.warm_gate_caches(root=str(tmp_path), log=lambda m: None)
    # voc composes in-run (skipped); det contributes eval + 1 seed
    # train cache; pretrain composed via its cache path
    assert sorted(composed) == ["eval", "pretrain", "train"]
    assert sorted(out.values()) == ["composed", "composed", "composed"]
    # second call: nothing recomposes... (the fakes wrote no npz files,
    # so only the pretrain — whose fake DID write its file — is warm)
    composed.clear()
    out2 = gates.warm_gate_caches(root=str(tmp_path),
                                  log=lambda m: None)
    assert "pretrain" not in composed


def test_unit_cold_probe(tmp_path):
    """_unit_cold: cold when the unit's train-scene or eval npz is
    missing; warm once both exist at the exact gate geometry."""
    from tpufcn.core.config import GridConfig
    from tpufcn.data.hardbench import eval_cache_path
    from tpufcn.train.gates import _unit_cold, train_cache_path

    cfg = dict(model="googlenet_detectnet", classes=4, im=448, stride=16,
               steps=6000, n_cached=60, eval_images=128)
    assert _unit_cold("detection", cfg, str(tmp_path), 0)
    grid = GridConfig(448, 448, stride=16, num_classes=5)
    t = train_cache_path(str(tmp_path), grid, classes=4, batch=16,
                         n_cached=60, seed=1000)
    e = eval_cache_path(str(tmp_path), grid, 4, 128)
    open(t, "wb").close()
    assert _unit_cold("detection", cfg, str(tmp_path), 0)   # eval missing
    open(e, "wb").close()
    assert not _unit_cold("detection", cfg, str(tmp_path), 0)
    assert _unit_cold("detection", cfg, str(tmp_path), 1)   # other seed


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
