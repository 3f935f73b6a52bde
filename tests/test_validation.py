"""In-training validation (the Caffe TEST-phase analog, reference
train/bounding_box/solver.prototxt:6-7 test_iter/test_interval +
train_val.prototxt TEST-phase nets): cadence, metric logging,
best-checkpoint retention, and the mAP/mIoU validators."""

import json
import os

import cv2 as cv
import numpy as np
import jax.numpy as jnp
import pytest

from tpufcn.core.config import DataConfig, GridConfig, TrainConfig
from tpufcn.data import CompositeTrainPipeline
from tpufcn.data.manifest import MaskSample
from tpufcn.models import build
from tpufcn.train.trainer import Trainer, load_snapshot_params


@pytest.fixture
def tiny_dataset(tmp_path, rng):
    samples = []
    for i in range(3):
        img = rng.integers(0, 80, size=(96, 128, 3)).astype(np.uint8)
        mask = np.zeros((96, 128), np.uint8)
        x, y, w, h = 20 + i * 6, 16, 40, 48
        img[y:y + h, x:x + w] = (200, 60 + 60 * i, 90)
        mask[y:y + h, x:x + w] = 255
        ip, mp = str(tmp_path / f"i{i}.png"), str(tmp_path / f"m{i}.png")
        cv.imwrite(ip, img)
        cv.imwrite(mp, mask)
        samples.append(MaskSample(ip, mp, i % 2, np.array([x, y, w, h])))
    return samples


def _cfg(tmp_path, **kw):
    grid = GridConfig(im_width=64, im_height=64, stride=8, num_classes=2)
    base = dict(grid=grid, model="vgg_detectnet_train",
                data=DataConfig(batch_size=2), snapshot_every=0,
                max_iter=4, snapshot_dir=str(tmp_path / "snap"),
                log_every=1)
    base.update(kw)
    return TrainConfig(**base)


def test_validation_cadence_and_best_retention(tmp_path, tiny_dataset):
    """Validator runs at each crossed eval_every boundary, val metrics
    land in the history, and best/ retains the checkpoint from the
    HIGHEST-scoring validation (here the first), not the last."""
    cfg = _cfg(tmp_path, eval_every=2)
    model = build("vgg_detectnet_train", dtype=jnp.float32, num_classes=2)

    import jax

    calls = []
    scores = [0.9, 0.4, 0.2]

    def validator(params):
        # capture the first param leaf per call to identify which
        # snapshot best/ retained
        calls.append(np.asarray(jax.tree_util.tree_leaves(params)[0]).copy())
        return {"score": scores[len(calls) - 1], "aux": 7}

    lines = []
    tr = Trainer(cfg, model=model, validator=validator, log_sink=lines.append)
    pipe = CompositeTrainPipeline(tiny_dataset, cfg.grid,
                                  DataConfig(batch_size=2),
                                  box_capacity=4)
    tr.fit(iter(pipe), max_iter=4)

    # validations at step 2 and step 4
    val_recs = [h for h in tr.logger.history if "val_score" in h]
    assert [h["step"] for h in val_recs] == [2, 4]
    assert val_recs[0]["val_score"] == 0.9
    assert val_recs[0]["val_aux"] == 7

    # best = step 2 (score 0.9 beats 0.4)
    assert tr.best == {"step": 2, "score": 0.9, "metric": "score"}
    with open(os.path.join(cfg.snapshot_dir, "BEST.json")) as f:
        side = json.load(f)
    assert side["step"] == 2 and side["metrics"]["score"] == 0.9

    # the retained checkpoint holds the STEP-2 params, not step-4's
    best_params = load_snapshot_params(
        os.path.join(cfg.snapshot_dir, "best"))
    got = np.asarray(jax.tree_util.tree_leaves(best_params)[0])
    want2, want4 = calls[0], calls[1]
    assert not np.array_equal(want2, want4), \
        "step-2 and step-4 params identical — test inert"
    assert np.array_equal(got, want2)


def test_validator_without_cadence_rejected(tmp_path):
    cfg = _cfg(tmp_path)  # eval_every defaults to 0
    model = build("vgg_detectnet_train", dtype=jnp.float32, num_classes=2)
    with pytest.raises(ValueError, match="eval_every"):
        Trainer(cfg, model=model, validator=lambda p: {"x": 1.0},
                log_sink=lambda s: None)


def test_validation_multistep_boundary_crossing(tmp_path, tiny_dataset):
    """steps_per_dispatch=2 with eval_every=3 never lands ON a multiple
    of 3: validation must fire when the boundary is CROSSED (step 4)
    and again at the final step."""
    cfg = _cfg(tmp_path, eval_every=3, max_iter=6)
    model = build("vgg_detectnet_train", dtype=jnp.float32, num_classes=2)
    seen = []

    def validator(params):
        seen.append(1)
        return {"score": 1.0 / len(seen)}

    tr = Trainer(cfg, model=model, steps_per_dispatch=2,
                 validator=validator, log_sink=lambda s: None)
    pipe = CompositeTrainPipeline(tiny_dataset, cfg.grid,
                                  DataConfig(batch_size=2),
                                  box_capacity=4)
    tr.fit(iter(pipe), max_iter=6)
    steps = [h["step"] for h in tr.logger.history if "val_score" in h]
    assert steps == [4, 6]


def test_final_validation_on_short_run(tmp_path, tiny_dataset):
    """A run shorter than eval_every still validates once at the end
    and retains a best checkpoint."""
    cfg = _cfg(tmp_path, eval_every=100, max_iter=2)
    model = build("vgg_detectnet_train", dtype=jnp.float32, num_classes=2)
    tr = Trainer(cfg, model=model, validator=lambda p: {"score": 0.5},
                 log_sink=lambda s: None)
    pipe = CompositeTrainPipeline(tiny_dataset, cfg.grid,
                                  DataConfig(batch_size=2),
                                  box_capacity=4)
    tr.fit(iter(pipe), max_iter=2)
    assert tr.best is not None and tr.best["step"] == 2
    assert os.path.isdir(os.path.join(cfg.snapshot_dir, "best"))


def test_val_set_builders(tmp_path, rng):
    """Record-shard and manifest val-set builders resize images to the
    net geometry with GT boxes scaled to match (corner convention)."""
    from tpufcn.data.records import RecordWriter
    from tpufcn.train.validate import (
        val_set_from_manifest, val_set_from_records)

    img = rng.integers(0, 255, size=(100, 200, 3)).astype(np.uint8)
    with RecordWriter(str(tmp_path / "ds")) as w:
        w.write_image_record(img, {
            "rects": np.array([[20, 10, 40, 50]], np.int32),
            "labels": np.array([1], np.int32)})
        w.write_image_record(img, {
            "rects": np.array([[0, 0, 200, 100]], np.int32),
            "labels": np.array([0], np.int32)})
    images, gts = val_set_from_records(str(tmp_path / "ds"), (64, 64))
    assert images.shape == (2, 64, 64, 3)
    # 200x100 -> 64x64: x scales by 0.32, y by 0.64
    np.testing.assert_allclose(gts[0][0][0],
                               [20 * 0.32, 10 * 0.64,
                                60 * 0.32, 60 * 0.64])
    assert gts[0][1][0] == 1

    p = str(tmp_path / "img.png")
    cv.imwrite(p, img)
    with open(tmp_path / "man.txt", "w") as f:
        f.write(f"{p} 20 10 40 50 2\n")   # 1-based label -> class 1
    images2, gts2 = val_set_from_manifest(str(tmp_path / "man.txt"),
                                          (64, 64))
    assert images2.shape == (1, 64, 64, 3)
    np.testing.assert_allclose(gts2[0][0], gts[0][0])
    assert gts2[0][1][0] == 1


def test_seg_val_set_builder(tmp_path, rng):
    from tpufcn.train.validate import seg_val_set_from_manifest

    img = rng.integers(0, 255, size=(80, 80, 3)).astype(np.uint8)
    msk = np.zeros((80, 80), np.uint8)
    msk[10:50, 10:50] = 255
    ip, mp = str(tmp_path / "a.png"), str(tmp_path / "a_m.png")
    cv.imwrite(ip, img)
    cv.imwrite(mp, msk)
    with open(tmp_path / "seg.txt", "w") as f:
        f.write(f"{ip} {mp} 0 10 10 40 40\n\n")
    images, masks = seg_val_set_from_manifest(str(tmp_path / "seg.txt"),
                                              (64, 64))
    assert images.shape == (1, 64, 64, 3)
    assert masks.shape == (1, 64, 64)
    # background_offset=1: raw label 0 -> class 1 inside the mask
    assert set(np.unique(masks)) == {0, 1}


@pytest.mark.slow
def test_cli_train_with_validation(tmp_path, tiny_dataset, rng):
    """End-to-end CLI: --eval-every + --val-records trains, logs val
    records into --metrics-out, and leaves a servable best/ snapshot."""
    import subprocess
    import sys

    from tpufcn.data.records import RecordWriter

    # mask manifest for training (stride-2 record format)
    man = tmp_path / "train.txt"
    with open(man, "w") as f:
        for s in tiny_dataset:
            x, y, w, h = [int(v) for v in s.rect]
            f.write(f"{s.image_path} {s.mask_path} {s.label} "
                    f"{x} {y} {w} {h}\n\n")
    # held-out records
    img = rng.integers(0, 255, size=(96, 128, 3)).astype(np.uint8)
    with RecordWriter(str(tmp_path / "val")) as w:
        w.write_image_record(img, {
            "rects": np.array([[20, 16, 40, 48]], np.int32),
            "labels": np.array([0], np.int32)})
    metrics = tmp_path / "metrics.jsonl"
    out = subprocess.run(
        [sys.executable, "-m", "tpufcn.cli", "train",
         "--recipe", "bounding_box", "--manifest", str(man),
         "--batch-size", "2", "--max-iter", "2",
         "--snapshot-dir", str(tmp_path / "snap"),
         "--eval-every", "2", "--val-records", str(tmp_path / "val"),
         "--val-limit", "4", "--metrics-out", str(metrics)],
        capture_output=True, text=True, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-2000:]
    assert "best checkpoint" in out.stdout
    recs = [json.loads(l) for l in open(metrics)]
    assert any("val_mAP" in r for r in recs)
    assert any("val_n_det" in r for r in recs)
    best = os.path.join(tmp_path, "snap", "best")
    params = load_snapshot_params(best)
    assert params is not None
