"""End-to-end VOC path on the committed photoreal-ish fixture set
(VERDICT round-2 #5): converter -> record shards -> training -> mAP
eval, all through the CLI, on images produced by an INDEPENDENT
renderer (examples/render_voc_fixture.py — lighting/shadows/noise, no
shared code with the training compositor).  Reference anchor:
scripts/voc/create_train_val.py:47-94 -> create_training_lmdb.py ->
caffe train.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "tests", "fixtures", "voc_mini")


def _cli(*args, timeout=900):
    env = dict(os.environ, TPUFCN_PLATFORM="cpu")
    out = subprocess.run([sys.executable, "-m", "tpufcn.cli", *args],
                         capture_output=True, text=True, timeout=timeout,
                         env=env, cwd=REPO)
    assert out.returncode == 0, (args, out.stderr[-3000:])
    return out.stdout


def test_fixture_layout_and_annotations():
    """The committed fixture is a valid VOC devkit subset with boxes
    that frame actual objects (non-degenerate, in-bounds)."""
    from tpufcn.data.voc import parse_annotation

    img_dir = os.path.join(FIXTURE, "JPEGImages")
    ann_dir = os.path.join(FIXTURE, "Annotations")
    ids = sorted(os.path.splitext(f)[0] for f in os.listdir(ann_dir))
    assert len(ids) == 144     # 48 train + 96 val (r04 power bump)
    names = set()
    import cv2 as cv
    for idx in ids:
        img = cv.imread(os.path.join(img_dir, idx + ".jpg"))
        assert img is not None and img.shape == (240, 320, 3)
        objs = parse_annotation(os.path.join(ann_dir, idx + ".xml"))
        assert objs
        for name, (x, y, w, h) in objs:
            names.add(name)
            assert w >= 8 and h >= 8
            assert 0 <= x and x + w <= 320 and 0 <= y and y + h <= 240
            # the box must frame SOMETHING: local contrast inside the
            # box well above a flat background patch
            assert img[y:y + h, x:x + w].std() > 5
    assert names == {"ball", "crate", "cone"}


def test_fixture_regeneration_is_deterministic(tmp_path):
    """The renderer reproduces the committed annotations for its seed
    (the JPEGs are committed to be codec-stable; geometry must match)."""
    from examples.render_voc_fixture import render_fixture
    from tpufcn.data.voc import parse_annotation

    render_fixture(str(tmp_path), n_train=2, n_val=1)
    ann = sorted(os.listdir(tmp_path / "Annotations"))
    assert ann == ["train_0000.xml", "train_0001.xml", "val_0002.xml"]
    objs = parse_annotation(str(tmp_path / "Annotations" / ann[0]))
    ref = parse_annotation(os.path.join(FIXTURE, "Annotations",
                                        "train_0000.xml"))
    assert objs == ref


@pytest.mark.slow
def test_voc_records_train_eval_chain(tmp_path):
    """voc -> records(--format voc) -> train(--records, with in-training
    validation off) -> eval(--format voc): the full reference VOC flow
    through the CLI on the committed fixture."""
    man = tmp_path / "man"
    _cli("voc", FIXTURE, "--out", str(man),
         "--classes", "ball", "crate", "cone")
    train_txt = man / "train.txt"
    val_txt = man / "val.txt"
    assert len(train_txt.read_text().splitlines()) == 48
    assert len(val_txt.read_text().splitlines()) == 96

    _cli("records", "--manifest", str(train_txt), "--format", "voc",
         "--out", str(tmp_path / "rec" / "ds"))
    inspect = _cli("records", "--inspect", "--limit", "2",
                   "--out", str(tmp_path / "rec" / "ds"))
    lines = [json.loads(l) for l in inspect.splitlines()]
    assert lines[-1]["records"] == 48
    assert all(l["labels"] for l in lines[:-1])

    _cli("train", "--recipe", "bounding_box",
         "--records", str(tmp_path / "rec" / "ds"),
         "--batch-size", "4", "--max-iter", "2",
         "--snapshot-dir", str(tmp_path / "snap"))
    out = _cli("eval", "--manifest", str(val_txt), "--format", "voc",
               "--model", "vgg_detectnet_train",
               "--weights", str(tmp_path / "snap"))
    res = json.loads(out.splitlines()[-1])
    assert res["images"] == 96
    assert set(res["ap"]) == {"0", "1", "2"}
    assert 0.0 <= res["mAP"] <= 1.0


@pytest.mark.slow
def test_voc_fixture_gate_smoke():
    """The bench-tracked VOC-fixture gate harness end to end on a tiny
    config: converts, shards, trains, scores the val split."""
    import tempfile

    from tpufcn.train.gates import voc_fixture_gate

    with tempfile.TemporaryDirectory() as work:
        res = voc_fixture_gate(steps=4, n_cached=2, batch=2,
                               work_root=work)
    assert set(res) >= {"mAP", "n_det", "val_images", "n_gt"}
    assert res["val_images"] == 96
    assert res["n_gt"] >= 30
    assert 0.0 <= res["mAP"] <= 1.0


def test_bench_gate_configs_mirror_serving_presets():
    """Each family's gate serving_kwargs must equal the registry's
    *_serving preset placement — the gate certifies the preset that
    ships, not some other fp8 placement."""
    import jax.numpy as jnp

    from tpufcn.train.gates import bench_gate_configs

    e5m2 = jnp.float8_e5m2
    for tier in ("bench", "full"):
        cfgs = bench_gate_configs(tier)
        assert cfgs["googlenet"]["serving_kwargs"] == {
            "store_dtype": e5m2, "store_blocks": True,
            "store_stem2": True}
        assert cfgs["vgg_pyramid"]["serving_kwargs"] == {
            "store_dtype": e5m2}
        assert cfgs["fcn8s"]["serving_kwargs"] == {
            "store_dtype": e5m2, "store_stages": 2}
        # fcn8s is the high-variance family: multi-seed is required
        assert len(cfgs["fcn8s"]["seeds"]) >= 3
        # both tiers keep every FAMILY gate (the bench tier adds the
        # pretrain unit that seeds vgg_pyramid; the full tier trains
        # 6k-step scratch where pretrain measured neutral-to-negative)
        fams = lambda c: {k for k, v in c.items()       # noqa: E731
                          if v.get("kind") != "pretrain"}
        assert fams(cfgs) == fams(bench_gate_configs("bench"))
    # full tier: the deep-calibration regime
    for name, c in bench_gate_configs("full").items():
        if c["kind"] == "detection":
            assert c["classes"] >= 3 and c["steps"] >= 2000
    # bench (capture) tier: driver-window-sized but still powered —
    # every detection family keeps >= 64 eval images (the n_det >= 100
    # power floor at the measured detection densities) and enough
    # steps to sit mid-curve (two-sided trend, BENCH.md round-5 table)
    for name, c in bench_gate_configs("bench").items():
        if c["kind"] == "detection":
            assert c["classes"] >= 3 and c["steps"] >= 800
            assert c.get("eval_images", 128) >= 64
