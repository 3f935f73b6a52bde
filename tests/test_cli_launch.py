"""CLI + launch-graph wiring tests."""

import json
import subprocess
import sys

import numpy as np
import cv2 as cv
import pytest

from tpufcn import recipes
from tpufcn.serve.launch import launch


def test_recipes_match_reference_solvers():
    bb = recipes.get("bounding_box")
    assert bb.optimizer == "adam" and bb.learning_rate == 1e-4
    assert bb.lr_decay_step == 10000 and bb.weight_decay == 1e-7
    assert bb.grid.im_width == 224 and bb.grid.stride == 8
    assert bb.data.batch_size == 32 and bb.grid.num_classes == 11

    fb = recipes.get("fcn_bbox")
    assert fb.optimizer == "sgd" and fb.momentum == 0.9
    assert fb.grid.im_width == 288 and fb.data.batch_size == 24

    seg = recipes.get("semantic_segmentation")
    assert seg.grid.num_classes == 12 and seg.data.batch_size == 30

    vc = recipes.get("voc")
    assert vc.grid.num_classes == 20 and vc.grid.im_width == 448


def test_launch_graph_detector(rng):
    graph = launch({
        "fcn_object_detector": {
            "type": "detector",
            "params": {"model": "googlenet_detectnet_1cls",
                       "max_candidates": 32},
            "remap": {"image": "/camera/rgb/image_rect_color"},
        },
    })
    got = []
    graph.bus.subscribe("/fcn_object_detector/rects",
                        lambda m: got.append(m.data), queue_size=4)
    frame = rng.integers(0, 256, (448, 448, 3)).astype(np.uint8)
    graph.bus.publish("/camera/rgb/image_rect_color", frame, stamp=0.0)
    graph.spin(2)
    assert graph.nodes["fcn_object_detector"].processed == 1
    assert len(got) == 1


def test_launch_graph_detector_mesh(rng):
    """Launch-spec multi-chip serving: "mesh": {"data": N, "space": M}
    builds the node's Detector over a (data, space) device mesh
    (micro_batch must divide by the data axis; flush pads to the full
    micro-batch so partial tails keep the compiled shape)."""
    graph = launch({
        "det": {
            "type": "detector",
            "params": {"model": "vgg_detectnet_train", "num_classes": 2,
                       "max_candidates": 32, "micro_batch": 2,
                       "mesh": {"data": 2, "space": 4}},
            "remap": {"image": "image"},
        },
    })
    got = []
    graph.bus.subscribe("/fcn_object_detector/rects",
                        lambda m: got.append(m.data), queue_size=8)
    for i in range(2):
        frame = rng.integers(0, 256, (224, 224, 3)).astype(np.uint8)
        graph.bus.publish("image", frame, stamp=float(i))
        graph.spin()
    assert graph.nodes["det"].processed == 2
    assert len(got) == 2


def test_launch_missing_weights_fails():
    with pytest.raises(FileNotFoundError, match="PRETRAINED"):
        launch({"d": {"type": "detector",
                      "params": {"model": "googlenet_detectnet_1cls",
                                 "pretrained_weights": "/no/such.caffemodel"}}})


def test_launch_detector_orbax_weights(tmp_path):
    """Launch-graph detector nodes load a Trainer orbax snapshot DIR as
    pretrained_weights — this framework's native training output —
    alongside the reference's .caffemodel launch convention
    (launch/fcn_object_detector.launch:8)."""
    import jax
    from tpufcn.core.config import DataConfig, GridConfig, TrainConfig
    from tpufcn.train.trainer import Trainer

    snap = str(tmp_path / "snap")
    cfg = TrainConfig(grid=GridConfig(64, 64, stride=8, num_classes=11),
                      data=DataConfig(batch_size=1),
                      model="vgg_detectnet_train", optimizer="adam",
                      learning_rate=1e-4, max_iter=1, snapshot_every=0,
                      snapshot_dir=snap)
    trainer = Trainer(cfg)
    state = trainer.init_state()
    trainer.save(state)

    man = str(tmp_path / "labels.txt")
    with open(man, "w") as f:
        f.write("0 _ background\n1 _ bottle\n")
    graph = launch({"d": {"type": "detector",
                          "params": {"model": "vgg_detectnet_train",
                                     "pretrained_weights": snap,
                                     "manifest": man,
                                     "overlay_topic": "/d/detection"}}})
    # reference ~manifest rosparam: class display names + overlay wiring
    assert graph.nodes["d"].names == ["background", "bottle"]
    assert graph.nodes["d"].overlay_topic == "/d/detection"
    got = jax.tree_util.tree_leaves(graph.nodes["d"].detector.params)
    want = jax.tree_util.tree_leaves(state.params)
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # an empty directory is still fatal (missing-model contract)
    with pytest.raises(FileNotFoundError):
        launch({"d": {"type": "detector",
                      "params": {"model": "vgg_detectnet_train",
                                 "pretrained_weights": str(tmp_path)}}})


def test_cli_detect_inprocess(tmp_path, rng, capsys):
    img = rng.integers(0, 256, (448, 448, 3)).astype(np.uint8)
    p = str(tmp_path / "frame.png")
    cv.imwrite(p, img)
    from tpufcn.cli import main
    ov = str(tmp_path / "ovl")
    main(["detect", p, "--model", "googlenet_detectnet_1cls",
          "--overlay-dir", ov])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["image"] == p and "detections" in rec
    # reference-style overlay written per input (imshow analog)
    out = cv.imread(str(tmp_path / "ovl" / "frame_det.png"))
    assert out is not None and out.shape == img.shape


def test_cli_replay(tmp_path, rng, capsys):
    """`replay` = the rosbag-play analog: frames stream through the bus
    into the detector node, one rects message per frame."""
    paths = []
    for i in range(3):
        img = rng.integers(0, 256, (448, 448, 3)).astype(np.uint8)
        p = str(tmp_path / f"f{i}.png")
        cv.imwrite(p, img)
        paths.append(p)
    from tpufcn.cli import main
    main(["replay", *paths, "--model", "googlenet_detectnet_1cls"])
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert lines[-1] == {"frames_processed": 3}
    assert len(lines) == 4 and all("detections" in l for l in lines[:-1])


def test_cli_launch_graph(tmp_path, rng, capsys):
    """`launch` = the roslaunch analog: a JSON node-graph spec (the
    launch-file equivalent, examples/*.launch.json) built and driven
    from the CLI."""
    spec = {"fcn_object_detector": {
        "type": "detector",
        "params": {"model": "googlenet_detectnet_1cls"},
        "remap": {"image": "image"}}}
    gpath = str(tmp_path / "graph.launch.json")
    with open(gpath, "w") as f:
        json.dump(spec, f)
    paths = []
    for i in range(2):
        img = rng.integers(0, 256, (448, 448, 3)).astype(np.uint8)
        p = str(tmp_path / f"f{i}.png")
        cv.imwrite(p, img)
        paths.append(p)
    from tpufcn.cli import main
    main(["launch", gpath, "--frames", *paths])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["frames_published"] == 2
    assert rec["nodes"] == ["fcn_object_detector"]
    assert rec["processed"]["fcn_object_detector"] == 2


def test_example_launch_specs_are_valid():
    """The shipped examples/*.launch.json mirror the reference's two
    launch files; every node type must resolve and the point-map remap
    must carry the reference topic names (fcn_point_map.launch:3-19)."""
    import glob
    import os
    from tpufcn.serve.launch import _NODE_TYPES
    specs = glob.glob(os.path.join(
        os.path.dirname(__file__), "..", "examples", "*.launch.json"))
    assert len(specs) >= 2
    seen = {}
    for path in specs:
        with open(path) as f:
            graph = json.load(f)
        for name, node in graph.items():
            assert node["type"] in _NODE_TYPES, (path, name)
            seen[name] = node
    assert (seen["fcn_point_map"]["remap"]["cloud"]
            == "/camera/depth_registered/points")


def test_cli_refine_and_rank(tmp_path, rng, capsys):
    """`refine`/`rank` = the pseudo-label tool scripts
    (boundary_refinement.py offline walk, rank_object_models.py
    train2.txt writer) as CLI subcommands over a detection manifest."""
    lines = []
    for i in range(4):
        img = rng.integers(0, 60, (120, 160, 3)).astype(np.uint8)
        gy, gx = np.mgrid[0:40, 0:30]
        patch = np.stack([30 + gx * 4, 200 - gy * 3,
                          120 + ((gx + gy) % 7) * 10],
                         axis=-1).clip(0, 255).astype(np.uint8)
        img[30 + 2 * i:70 + 2 * i, 40 + 4 * i:70 + 4 * i] = patch
        p = str(tmp_path / f"f{i}.png")
        cv.imwrite(p, img)
        lines.append(f"{p} 38 28 34 44 1")
    man = str(tmp_path / "train.txt")
    with open(man, "w") as f:
        f.write("\n".join(lines) + "\n")

    from tpufcn.cli import main
    main(["refine", "--manifest", man, "--input-size", "64"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["refined"] == 4
    # default out path: next to the manifest (reference convention)
    assert rec["out"] == str(tmp_path / "train_refined.txt")
    from tpufcn.data.manifest import read_detection_manifest
    assert len(read_detection_manifest(rec["out"])) == 4

    main(["rank", "--manifest", man, "--input-size", "64",
          "--metric", "chi_square"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["out"] == str(tmp_path / "train2.txt")
    assert 1 <= rec["kept"] <= rec["total"] == 4
    assert len(read_detection_manifest(rec["out"])) == rec["kept"]


def test_cli_records_and_voc(tmp_path, rng):
    img = rng.integers(0, 255, (40, 60, 3)).astype(np.uint8)
    ip = str(tmp_path / "a.png")
    cv.imwrite(ip, img)
    man = str(tmp_path / "train.txt")
    with open(man, "w") as f:
        f.write(f"{ip} 5 5 20 20 1\n")
    from tpufcn.cli import main
    main(["records", "--manifest", man, "--out", str(tmp_path / "rec/ds")])
    from tpufcn.data import RecordReader
    assert len(RecordReader(str(tmp_path / "rec/ds"))) == 1

    # --inspect: the reference writer's read_lmdb debug view
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(["records", "--out", str(tmp_path / "rec/ds"), "--inspect"])
    out = [json.loads(l) for l in buf.getvalue().strip().splitlines()]
    assert out[0]["image"] == [40, 60, 3]
    assert out[0]["rects"] == [[5, 5, 20, 20]]
    assert out[-1] == {"records": 1, "prefix": str(tmp_path / "rec/ds")}
    with pytest.raises(SystemExit):
        main(["records", "--out", str(tmp_path / "rec/ds")])  # no manifest


def test_cli_train_records_eval_weights(tmp_path, rng, capsys):
    """Offline workflow: records -> train --records -> eval --weights
    (the reference's create_training_lmdb.py -> caffe train -> score
    loop, SURVEY.md C8/C21)."""
    import dataclasses
    from tpufcn import recipes
    from tpufcn.cli import main
    from tpufcn.core.config import DataConfig, GridConfig, TrainConfig

    man = str(tmp_path / "train.txt")
    with open(man, "w") as f:
        for i in range(4):
            img = rng.integers(0, 60, (64, 64, 3)).astype(np.uint8)
            x, y = 10 + 4 * i, 12
            img[y:y + 32, x:x + 24] = (220, 40, 90)
            ip = str(tmp_path / f"i{i}.png")
            cv.imwrite(ip, img)
            f.write(f"{ip} {x} {y} 24 32 1\n")
    prefix = str(tmp_path / "rec/ds")
    main(["records", "--manifest", man, "--out", prefix])

    def _tiny(**o):
        cfg = TrainConfig(
            grid=GridConfig(64, 64, stride=8, num_classes=11),
            data=DataConfig(batch_size=2), model="vgg_detectnet_train",
            optimizer="adam", learning_rate=1e-4, max_iter=2,
            snapshot_every=0, log_every=1)
        return dataclasses.replace(cfg, **o)

    recipes.RECIPES["_tiny_cli_test"] = _tiny
    snap = str(tmp_path / "snap")
    try:
        metrics = str(tmp_path / "metrics.jsonl")
        main(["train", "--recipe", "_tiny_cli_test", "--records", prefix,
              "--snapshot-dir", snap, "--cache", "2",
              "--metrics-out", metrics])
        assert "trained to step 2" in capsys.readouterr().out
        hist = [json.loads(l) for l in open(metrics)]
        assert hist and all("loss_total" in h and "step" in h
                            for h in hist)
        main(["eval", "--manifest", man, "--format", "detection",
              "--model", "vgg_detectnet_train", "--weights", snap])
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["images"] == 4 and 0.0 <= rec["mAP"] <= 1.0
    finally:
        del recipes.RECIPES["_tiny_cli_test"]


def test_cli_train_weights_finetune_init(tmp_path, rng, capsys):
    """train --weights seeds step-0 params for fine-tuning (the
    reference's `caffe train --weights VGG_ILSVRC_16_layers.caffemodel`,
    train/train.sh:26).  lr=0 makes the seeding observable: the trained
    snapshot must carry exactly the seeded params."""
    import dataclasses
    import jax
    from tpufcn import recipes
    from tpufcn.cli import main
    from tpufcn.core.config import DataConfig, GridConfig, TrainConfig
    from tpufcn.train.trainer import Trainer, load_snapshot_params

    man = str(tmp_path / "train.txt")
    with open(man, "w") as f:
        for i in range(2):
            img = rng.integers(0, 60, (64, 64, 3)).astype(np.uint8)
            img[12:44, 10:34] = (220, 40, 90)
            ip = str(tmp_path / f"i{i}.png")
            cv.imwrite(ip, img)
            f.write(f"{ip} 10 12 24 32 1\n")
    prefix = str(tmp_path / "rec/ds")
    main(["records", "--manifest", man, "--out", prefix])

    def _tiny(**o):
        cfg = TrainConfig(
            grid=GridConfig(64, 64, stride=8, num_classes=11),
            data=DataConfig(batch_size=2), model="vgg_detectnet_train",
            optimizer="adam", learning_rate=0.0, max_iter=1,
            snapshot_every=0, log_every=1)
        return dataclasses.replace(cfg, **o)

    # seed snapshot: a distinctively-initialized state saved by a Trainer
    seed_dir = str(tmp_path / "seed")
    tr = Trainer(_tiny(snapshot_dir=seed_dir))
    seed_state = tr.init_state()
    seed_state = seed_state.replace(params=jax.tree_util.tree_map(
        lambda p: p + 0.125, seed_state.params))
    tr.save(seed_state)

    recipes.RECIPES["_tiny_w_cli_test"] = _tiny
    snap = str(tmp_path / "snap")
    try:
        main(["train", "--recipe", "_tiny_w_cli_test", "--records",
              prefix, "--snapshot-dir", snap, "--weights", seed_dir,
              "--max-iter", "1"])
        assert "trained to step 1" in capsys.readouterr().out
    finally:
        del recipes.RECIPES["_tiny_w_cli_test"]

    got = jax.tree_util.tree_leaves(load_snapshot_params(snap))
    want = jax.tree_util.tree_leaves(seed_state.params)
    assert len(got) == len(want)
    for a, b in zip(got, want):   # lr=0 -> params == the seeded init
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cli_train_iter_size(tmp_path, rng, capsys):
    """--iter-size wires Caffe gradient accumulation end-to-end through
    the CLI (reference solver knob, train/bounding_box/solver.prototxt:5):
    every solver iteration consumes iter_size pipeline micro-batches."""
    import dataclasses
    from tpufcn import recipes
    from tpufcn.cli import main
    from tpufcn.core.config import DataConfig, GridConfig, TrainConfig

    man = str(tmp_path / "train.txt")
    with open(man, "w") as f:
        for i in range(4):
            img = rng.integers(0, 60, (64, 64, 3)).astype(np.uint8)
            img[12:44, 10:34] = (220, 40, 90)
            ip = str(tmp_path / f"i{i}.png")
            cv.imwrite(ip, img)
            f.write(f"{ip} 10 12 24 32 1\n")
    prefix = str(tmp_path / "rec/ds")
    main(["records", "--manifest", man, "--out", prefix])

    def _tiny(**o):
        cfg = TrainConfig(
            grid=GridConfig(64, 64, stride=8, num_classes=11),
            data=DataConfig(batch_size=2), model="vgg_detectnet_train",
            optimizer="adam", learning_rate=1e-4, max_iter=2,
            snapshot_every=0, log_every=1)
        return dataclasses.replace(cfg, **o)

    recipes.RECIPES["_tiny_iter_cli_test"] = _tiny
    snap = str(tmp_path / "snap")
    try:
        main(["train", "--recipe", "_tiny_iter_cli_test", "--records",
              prefix, "--snapshot-dir", snap, "--iter-size", "2",
              "--max-iter", "1"])
        out = capsys.readouterr().out
        assert "trained to step 1" in out
    finally:
        del recipes.RECIPES["_tiny_iter_cli_test"]


def test_cli_eval_seg_mean_iou(tmp_path, rng, capsys):
    """eval --format seg: mask-manifest -> FCN forward -> mean IoU
    (the seg-family analog of the detection mAP path)."""
    import jax.numpy as jnp
    from tpufcn.cli import main
    from tpufcn.core.config import GridConfig
    from tpufcn.models import registry

    man = str(tmp_path / "train.txt")
    with open(man, "w") as f:
        for i in range(2):
            img = rng.integers(0, 120, (48, 48, 3)).astype(np.uint8)
            msk = np.zeros((48, 48), np.uint8)
            msk[8:30, 10:34] = 255
            img[8:30, 10:34] = (200, 60, 30)
            ip, mp = str(tmp_path / f"i{i}.png"), str(tmp_path / f"m{i}.png")
            cv.imwrite(ip, img)
            cv.imwrite(mp, msk)
            f.write(f"{ip} {mp} 1 10 8 24 22\n")
            f.write("ignored\n")

    registry.register("_tiny_seg_cli_test", registry.ModelSpec(
        factory=lambda dtype=jnp.bfloat16, **kw: registry.FCN32sSeg(
            num_classes=kw.pop("num_classes", 3), dtype=dtype, **kw),
        grid=GridConfig(48, 48, stride=16, num_classes=3),
        preprocessing="demean", background_channel=0, heads=("seg",),
        reference="train/semantic_segmentation/train_val.prototxt"))
    try:
        main(["eval", "--manifest", man, "--format", "seg",
              "--model", "_tiny_seg_cli_test"])
    finally:
        del registry._REGISTRY["_tiny_seg_cli_test"]
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["images"] == 2
    assert 0.0 <= rec["mean_iou"] <= 1.0
    assert 0.0 <= rec["pixel_accuracy"] <= 1.0
    assert "1" in rec["iou"]   # the GT object class is scored


def test_cli_train_seg_manifest_eval(tmp_path, rng, capsys):
    """Online seg workflow: mask manifest -> train (seg-only family,
    with_seg derived from the model's heads) -> snapshot -> eval
    --format seg --weights (the semantic_segmentation recipe's loop).
    Regression: the seg-only loss path + heads-driven with_seg."""
    import dataclasses
    import jax.numpy as jnp
    from tpufcn import recipes
    from tpufcn.cli import main
    from tpufcn.core.config import DataConfig, GridConfig, TrainConfig
    from tpufcn.models import registry

    man = str(tmp_path / "train.txt")
    with open(man, "w") as f:
        for i in range(2):
            img = rng.integers(0, 100, (64, 64, 3)).astype(np.uint8)
            msk = np.zeros((64, 64), np.uint8)
            msk[10:40, 12:44] = 255
            img[10:40, 12:44] = (210, 50, 60)
            ip, mp = str(tmp_path / f"i{i}.png"), str(tmp_path / f"m{i}.png")
            cv.imwrite(ip, img)
            cv.imwrite(mp, msk)
            f.write(f"{ip} {mp} 1 12 10 32 30\n")
            f.write("ignored\n")

    grid = GridConfig(64, 64, stride=16, num_classes=2)
    registry.register("_tiny_seg_train_test", registry.ModelSpec(
        factory=lambda dtype=jnp.bfloat16, **kw: registry.FCN32sSeg(
            num_classes=kw.pop("num_classes", 2), dtype=dtype, **kw),
        grid=grid, preprocessing="demean", background_channel=0,
        heads=("seg",),
        reference="train/semantic_segmentation/train_val.prototxt"))
    recipes.RECIPES["_tiny_seg_recipe_test"] = lambda **o: \
        dataclasses.replace(TrainConfig(
            grid=grid, data=DataConfig(batch_size=2),
            model="_tiny_seg_train_test", optimizer="adam",
            learning_rate=1e-4, max_iter=2, snapshot_every=0,
            log_every=1), **o)
    snap = str(tmp_path / "snap")
    try:
        main(["train", "--recipe", "_tiny_seg_recipe_test",
              "--manifest", man, "--snapshot-dir", snap])
        assert "trained to step 2" in capsys.readouterr().out
        main(["eval", "--manifest", man, "--format", "seg",
              "--model", "_tiny_seg_train_test", "--weights", snap])
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["images"] == 2
        assert 0.0 <= rec["mean_iou"] <= 1.0
    finally:
        del recipes.RECIPES["_tiny_seg_recipe_test"]
        del registry._REGISTRY["_tiny_seg_train_test"]


def test_cli_train_joint_bbox_seg_manifest(tmp_path, rng, capsys):
    """The fcn_bbox recipe's CLI loop: a joint bbox+coverage+seg family
    (FCN8sBBox, reference train/fcn_bbox/train_val.prototxt) trained from
    an online mask manifest — the pipeline must emit BOTH grid tops and
    seg labels, and the loss must fire all three heads."""
    import dataclasses
    import jax.numpy as jnp
    from tpufcn import recipes
    from tpufcn.cli import main
    from tpufcn.core.config import DataConfig, GridConfig, TrainConfig
    from tpufcn.models import registry

    man = str(tmp_path / "train.txt")
    with open(man, "w") as f:
        for i in range(2):
            img = rng.integers(0, 100, (64, 64, 3)).astype(np.uint8)
            msk = np.zeros((64, 64), np.uint8)
            msk[10:40, 12:44] = 255
            img[10:40, 12:44] = (210, 50, 60)
            ip, mp = str(tmp_path / f"j{i}.png"), str(tmp_path / f"n{i}.png")
            cv.imwrite(ip, img)
            cv.imwrite(mp, msk)
            f.write(f"{ip} {mp} 1 12 10 32 30\n")
            f.write("ignored\n")

    grid = GridConfig(64, 64, stride=8, num_classes=3)
    registry.register("_tiny_joint_cli_test", registry.ModelSpec(
        factory=lambda dtype=jnp.bfloat16, **kw: registry.FCN8sBBox(
            num_classes=kw.pop("num_classes", 3), dtype=dtype, **kw),
        grid=grid, preprocessing="demean", background_channel=0,
        heads=("coverage", "bboxes", "seg"),
        reference="train/fcn_bbox/train_val.prototxt"))
    recipes.RECIPES["_tiny_joint_recipe_test"] = lambda **o: \
        dataclasses.replace(TrainConfig(
            grid=grid, data=DataConfig(batch_size=2),
            model="_tiny_joint_cli_test", optimizer="sgd",
            learning_rate=1e-8, momentum=0.9, max_iter=1,
            snapshot_every=0, log_every=1), **o)
    try:
        main(["train", "--recipe", "_tiny_joint_recipe_test",
              "--manifest", man,
              "--snapshot-dir", str(tmp_path / "snap")])
        assert "trained to step 1" in capsys.readouterr().out
    finally:
        del recipes.RECIPES["_tiny_joint_recipe_test"]
        del registry._REGISTRY["_tiny_joint_cli_test"]


def test_cli_train_seg_only_rejects_records(tmp_path):
    # records store box labels, not masks: a seg-ONLY model has nothing
    # to train from them
    from tpufcn.cli import main
    with pytest.raises(SystemExit, match="segmentation-only"):
        main(["train", "--recipe", "semantic_segmentation", "--records",
              str(tmp_path / "ds")])
    with pytest.raises(SystemExit, match="manifest or --records"):
        main(["train", "--recipe", "bounding_box"])


def test_cli_train_joint_model_records_trains_detection_heads(
        tmp_path, rng, capsys):
    """A joint bbox+seg family (fcn8s_bbox) over --records trains its
    DETECTION heads from the box labels (seg head unsupervised) instead
    of rejecting — records simply carry no masks."""
    import dataclasses
    import jax.numpy as jnp
    from tpufcn import recipes
    from tpufcn.cli import main
    from tpufcn.core.config import DataConfig, GridConfig, TrainConfig
    from tpufcn.models import registry

    man = str(tmp_path / "train.txt")
    with open(man, "w") as f:
        for i in range(2):
            img = rng.integers(0, 60, (64, 64, 3)).astype(np.uint8)
            img[12:44, 10:34] = (220, 40, 90)
            ip = str(tmp_path / f"i{i}.png")
            cv.imwrite(ip, img)
            f.write(f"{ip} 10 12 24 32 1\n")
    prefix = str(tmp_path / "rec/ds")
    main(["records", "--manifest", man, "--out", prefix])

    grid = GridConfig(64, 64, stride=8, num_classes=3)
    registry.register("_tiny_joint_rec_test", registry.ModelSpec(
        factory=lambda dtype=jnp.bfloat16, **kw: registry.FCN8sBBox(
            num_classes=kw.pop("num_classes", 3), dtype=dtype, **kw),
        grid=grid, preprocessing="demean", background_channel=0,
        heads=("coverage", "bboxes", "seg"),
        reference="train/fcn_bbox/train_val.prototxt"))
    recipes.RECIPES["_tiny_joint_rec_recipe"] = lambda **o: \
        dataclasses.replace(TrainConfig(
            grid=grid, data=DataConfig(batch_size=2),
            model="_tiny_joint_rec_test", optimizer="sgd",
            learning_rate=1e-8, momentum=0.9, max_iter=1,
            snapshot_every=0, log_every=1), **o)
    try:
        main(["train", "--recipe", "_tiny_joint_rec_recipe",
              "--records", prefix,
              "--snapshot-dir", str(tmp_path / "snap")])
        out, err = capsys.readouterr()
        assert "trained to step 1" in out
        assert "seg head unsupervised" in err
    finally:
        del recipes.RECIPES["_tiny_joint_rec_recipe"]
        del registry._REGISTRY["_tiny_joint_rec_test"]


def test_launch_tool_nodes(tmp_path, rng):
    """The pseudo-label tool nodes are launchable like the reference's
    launch files wire its nodes: a boundary-refinement node on the
    graph tracks a rect across two synced frames."""
    from tpufcn.data.manifest import read_detection_manifest
    from tpufcn.serve.launch import launch

    graph = launch({
        "boundary_refinement": {"type": "boundary_refinement"},
        "writer": {"type": "capture",
                   "params": {"out_dir": str(tmp_path / "cap")}},
    })
    got = []
    graph.bus.subscribe("/boundary_refinement/rect", got.append)

    def scene(ox, oy):
        img = rng.integers(0, 60, (120, 160, 3)).astype(np.uint8)
        gy, gx = np.mgrid[0:40, 0:30]
        img[oy:oy + 40, ox:ox + 30] = np.stack(
            [30 + gx * 4, 200 - gy * 3, (gx + gy) % 7 * 20],
            axis=-1).clip(0, 255).astype(np.uint8)
        return img

    for t, (ox, oy) in enumerate([(40, 30), (46, 34)]):
        graph.bus.publish("/camera/rgb/image_rect_color", scene(ox, oy),
                          stamp=float(t))
        graph.bus.publish("/object_rect", [40, 30, 30, 40], stamp=float(t))
        graph.spin()
    graph.spin()

    assert len(got) == 1
    x, y, w, h = got[0].data
    assert abs(x - 46) <= 3 and abs(y - 34) <= 3
    # the capture node shared the graph: two frames written
    assert len(read_detection_manifest(
        str(tmp_path / "cap" / "train.txt"))) == 2


def test_cli_train_inspect_data(tmp_path, rng, capsys):
    """--inspect-data: data dry-run writes the first batch as
    rect-overlay PNGs + seg masks and exits without training (the
    reference's DataArgumentationTestLayer debug view, GUI-less)."""
    from tpufcn.cli import main

    man = str(tmp_path / "train.txt")
    with open(man, "w") as f:
        for i in range(2):
            img = rng.integers(0, 100, (64, 64, 3)).astype(np.uint8)
            msk = np.zeros((64, 64), np.uint8)
            msk[10:40, 12:44] = 255
            img[10:40, 12:44] = (210, 50, 60)
            ip, mp = str(tmp_path / f"i{i}.png"), str(tmp_path / f"m{i}.png")
            cv.imwrite(ip, img)
            cv.imwrite(mp, msk)
            f.write(f"{ip} {mp} 1 12 10 32 30\n")
            f.write("ignored\n")
    out_dir = tmp_path / "inspect"
    main(["train", "--recipe", "bounding_box", "--manifest", man,
          "--batch-size", "2", "--inspect-data", str(out_dir)])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["images"] == 2 and rec["with_seg"]
    pngs = sorted(p.name for p in out_dir.iterdir())
    assert pngs == ["b0_00.png", "b0_00_seg.png",
                    "b0_01.png", "b0_01_seg.png"]
    seg = cv.imread(str(out_dir / "b0_00_seg.png"), cv.IMREAD_GRAYSCALE)
    assert seg.max() == 255 and seg.min() == 0   # object + background
    # no snapshots were written (dry-run exits before training)
    assert not (tmp_path / "snapshots").exists()


def test_cli_replay_video(tmp_path, rng, capsys):
    """`replay --video` = camera-recording input: the offline analog of
    the reference's live camera subscription
    (fcn_object_detector.py:330-331) — decoded frames stream through
    the bus exactly like image files."""
    path = str(tmp_path / "cam.avi")
    w = cv.VideoWriter(path, cv.VideoWriter_fourcc(*"MJPG"), 5.0,
                       (448, 448))
    assert w.isOpened()
    for _ in range(4):
        w.write(rng.integers(0, 256, (448, 448, 3)).astype(np.uint8))
    w.release()
    from tpufcn.cli import main
    main(["replay", "--video", path, "--video-stride", "2",
          "--model", "googlenet_detectnet_1cls"])
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert lines[-1] == {"frames_processed": 2}   # 4 frames, stride 2
    with pytest.raises(SystemExit):               # images XOR --video
        main(["replay", str(tmp_path / "f.png"), "--video", path])


def test_cli_profile(tmp_path, rng, capsys):
    """`profile` aggregates per-HLO-op device time for a model's jitted
    pipeline (SURVEY.md §5 tracing; utils/profiling is the library).
    Uses a tiny registered stub so the CPU compile stays cheap."""
    import flax.linen as nn
    import jax.numpy as jnp
    from tpufcn.core.config import GridConfig
    from tpufcn.models import registry

    grid = GridConfig(64, 64, stride=16, num_classes=1)

    class _Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, *, train=False):
            y = nn.Conv(8, (3, 3), padding="SAME")(x.astype(jnp.float32))
            g = nn.avg_pool(y, (16, 16), (16, 16))
            return {"coverage": nn.sigmoid(g[..., :1]),
                    "bboxes": jnp.tile(g[..., :1], (1, 1, 1, 4))}

    registry.register("_profile_test", registry.ModelSpec(
        factory=lambda dtype=jnp.float32, **kw: _Tiny(),
        grid=grid, preprocessing="demean", background_channel=None,
        heads=("coverage", "bboxes"),
        reference="(test stub)"))
    try:
        from tpufcn.cli import main
        main(["profile", "--model", "_profile_test", "--batch", "1",
              "--iters", "2", "--top", "5", "--max-candidates", "8",
              "--logdir", str(tmp_path / "trace"), "--json"])
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["model"] == "_profile_test" and rec["mode"] == "serve"
        assert rec["total_device_us"] > 0
        assert len(rec["ops"]) >= 1 and all("dur_us" in o
                                            for o in rec["ops"])
        # --train profiles the fwd+bwd+optimizer step instead
        main(["profile", "--model", "_profile_test", "--batch", "1",
              "--iters", "2", "--top", "5", "--train",
              "--logdir", str(tmp_path / "trace_train"), "--json"])
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["mode"] == "train" and rec["total_device_us"] > 0
        assert len(rec["ops"]) >= 1
    finally:
        del registry._REGISTRY["_profile_test"]


def test_cli_gates_rejects_unknown_family():
    """`cli gates` validates family names before any training starts."""
    from tpufcn.cli import main
    with pytest.raises(SystemExit, match="unknown families"):
        main(["gates", "--family", "nonesuch"])
