"""Command-line interface — the ``caffe train`` / shell-script analog.

Subcommands cover the reference's operational surface (SURVEY.md C21/C22):
  train     recipe-based training (train/train.sh equivalent)
  detect    run the detector over image files
  convert   .caffemodel -> checkpoint
  records   build record shards from a manifest (LMDB writer analog)
  voc       Pascal VOC -> manifests (scripts/voc analog)
  replay    stream frame files through the detector node graph
            (roslaunch + `rosbag play` analog)
  launch    build a node graph from a JSON launch spec
            (roslaunch <file>.launch analog)
  export    AOT StableHLO artifact of the serving pipeline
  refine    offline boundary-refinement walk over a manifest
            (boundary_refinement.py analog)
  rank      proposal ranking / outlier rejection -> train2.txt
            (rank_object_models.py analog)
  bench     the headline throughput benchmark
  profile   per-HLO-op device-time attribution of the serving pipeline
  pointmap  build the C++ point-map library

Usage: python -m tpufcn.cli <subcommand> [args]
"""

from __future__ import annotations

import argparse
import json
import sys


def _cmd_train(args):
    import jax.numpy as jnp
    from tpufcn import recipes
    from tpufcn.core.config import DataConfig
    import dataclasses
    from tpufcn.data import CompositeTrainPipeline, read_mask_manifest
    from tpufcn.train.trainer import Trainer

    cfg = recipes.get(args.recipe)
    if args.max_iter:
        cfg = dataclasses.replace(cfg, max_iter=args.max_iter)
    if args.batch_size:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data,
                                          batch_size=args.batch_size))
    if args.snapshot_dir:
        cfg = dataclasses.replace(cfg, snapshot_dir=args.snapshot_dir)
    if args.iter_size and args.iter_size != 1:
        cfg = dataclasses.replace(cfg, iter_size=args.iter_size)
    if args.warmup:
        cfg = dataclasses.replace(cfg, warmup_steps=args.warmup)

    if not args.records and not args.manifest:
        raise SystemExit("one of --manifest or --records is required")
    # seg supervision follows the MODEL's head contract, not the recipe
    # name — custom recipes over seg families get the seg loss too
    from tpufcn.models import get_spec
    with_seg = "seg" in get_spec(cfg.model).heads
    if args.records:
        # offline path: pre-built record shards (the reference's LMDB
        # DataLayer analog, create_training_lmdb.py) instead of online
        # compositing.  Records store box labels, not segmentation
        # masks, so a seg-ONLY model cannot train from them; a joint
        # bbox+seg family (fcn8s_bbox) trains its detection heads only.
        heads = get_spec(cfg.model).heads
        if heads == ("seg",):
            raise SystemExit(
                "--records cannot train a segmentation-only model "
                "(records store box labels, not masks); use --manifest")
        if with_seg:
            print("note: records store box labels only — training the "
                  "detection heads, seg head unsupervised", file=sys.stderr)
            with_seg = False
        from tpufcn.data.pipeline import RecordTrainPipeline
        pipe = RecordTrainPipeline(args.records, cfg.grid,
                                   batch_size=cfg.data.batch_size)
    else:
        # per-run label-manifest snapshot (the reference layer writes
        # snapshots/labels/labels_<ts>.txt each run,
        # data_argumentation_layer.py:182-188); `eval --labels` replays
        # it so eval class ids can't drift from the training mapping
        from tpufcn.data.manifest import snapshot_label_path
        import os as _os
        samples = read_mask_manifest(
            args.manifest,
            snapshot_label_manifest=snapshot_label_path(
                _os.path.join(cfg.snapshot_dir, "labels")))
        if args.device_data and args.workers:
            raise SystemExit(
                "--device-data composes on the accelerator; --workers "
                "(host worker pool) does not apply — pass one or the "
                "other")
        if args.device_data:
            from tpufcn.core.mesh import make_mesh
            from tpufcn.data import DeviceCompositePipeline
            pipe = DeviceCompositePipeline(
                samples, cfg.grid, cfg.data,
                backgrounds=args.backgrounds,
                # on a mesh, generate batches already sharded for the step
                mesh=(make_mesh(cfg.mesh)
                      if cfg.mesh.num_devices > 1 else None))
        elif args.workers > 0:
            from tpufcn.data.parallel import ParallelCompositePipeline
            pipe = ParallelCompositePipeline(samples, cfg.grid, cfg.data,
                                             backgrounds=args.backgrounds,
                                             workers=args.workers)
        else:
            pipe = CompositeTrainPipeline(samples, cfg.grid, cfg.data,
                                          backgrounds=args.backgrounds)
    if args.inspect_data:
        # data dry-run: dump the first batch as rect-overlay PNGs (+ seg
        # masks) and exit — the reference eyeballed its augmentation with
        # a debug imshow layer (DataArgumentationTestLayer,
        # data_argumentation_layer.py:376-396, and the engines' debug
        # flags); this is the GUI-less analog
        import os

        import cv2 as cv
        import numpy as np
        from tpufcn.serve.viz import draw_detections
        os.makedirs(args.inspect_data, exist_ok=True)
        batch = next(iter(pipe))
        imgs = np.asarray(batch["image"])
        rects = np.asarray(batch["rects"])
        labels = np.asarray(batch["labels"])
        valid = np.asarray(batch["valid"])
        seg = np.asarray(batch["seg"]) if "seg" in batch else None
        for i in range(imgs.shape[0]):
            dets = [([r[0], r[1], r[0] + r[2], r[1] + r[3]], int(l), 1.0)
                    for r, l, v in zip(rects[i], labels[i], valid[i]) if v]
            cv.imwrite(os.path.join(args.inspect_data, f"b0_{i:02d}.png"),
                       draw_detections(imgs[i], dets))
            if seg is not None:
                hi = max(int(seg[i].max()), 1)
                cv.imwrite(
                    os.path.join(args.inspect_data, f"b0_{i:02d}_seg.png"),
                    (seg[i].astype(np.float32) * (255.0 / hi))
                    .astype(np.uint8))
        print(json.dumps({"inspect_data": args.inspect_data,
                          "images": int(imgs.shape[0]),
                          "with_seg": seg is not None}))
        return
    # in-training validation (the Caffe TEST phase, reference
    # train/bounding_box/solver.prototxt:6-7 test_iter/test_interval):
    # held-out scoring at --eval-every cadence + best-checkpoint
    # retention in <snapshot-dir>/best
    validator = None
    if args.eval_every:
        if not (args.val_records or args.val_manifest):
            raise SystemExit(
                "--eval-every requires --val-records or --val-manifest")
        cfg = dataclasses.replace(cfg, eval_every=args.eval_every)
        from tpufcn.train import validate as V
        hw = (cfg.grid.im_height, cfg.grid.im_width)
        if get_spec(cfg.model).heads == ("seg",):
            if not args.val_manifest:
                raise SystemExit("seg-only families validate from "
                                 "--val-manifest (mask manifest)")
            vi, vm = V.seg_val_set_from_manifest(
                args.val_manifest, hw, limit=args.val_limit)
            validator = V.seg_validator(cfg.model, vi, vm)
        else:
            if args.val_records:
                vi, vg = V.val_set_from_records(
                    args.val_records, hw, limit=args.val_limit)
            else:
                vi, vg = V.val_set_from_manifest(
                    args.val_manifest, hw, limit=args.val_limit)
            validator = V.detection_validator(
                cfg.model, vi, vg, chunk=min(32, len(vi)))
        print(f"validation: {len(vi)} held-out samples every "
              f"{args.eval_every} steps", file=sys.stderr)
    if args.cache > 0:
        # device-resident epoch cache: compose/read N batches once,
        # upload once, train epochs from HBM (see DeviceBatchCache)
        from tpufcn.data import DeviceBatchCache
        trainer = Trainer(cfg, with_seg=with_seg,
                          steps_per_dispatch=args.cache,
                          validator=validator)
        src = iter(DeviceBatchCache(trainer.put, iter(pipe), args.cache))
    else:
        trainer = Trainer(cfg, with_seg=with_seg, validator=validator)
        src = iter(pipe)
    state = None
    if args.weights:
        # fine-tune init (the reference's `caffe train --weights
        # VGG_ILSVRC_16_layers.caffemodel`, train/train.sh:26): seed
        # step-0 params from a .caffemodel (lenient, by-name — layers
        # absent from the file keep their random init, Caffe's copy-by-
        # layer-name semantics) or a Trainer orbax snapshot dir.  A
        # resumable snapshot in cfg.snapshot_dir still wins (solver
        # resume beats weight seeding, as in Caffe --snapshot).
        from tpufcn.convert import resolve_weights
        state = trainer.init_state()
        state = state.replace(params=resolve_weights(
            args.weights, lambda: state.params))
    state = trainer.fit(src, state=state)
    if args.metrics_out:
        # structured per-display-step metrics (the tee'd-solver-log
        # analog, reference train/train.sh:22-28 — but machine-readable)
        with open(args.metrics_out, "w") as f:
            for h in trainer.logger.history:
                f.write(json.dumps(h) + "\n")
        print(f"wrote {len(trainer.logger.history)} metric records to "
              f"{args.metrics_out}", file=sys.stderr)
    if trainer.best is not None:
        print(f"best checkpoint: step {trainer.best['step']} "
              f"({trainer.best['metric']}={trainer.best['score']:.4f}) "
              f"in {cfg.snapshot_dir}/best")
    print(f"trained to step {int(state.step)}; snapshots in "
          f"{cfg.snapshot_dir}")


def _cmd_detect(args):
    import cv2 as cv
    import numpy as np
    from tpufcn.serve.detector import Detector
    from tpufcn.serve.launch import _make_detector  # weight loading path
    from tpufcn.serve.bus import TopicBus

    bus = TopicBus()
    node = _make_detector(bus, {
        "model": args.model,
        "detection_threshold": args.threshold,
        "min_boxes": args.min_boxes,
        "nms_eps": args.nms_eps,
        "pretrained_weights": args.weights,
        "manifest": args.manifest,
    }, {})
    names = node.names or []
    overlay_names: set = set()
    for path in args.images:
        img = cv.imread(path)
        if img is None:
            print(f"{path}: unreadable", file=sys.stderr)
            continue
        res = node.detector(img[None])
        dets = res.to_lists()[0]
        if args.overlay_dir:
            # the reference's imshow overlay (fcn_object_detector.py:
            # 141-172), written to disk instead of a GUI window
            import os
            from tpufcn.serve.viz import draw_detections
            os.makedirs(args.overlay_dir, exist_ok=True)
            # inputs from different directories can share a basename —
            # disambiguate instead of silently overwriting the first
            stem = os.path.splitext(os.path.basename(path))[0]
            n, base = 1, stem
            while stem in overlay_names:
                stem = f"{base}_{n}"
                n += 1
            overlay_names.add(stem)
            out = os.path.join(args.overlay_dir, stem + "_det.png")
            cv.imwrite(out, draw_detections(img, dets, names or None))
        print(json.dumps({"image": path, "detections": [
            {"box": [int(v) for v in box], "label": label,
             "name": (names[label] if label < len(names)
                      else f"object_{label}"),
             "confidence": conf}
            for box, label, conf in dets]}))


def _cmd_convert(args):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpufcn.convert import convert_caffemodel
    from tpufcn.models import build, get_spec

    spec = get_spec(args.model)
    model = build(args.model, dtype=jnp.float32)
    g = spec.grid
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, g.im_height, g.im_width, 3)))
    out = convert_caffemodel(params, args.caffemodel,
                             strict=not args.lenient)
    flat = jax.tree_util.tree_leaves_with_path(out)
    np.savez(args.out, **{
        "/".join(str(k.key) for k in path): np.asarray(v)
        for path, v in flat})
    print(f"wrote {args.out} ({len(flat)} arrays)")


def _cmd_records(args):
    from tpufcn.data import (
        create_detection_records, read_detection_manifest,
        read_voc_manifest)
    if args.inspect:
        # the reference writer's read_lmdb debug inspector
        # (create_training_lmdb.py:492-509): per-record label + shape
        from tpufcn.data import RecordReader
        r = RecordReader(args.out)
        for i in range(min(args.limit, len(r))):
            rec = r.read(i)
            print(json.dumps({
                "index": i,
                "image": list(rec["image"].shape),
                "rects": rec["rects"].tolist(),
                "labels": rec["labels"].tolist()}))
        print(json.dumps({"records": len(r), "prefix": args.out}))
        return
    if not args.manifest:
        raise SystemExit("--manifest is required (unless --inspect)")
    # --format voc: the converter's comma-grouped multi-box manifests
    # (`cli voc` output, 0-based labels) feed the writer directly —
    # the reference's VOC -> LMDB flow (create_train_val.py ->
    # create_training_lmdb.py)
    samples = (read_voc_manifest(args.manifest) if args.format == "voc"
               else read_detection_manifest(args.manifest))
    n = create_detection_records(
        samples, args.out, augment=args.augment,
        relabel_contiguous=args.relabel, add_background=args.background)
    print(f"wrote {n} records to {args.out}-*.rec")


def _cmd_gates(args):
    import sys as _sys
    from tpufcn.train.gates import (
        bench_gate_configs, run_bench_gates, warm_gate_caches)

    known = sorted(bench_gate_configs(args.tier))
    fams = args.family or known
    unknown = sorted(set(fams) - set(known))
    if unknown:
        raise SystemExit(f"unknown families {unknown}; have {known}")
    log = lambda m: print(m, file=_sys.stderr)   # noqa: E731
    if args.warm_caches:
        out = warm_gate_caches(root=args.root, only=fams, log=log,
                               tier=args.tier)
    else:
        out = run_bench_gates(root=args.root, only=fams, log=log,
                              tier=args.tier)
    print(json.dumps(out))


def _cmd_pretrain(args):
    """In-repo backbone pretraining (the reference's fine-tune seed,
    train/train.sh:26 `--weights VGG16...caffemodel` — reproduced
    without egress, tpufcn/train/pretrain.py): exports a .caffemodel
    that `cli train --weights` and the gates consume by name."""
    import sys as _sys
    from tpufcn.train.pretrain import pretrain_vgg16
    res = pretrain_vgg16(args.out, classes=args.classes,
                         steps=args.steps, lr=args.lr, seed=args.seed,
                         log=lambda m: print(m, file=_sys.stderr))
    print(json.dumps(res))


def _cmd_voc(args):
    from tpufcn.data.voc import VOC_CLASSES, PascalVOC
    PascalVOC(args.voc_root,
              classes=args.classes or VOC_CLASSES).create(args.out)
    print(f"wrote manifests to {args.out}")


def _eval_seg(args):
    """Mean-IoU / pixel-accuracy for the FCN seg families over a
    compositor mask manifest (image mask label rect records)."""
    import os

    import cv2 as cv
    import numpy as np
    import jax
    import jax.numpy as jnp
    from tpufcn.data import read_mask_manifest
    from tpufcn.models import build, get_spec
    from tpufcn.serve.detector import _preprocess
    from tpufcn.train.evaluate import evaluate_segmentation

    # background_offset=1: compositor convention, mask pixels = label+1,
    # class 0 stays background.  --labels pins class ids to the training
    # run's label-manifest snapshot (per-manifest densification would
    # silently shift ids when the eval manifest misses a class).
    label_map = None
    if args.labels:
        from tpufcn.data.manifest import read_label_map_snapshot
        label_map = read_label_map_snapshot(args.labels)
    samples = read_mask_manifest(args.manifest, background_offset=1,
                                 label_map=label_map)
    spec = get_spec(args.model)
    C = args.num_classes or spec.grid.num_classes
    mkw = {"num_classes": args.num_classes} if args.num_classes else {}
    model = build(args.model, **mkw)
    H, W = spec.grid.im_height, spec.grid.im_width

    from tpufcn.convert import resolve_weights
    params = resolve_weights(
        args.weights,
        lambda: jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, H, W, 3), jnp.float32)))

    @jax.jit
    def fwd(p, x):
        x = _preprocess(x, spec.preprocessing, (H, W))
        return jnp.argmax(model.apply(p, x)["seg"], axis=-1)

    gts, preds = [], []
    for s in samples[:args.limit]:
        img = cv.imread(s.image_path)
        msk = cv.imread(s.mask_path, cv.IMREAD_GRAYSCALE)
        if img is None or msk is None:
            continue
        img = cv.resize(img, (W, H))
        msk = cv.resize(msk, (W, H), interpolation=cv.INTER_NEAREST)
        gts.append(np.where(msk > 0, s.label, 0))
        preds.append(np.asarray(
            fwd(params, jnp.asarray(img[None], jnp.float32)))[0])
    res = evaluate_segmentation(gts, preds, num_classes=C)
    print(json.dumps({"mean_iou": res["mean_iou"],
                      "pixel_accuracy": res["pixel_accuracy"],
                      "mean_class_accuracy": res["mean_class_accuracy"],
                      "iou": {str(k): v for k, v in res["iou"].items()},
                      "images": len(gts)}))


def _cmd_eval(args):
    import os

    import cv2 as cv
    import numpy as np
    from tpufcn.data import read_voc_manifest, read_detection_manifest
    from tpufcn.models import get_spec
    from tpufcn.serve.detector import Detector
    from tpufcn.train.evaluate import evaluate_detector
    from tpufcn.ops.boxes import rects_to_corners

    if args.format == "seg":
        return _eval_seg(args)
    reader = (read_voc_manifest if args.format == "voc"
              else read_detection_manifest)
    samples = reader(args.manifest)
    mkw = ({"num_classes": args.num_classes}
           if args.num_classes else {})
    if args.weights and os.path.isdir(args.weights):
        # a Trainer orbax snapshot directory
        det = Detector.from_checkpoint(args.weights, args.model,
                                       model_kwargs=mkw)
    elif args.weights:
        # a .caffemodel file — reuse the launch-graph loading path
        from tpufcn.serve.launch import _make_detector
        from tpufcn.serve.bus import TopicBus
        det = _make_detector(TopicBus(), {
            "model": args.model, "pretrained_weights": args.weights,
            **({"num_classes": args.num_classes}
               if args.num_classes else {}),
        }, {}).detector
    else:
        det = Detector(args.model, model_kwargs=mkw)
    images, gts = [], []
    for s in samples[:args.limit]:
        img = cv.imread(s.image_path)
        if img is None:
            continue
        images.append(img)
        corners = np.asarray(s.rects, np.float64)
        corners = np.concatenate(
            [corners[:, :2], corners[:, :2] + corners[:, 2:4]], axis=1)
        gts.append((corners, np.asarray(s.labels)))
    C = args.num_classes or get_spec(args.model).grid.num_classes
    res = evaluate_detector(det, images, gts, num_classes=C,
                            iou_thresh=args.iou)
    print(json.dumps({"mAP": res["mAP"],
                      "ap": {str(k): v for k, v in res["ap"].items()},
                      "images": len(images)}))


def _cmd_replay(args):
    """Bag-replay analog (reference: roslaunch + `rosbag play` into the
    detector node).  Frame files stream through the topic bus one per
    stamp; --micro-batch switches to the batched single-dispatch
    throughput mode (BASELINE config #2)."""
    import cv2 as cv
    import numpy as np

    if args.video and args.images:
        raise SystemExit("give image files OR --video, not both")
    if args.video:
        # camera-recording input: the offline analog of the reference's
        # live camera topic (fcn_object_detector.py:330-331)
        from tpufcn.serve.video import read_video_frames
        frames, _ = read_video_frames(args.video, stride=args.video_stride,
                                      max_frames=args.max_frames or None)
    else:
        frames = []
        for p in args.images:
            img = cv.imread(p)
            if img is not None:
                frames.append(img)
    if not frames:
        raise SystemExit("no readable frames")

    if args.micro_batch > 0:
        from tpufcn.serve.detector import Detector
        from tpufcn.serve.stream import replay_throughput
        if args.weights:
            # same weight formats as the launch graph: orbax snapshot
            # dir or .caffemodel file
            from tpufcn.serve.bus import TopicBus
            from tpufcn.serve.launch import _make_detector
            det = _make_detector(TopicBus(), {
                "model": args.model,
                "pretrained_weights": args.weights}, {}).detector
        else:
            det = Detector(args.model)
        stats = replay_throughput(det, frames,
                                  micro_batch=min(args.micro_batch,
                                                  len(frames)))
        print(json.dumps(stats))
        return

    from tpufcn.serve.launch import launch
    from tpufcn.serve.stream import replay
    params = {"model": args.model}
    if args.weights:
        params["pretrained_weights"] = args.weights
    graph = launch({"fcn_object_detector": {
        "type": "detector", "params": params,
        "remap": {"image": "image"}}})
    rects = []
    graph.bus.subscribe("/fcn_object_detector/rects",
                        lambda m: rects.append(m.data), queue_size=10**6)
    node = graph.nodes["fcn_object_detector"]
    n = replay(node, frames, bus=graph.bus)
    for i, r in enumerate(rects):
        # RectsMsg: two corner points per detection
        print(json.dumps({"frame": i, "detections": len(r.labels)}))
    print(json.dumps({"frames_processed": n}))


def _cmd_export(args):
    """AOT serving artifact: serialize the full jitted pipeline
    (preprocess -> forward -> decode -> NMS) to StableHLO.  Weights stay
    outside the artifact — pair it with an orbax snapshot or a `convert`
    .npz on the serving host (serve/export.py)."""
    from tpufcn.serve.bus import TopicBus
    from tpufcn.serve.detector import Detector
    from tpufcn.serve.export import export_detector
    if args.weights:
        from tpufcn.serve.launch import _make_detector
        det = _make_detector(TopicBus(), {
            "model": args.model,
            "pretrained_weights": args.weights}, {}).detector
    else:
        det = Detector(args.model)
    art = export_detector(
        det, args.batch,
        platforms=([p.strip() for p in args.platforms.split(",")]
                   if args.platforms else None))
    with open(args.out, "wb") as f:
        f.write(art)
    print(json.dumps({"out": args.out, "bytes": len(art),
                      "batch": args.batch,
                      "platforms": args.platforms or "default"}))


def _cmd_launch(args):
    """The roslaunch analog: build a node graph from a JSON spec (the
    launch-file equivalent — node types/params/remaps, see
    tpufcn/serve/launch.py and examples/*.launch.json) and optionally
    stream image frames through it.

    With --bus tcp://host:port the graph attaches to a cross-process
    broker (`cli bus`), and --nodes restricts this process to a subset
    of the spec — together they split one launch file across OS
    processes, the reference's actual deployment shape (each ROS node
    its own process, reference launch/fcn_point_map.launch:3-19)."""
    import cv2 as cv
    from tpufcn.serve.launch import launch

    with open(args.graph) as f:
        spec = json.load(f)
    if args.nodes:
        wanted = [n.strip() for n in args.nodes.split(",") if n.strip()]
        missing = [n for n in wanted if n not in spec]
        if missing:
            raise SystemExit(f"--nodes not in spec: {', '.join(missing)}")
        spec = {n: spec[n] for n in wanted}
    bus = None
    if args.bus:
        from tpufcn.serve.netbus import RemoteTopicBus
        bus = RemoteTopicBus(args.bus)
    graph = launch(spec, bus=bus)
    published = 0
    if args.frames and args.video:
        raise SystemExit("give --frames OR --video, not both")
    if args.frames or args.video:
        if args.video:
            # camera recording -> topic stream with source timestamps,
            # so stamp-based synchronizers see real capture cadence
            from tpufcn.serve.video import iter_video_frames
            source = iter_video_frames(args.video,
                                       stride=args.video_stride,
                                       max_frames=args.max_frames or None)
        else:
            def _read_frames():
                for i, path in enumerate(args.frames):
                    img = cv.imread(path)
                    if img is None:
                        print(f"{path}: unreadable", file=sys.stderr)
                        continue
                    yield float(i), img
            source = _read_frames()
        for stamp, img in source:
            graph.bus.publish(args.topic, img, stamp=stamp)
            graph.spin()
            published += 1
        for node in graph.nodes.values():
            if hasattr(node, "flush"):
                node.flush()     # part-filled micro-batches at stream end
        graph.spin()             # deliver anything the flush published
    elif args.serve is not None:
        # node-only process on a remote bus: spin until the duration
        # elapses (or forever on 0 / until SIGINT), delivering messages
        # that arrive from other processes via the broker
        import time as _time
        deadline = _time.time() + args.serve if args.serve > 0 else None
        try:
            while deadline is None or _time.time() < deadline:
                graph.spin()
                _time.sleep(0.005)
        except KeyboardInterrupt:
            pass
    else:
        graph.spin(args.spin)
    print(json.dumps({
        "nodes": sorted(graph.nodes),
        "frames_published": published,
        "processed": {name: getattr(node, "processed", None)
                      for name, node in graph.nodes.items()}}))


def _cmd_bus(args):
    """Run the cross-process topic broker in the foreground (the
    roscore/TCPROS-fabric analog): node processes attach with
    `cli launch --bus tcp://host:port`."""
    import signal
    import time as _time
    from tpufcn.serve.netbus import start_broker
    handle = start_broker(port=args.port,
                          native="no" if args.python else "auto",
                          max_outbox=args.max_outbox)
    kind = "python" if handle._proc is None else "native"
    print(json.dumps({"address": handle.address, "broker": kind}),
          flush=True)
    stop = {"flag": False}
    def _sig(_s, _f):
        stop["flag"] = True
    signal.signal(signal.SIGINT, _sig)
    signal.signal(signal.SIGTERM, _sig)
    try:
        while not stop["flag"]:
            if handle._proc is not None and handle._proc.poll() is not None:
                raise SystemExit("broker process exited")
            _time.sleep(0.2)
    finally:
        handle.stop()


def _tool_extractor(args):
    """CNN-code extractor for the pseudo-label tools: trained VGG16
    weights from a .caffemodel when given (the reference tools load a
    .caffemodel for their fc7 codes, boundary_refinement.py:374-383),
    else random-init (the extractor itself warns that gating will be
    weak)."""
    from tpufcn.tools.features import CnnCodeExtractor
    if args.extractor_weights:
        return CnnCodeExtractor.from_caffemodel(
            args.extractor_weights, input_size=args.input_size)
    return CnnCodeExtractor(input_size=args.input_size)


def _cmd_refine(args):
    """Offline boundary-refinement walk over a detection manifest
    (reference boundary_refinement.py:77-157): track each frame's box
    from the previous frame, keep the tracked box when its CNN code
    stays similar, write the refined manifest."""
    import os
    from tpufcn.data.manifest import read_detection_manifest
    from tpufcn.tools.boundary_refinement import BoundaryRefiner
    samples = read_detection_manifest(args.manifest)
    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(args.manifest)),
        "train_refined.txt")
    refiner = BoundaryRefiner(extractor=_tool_extractor(args),
                              similarity_thresh=args.threshold)
    n = refiner.refine_manifest(samples, out)
    print(json.dumps({"refined": n, "out": out}))


def _cmd_rank(args):
    """Proposal ranking / outlier rejection over a detection manifest
    (reference rank_object_models.py): cluster the crops' CNN codes,
    walk the sequence with template/previous similarity gating, write
    the kept lines (the reference's train2.txt convention)."""
    import os
    from tpufcn.data.manifest import read_detection_manifest
    from tpufcn.tools.rank_proposals import RankObjectProposals
    samples = read_detection_manifest(args.manifest)
    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(args.manifest)), "train2.txt")
    ranker = RankObjectProposals(extractor=_tool_extractor(args),
                                 distance_thresh=args.threshold,
                                 metric=args.metric)
    n = ranker.write_filtered(samples, out)
    print(json.dumps({"kept": n, "total": len(samples), "out": out}))


def _cmd_profile(args):
    """Per-op device-time attribution (SURVEY.md §5 tracing/profiling):
    run the jitted pipeline for --iters dispatches under jax.profiler,
    then aggregate the trace's per-HLO-op device durations
    (utils/profiling.aggregate_device_trace).  Host-side timing is
    unreliable on remote-TPU setups (CLAUDE.md) — the device trace is
    the ground truth the perf work in BENCH.md was driven by."""
    import tempfile

    import numpy as np
    import jax
    import jax.numpy as jnp
    from tpufcn.models import build, get_spec
    from tpufcn.utils.profiling import aggregate_device_trace, device_trace

    spec = get_spec(args.model)
    H, W = spec.grid.im_height, spec.grid.im_width
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, size=(args.batch, H, W, 3)).astype(np.uint8))
    if args.train:
        # train step (fwd + bwd + optimizer) over a synthetic batch —
        # the per-op view BENCH.md's train analysis came from
        from tpufcn.core.config import DataConfig, TrainConfig
        from tpufcn.train.trainer import Trainer

        cfg = TrainConfig(
            grid=spec.grid, model=args.model,
            data=DataConfig(batch_size=args.batch),
            snapshot_every=0, log_every=10 ** 9,
            snapshot_dir=tempfile.mkdtemp(prefix="tpufcn_profile_snap_"))
        with_seg = "seg" in spec.heads
        trainer = Trainer(cfg, with_seg=with_seg,
                          log_sink=lambda s: None)
        state = trainer.init_state()
        C = spec.grid.num_classes
        lo = 1 if spec.background_channel is not None else 0
        batch = {
            "image": np.asarray(frames),
            "rects": np.tile(np.array([8, 8, H // 2, W // 2], np.float32),
                             (args.batch, 4, 1)),
            "labels": np.full((args.batch, 4),
                              max(C - 1 - lo, 0), np.int32),
            "valid": np.tile(np.array([True, False, False, False]),
                             (args.batch, 1)),
        }
        if with_seg:
            batch["seg"] = np.zeros((args.batch, H, W), np.int32)
        b = trainer.put(batch)
        holder = [state]

        def run():
            s, metrics = trainer.step_fn(holder[0], b)
            holder[0] = s
            return float(np.asarray(metrics["loss_total"]))
    elif "coverage" in spec.heads and "bboxes" in spec.heads:
        from tpufcn.serve.detector import Detector
        det = Detector(args.model, max_candidates=args.max_candidates)
        params, impl = det.params, jax.jit(det._infer_impl)

        def run():
            return np.asarray(impl(params, frames).boxes)
    else:                             # seg-only family: fwd + argmax
        from tpufcn.serve.detector import _preprocess
        model = build(args.model)
        params = jax.jit(model.init)(
            jax.random.key(0), jnp.zeros((1, H, W, 3), jnp.float32))
        impl = jax.jit(lambda p, x: jnp.argmax(model.apply(
            p, _preprocess(x, spec.preprocessing, (H, W)))["seg"], -1))

        def run():
            return np.asarray(impl(params, frames))

    run()                             # compile + warm OUTSIDE the trace
    logdir = args.logdir or tempfile.mkdtemp(prefix="tpufcn_profile_")
    with device_trace(logdir):
        for _ in range(args.iters):
            run()
    ops = aggregate_device_trace(logdir)
    total = sum(o["dur_us"] for o in ops) or 1.0
    mode = "train" if args.train else "serve"
    if args.json:
        print(json.dumps({"model": args.model, "mode": mode,
                          "batch": args.batch,
                          "iters": args.iters, "total_device_us": total,
                          "logdir": logdir,
                          "ops": ops[:args.top] if args.top else ops}))
        return
    print(f"{args.model} [{mode}]  batch {args.batch}  "
          f"x{args.iters} dispatches  "
          f"device total {total / 1e3:.2f} ms  (trace: {logdir})")
    print(f"{'device ms':>10}  {'share':>6}  op")
    for o in ops[:args.top] if args.top else ops:
        print(f"{o['dur_us'] / 1e3:10.3f}  {o['dur_us'] / total:6.1%}  "
              f"{o['name']}")


def _cmd_bench(args):
    import runpy
    runpy.run_path("bench.py", run_name="__main__")


def _cmd_pointmap(args):
    from tpufcn.pointmap import build_library
    print(build_library(force=True))


def main(argv=None):
    # TPUFCN_PLATFORM=cpu forces the jax backend BEFORE any backend
    # init.  The env var route (JAX_PLATFORMS) is not reliable on hosts
    # whose TPU plugin re-registers itself at interpreter start; the
    # config update always sticks.  Used to drive CLI surfaces on the
    # CPU backend (e.g. an 8-device virtual mesh via
    # XLA_FLAGS=--xla_force_host_platform_device_count=8) and by the
    # multi-process serving tests.
    import os
    plat = os.environ.get("TPUFCN_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    # persistent compile cache (utils/compile_cache.py): repeat CLI
    # invocations of the same model/shape skip the 10 s-minutes compile
    from tpufcn.utils.compile_cache import enable as _enable_cache
    _enable_cache("/tmp/tpufcn_jaxcache" if not plat
                  else f"/tmp/tpufcn_jaxcache_{plat}")
    p = argparse.ArgumentParser(prog="tpufcn", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train")
    t.add_argument("--recipe", default="bounding_box")
    t.add_argument("--manifest", default=None)
    t.add_argument("--records", default=None,
                   help="train from record shards (prefix passed to "
                        "`records --out`) instead of online compositing")
    t.add_argument("--backgrounds", nargs="*", default=None)
    t.add_argument("--max-iter", type=int, default=None)
    t.add_argument("--batch-size", type=int, default=None)
    t.add_argument("--iter-size", type=int, default=1,
                   help="Caffe solver gradient accumulation: one "
                        "optimizer update per N micro-batches (update = "
                        "mean gradient; effective batch = N*batch-size)")
    t.add_argument("--snapshot-dir", default=None)
    t.add_argument("--metrics-out", default=None, metavar="FILE",
                   help="write per-display-step metrics history as JSONL "
                        "(loss terms, img/s) after training")
    t.add_argument("--weights", default=None,
                   help="initial weights for fine-tuning (the reference's "
                        "`caffe train --weights`, train/train.sh:26): a "
                        ".caffemodel file (lenient by-name load) or a "
                        "Trainer snapshot directory; an existing snapshot "
                        "in --snapshot-dir still resumes over this")
    t.add_argument("--workers", type=int, default=0,
                   help="scene-builder worker processes (0 = in-process)")
    t.add_argument("--warmup", type=int, default=0, metavar="N",
                   help="linear lr warmup over the first N steps (0 = "
                        "off, the Caffe-parity default; the from-scratch "
                        "stabilizer — every reference recipe fine-tunes "
                        "from pretrained weights instead)")
    t.add_argument("--inspect-data", default=None, metavar="DIR",
                   help="data dry-run: write the first batch as "
                        "rect-overlay PNGs (+ seg masks) to DIR and "
                        "exit without training (the reference's debug "
                        "imshow layer, GUI-less)")
    t.add_argument("--device-data", action="store_true",
                   help="compose scenes ON the accelerator (one jitted "
                        "dispatch per batch, zero per-step host work; "
                        "the fast path — host compositing stays the "
                        "reference-exact parity path)")
    t.add_argument("--cache", type=int, default=0,
                   help="device-resident batch cache: build N batches "
                        "once, train epochs over them from HBM (fast on "
                        "slow hosts / remote-TPU tunnels)")
    t.add_argument("--eval-every", type=int, default=0, metavar="N",
                   help="in-training validation cadence (the Caffe "
                        "TEST-phase test_interval, solver.prototxt:6-7): "
                        "score the held-out set every N steps, log "
                        "val metrics, keep the best checkpoint in "
                        "<snapshot-dir>/best (requires --val-records "
                        "or --val-manifest)")
    t.add_argument("--val-records", default=None, metavar="PREFIX",
                   help="held-out record shards for --eval-every "
                        "(detection families: mAP@0.5 under the full "
                        "serving pipeline)")
    t.add_argument("--val-manifest", default=None, metavar="FILE",
                   help="held-out manifest for --eval-every: `path x y "
                        "w h label` detection lines, or the stride-2 "
                        "mask manifest for seg-only families (mean-IoU)")
    t.add_argument("--val-limit", type=int, default=64,
                   help="max held-out samples scored per validation")
    t.set_defaults(fn=_cmd_train)

    d = sub.add_parser("detect")
    d.add_argument("images", nargs="+")
    d.add_argument("--model", default="googlenet_detectnet")
    d.add_argument("--weights", default=None)
    d.add_argument("--threshold", type=float, default=0.5)
    d.add_argument("--min-boxes", type=int, default=3)
    d.add_argument("--nms-eps", type=float, default=0.2)
    d.add_argument("--manifest", default=None,
                   help="label manifest ('idx name' / 'idx _ name' "
                        "lines) naming classes in the output, the "
                        "reference's ~manifest rosparam")
    d.add_argument("--overlay-dir", default=None,
                   help="write the reference-style detection overlay "
                        "(<image>_det.png) per input")
    d.set_defaults(fn=_cmd_detect)

    c = sub.add_parser("convert")
    c.add_argument("caffemodel")
    c.add_argument("--model", default="googlenet_detectnet")
    c.add_argument("--out", default="weights.npz")
    c.add_argument("--lenient", action="store_true")
    c.set_defaults(fn=_cmd_convert)

    r = sub.add_parser("records")
    r.add_argument("--manifest", default=None)
    r.add_argument("--format", choices=("detection", "voc"),
                   default="detection",
                   help="manifest format: `path x y w h label` lines "
                        "(1-based labels) or the VOC converter's "
                        "comma-grouped multi-box manifests (0-based)")
    r.add_argument("--out", required=True)
    r.add_argument("--inspect", action="store_true",
                   help="read back records at --out and print label/"
                        "shape lines (the reference writer's read_lmdb "
                        "inspector) instead of writing")
    r.add_argument("--limit", type=int, default=10)
    r.add_argument("--augment", action="store_true",
                   help="bake the reference's offline augmentation chain "
                        "into the shards (original+flip+zoom-crop+blur "
                        "per sample, create_training_lmdb.py:296-356)")
    r.add_argument("--relabel", action="store_true",
                   help="remap labels to contiguous 0..K-1 ids (the "
                        "reference writer's np.unique relabeling; mapping "
                        "saved as <out>.labelmap.json)")
    r.add_argument("--background", action="store_true",
                   help="with a learned background class: contiguous ids "
                        "shifted +1 so id 0 is background "
                        "(create_training_lmdb.py use_bkgnd)")
    r.set_defaults(fn=_cmd_records)

    v = sub.add_parser("voc")
    v.add_argument("voc_root")
    v.add_argument("--out", default=".")
    v.add_argument("--classes", nargs="*", default=None,
                   help="class-name whitelist in label order (default: "
                        "the 20 Pascal VOC classes); objects with other "
                        "names are skipped, as the reference converter "
                        "skips unknown names")
    v.set_defaults(fn=_cmd_voc)

    ga = sub.add_parser(
        "gates",
        help="run the tracked accuracy gates: per-family trained "
             "mAP/mIoU on the hard synthetic benchmark (exact vs "
             "fp8-serving) and the VOC-fixture flow — TRAINS each "
             "family, takes tens of minutes per family on TPU")
    ga.add_argument("--family", nargs="*", default=None,
                    help="subset: googlenet googlenet_3cls vgg_pyramid "
                         "fcn8s fcn32s voc_fixture (default: all)")
    ga.add_argument("--root", default="/tmp/tpufcn_hardgate",
                    help="work/cache directory for the hard benchmark")
    ga.add_argument("--warm-caches", action="store_true",
                    help="compose every tracked gate's train-scene + "
                         "eval npz caches WITHOUT training, so a later "
                         "bench/driver run pays pure device time")
    ga.add_argument("--tier", choices=("bench", "full"), default="bench",
                    help="'bench': the tracked capture tier bench.py "
                         "runs (b32, driver-window-sized); 'full': the "
                         "b16/6k-step deep-calibration regime")
    ga.set_defaults(fn=_cmd_gates)

    pt = sub.add_parser(
        "pretrain",
        help="pretrain the VGG16 backbone as a crop classifier on "
             "hardbench renders and export a .caffemodel fine-tune "
             "seed (the reference's --weights workflow, in-repo)")
    pt.add_argument("--out", default="/tmp/tpufcn_pretrain/vgg16.caffemodel")
    pt.add_argument("--classes", type=int, default=4)
    pt.add_argument("--steps", type=int, default=1500)
    pt.add_argument("--lr", type=float, default=3e-4)
    pt.add_argument("--seed", type=int, default=0)
    pt.set_defaults(fn=_cmd_pretrain)

    e = sub.add_parser("eval")
    e.add_argument("--manifest", required=True)
    e.add_argument("--format", choices=("voc", "detection", "seg"),
                   default="voc")
    e.add_argument("--model", default="vgg_pyramid_detectnet")
    e.add_argument("--weights", default=None,
                   help="orbax snapshot dir or .caffemodel file")
    e.add_argument("--num-classes", type=int, default=0,
                   help="override the registry head width (snapshots "
                        "trained with a non-default class count)")
    e.add_argument("--iou", type=float, default=0.5)
    e.add_argument("--limit", type=int, default=10**9)
    e.add_argument("--labels", default=None,
                   help="label-manifest snapshot pinning seg class ids "
                        "to the training run's mapping (--format seg)")
    e.set_defaults(fn=_cmd_eval)

    rp = sub.add_parser("replay")
    rp.add_argument("images", nargs="*")
    rp.add_argument("--video", default=None,
                    help="video file as the frame source (the offline "
                         "analog of the reference's live camera topic)")
    rp.add_argument("--video-stride", type=int, default=1,
                    help="keep every Nth video frame")
    rp.add_argument("--max-frames", type=int, default=0,
                    help="cap the number of video frames (0 = all)")
    rp.add_argument("--model", default="googlenet_detectnet")
    rp.add_argument("--weights", default=None)
    rp.add_argument("--micro-batch", type=int, default=0,
                    help="> 0: batched throughput mode instead of "
                         "per-frame bus replay")
    rp.set_defaults(fn=_cmd_replay)

    def _tool_args(sp, default_thresh):
        sp.add_argument("--manifest", required=True)
        sp.add_argument("--out", default=None,
                        help="output manifest (default: next to the "
                             "input, the reference's convention)")
        sp.add_argument("--threshold", type=float, default=default_thresh)
        sp.add_argument("--extractor-weights", default=None,
                        help="VGG16 .caffemodel for the CNN-code "
                             "extractor (random init otherwise)")
        sp.add_argument("--input-size", type=int, default=224)

    x = sub.add_parser("export",
                       help="serialize the jitted serving pipeline to a "
                            "StableHLO artifact (AOT deployment)")
    x.add_argument("--model", default="googlenet_detectnet")
    x.add_argument("--weights", default=None,
                   help="orbax snapshot dir or .caffemodel (shapes only; "
                        "weights are a call argument, not baked in)")
    x.add_argument("--batch", type=int, default=8)
    x.add_argument("--out", default="detector.stablehlo")
    x.add_argument("--platforms", default=None,
                   help="comma-separated lowering targets, e.g. tpu,cpu "
                        "(default: current backend)")
    x.set_defaults(fn=_cmd_export)

    ln = sub.add_parser("launch",
                        help="build a node graph from a JSON launch "
                             "spec and stream frames through it "
                             "(roslaunch analog)")
    ln.add_argument("graph", help="JSON launch spec "
                                  "(see examples/*.launch.json)")
    ln.add_argument("--frames", nargs="*", default=None,
                    help="image files to publish through the graph")
    ln.add_argument("--video", default=None,
                    help="video file to publish through the graph "
                         "(frames stamped with source capture times)")
    ln.add_argument("--video-stride", type=int, default=1,
                    help="keep every Nth video frame")
    ln.add_argument("--max-frames", type=int, default=0,
                    help="cap the number of video frames (0 = all)")
    ln.add_argument("--topic", default="image",
                    help="topic the frames are published on")
    ln.add_argument("--spin", type=int, default=1,
                    help="bus spins when no frames are given")
    ln.add_argument("--bus", default=None,
                    help="attach to a cross-process broker "
                         "(tcp://host:port, see `cli bus`)")
    ln.add_argument("--nodes", default=None,
                    help="comma-separated subset of the spec to run in "
                         "THIS process (multi-process deployment)")
    ln.add_argument("--serve", type=float, default=None,
                    help="spin for SECONDS serving remote-bus traffic "
                         "(0 = until SIGINT); for node-only processes")
    ln.set_defaults(fn=_cmd_launch)

    bs = sub.add_parser("bus",
                        help="run the cross-process topic broker "
                             "(the TCPROS-fabric analog)")
    bs.add_argument("--port", type=int, default=0,
                    help="TCP port (0 = ephemeral, printed on start)")
    bs.add_argument("--python", action="store_true",
                    help="use the pure-Python broker instead of the "
                         "native C++ one")
    bs.add_argument("--max-outbox", type=int, default=64,
                    help="per-subscriber queued-frame cap (drop-oldest)")
    bs.set_defaults(fn=_cmd_bus)

    rf = sub.add_parser("refine",
                        help="offline boundary-refinement walk "
                             "(boundary_refinement.py analog)")
    _tool_args(rf, 0.5)
    rf.set_defaults(fn=_cmd_refine)

    rk = sub.add_parser("rank",
                        help="proposal ranking / outlier rejection "
                             "(rank_object_models.py analog)")
    _tool_args(rk, 0.5)
    rk.add_argument("--metric", choices=("bhattacharyya", "chi_square"),
                    default="bhattacharyya")
    rk.set_defaults(fn=_cmd_rank)

    b = sub.add_parser("bench")
    b.set_defaults(fn=_cmd_bench)

    pf = sub.add_parser("profile",
                        help="per-HLO-op device-time attribution")
    pf.add_argument("--model", default="googlenet_detectnet_serving")
    pf.add_argument("--batch", type=int, default=8)
    pf.add_argument("--iters", type=int, default=3)
    pf.add_argument("--top", type=int, default=25,
                    help="rows to print (0 = all)")
    pf.add_argument("--max-candidates", type=int, default=256)
    pf.add_argument("--train", action="store_true",
                    help="profile the train step (fwd+bwd+optimizer) "
                         "instead of the serving pipeline")
    pf.add_argument("--logdir", default=None,
                    help="keep the XPlane trace here (XProf-viewable)")
    pf.add_argument("--json", action="store_true")
    pf.set_defaults(fn=_cmd_profile)

    pm = sub.add_parser("pointmap")
    pm.set_defaults(fn=_cmd_pointmap)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
