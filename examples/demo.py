#!/usr/bin/env python3
"""End-to-end demo: synthetic dataset -> train -> serve -> overlay.

Generates a tiny synthetic object dataset (textured boxes on noise, with
masks), trains the VGG DetectNet recipe for a few hundred steps on the
compositing pipeline, then runs the single-dispatch detector over fresh
frames and writes overlay images.

    python examples/demo.py --out /tmp/tpufcn_demo --steps 200
"""

import argparse
import os
import sys

import cv2 as cv
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_dataset(root, rng, n=8, classes=1):
    """Synthetic masked-object dataset; ``classes`` > 1 gives each class
    a distinct texture family and mask shape (box / ellipse / stripes)
    so multiclass coverage heads have something separable to learn."""
    from tpufcn.data.manifest import MaskSample
    os.makedirs(root, exist_ok=True)
    samples = []
    for i in range(max(n, classes)):
        c = i % classes
        img = rng.integers(0, 70, size=(160, 200, 3)).astype(np.uint8)
        w, h = int(rng.integers(40, 70)), int(rng.integers(40, 70))
        x, y = int(rng.integers(0, 200 - w)), int(rng.integers(0, 160 - h))
        gy, gx = np.mgrid[0:h, 0:w]
        if c == 0:
            tex = np.stack(
                [220 - gx * 2, 60 + gy * 2, 120 + ((gx + gy) % 6) * 18], -1)
        elif c == 1:
            tex = np.stack(
                [40 + ((gx // 4) % 2) * 170, 200 - gy, 60 + gx], -1)
        else:
            tex = np.stack(
                [90 + ((gy // 3) % 2) * 140, 50 + ((gx + 2 * gy) % 9) * 20,
                 230 - gx - gy], -1)
        mask = np.zeros((160, 200), np.uint8)
        if c == 1:
            mk = np.zeros((h, w), np.uint8)
            cv.ellipse(mk, (w // 2, h // 2), (w // 2 - 1, h // 2 - 1),
                       0, 0, 360, 255, -1)
            mask[y:y + h, x:x + w] = mk
        else:
            mask[y:y + h, x:x + w] = 255
        region = img[y:y + h, x:x + w]
        m = mask[y:y + h, x:x + w] > 0
        region[m] = tex.clip(0, 255).astype(np.uint8)[m]
        ip = os.path.join(root, f"img{i:03d}.png")
        mp = os.path.join(root, f"msk{i:03d}.png")
        cv.imwrite(ip, img)
        cv.imwrite(mp, mask)
        samples.append(MaskSample(ip, mp, c, np.array([x, y, w, h])))
    return samples


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/tpufcn_demo")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workers", type=int, default=0,
                    help="scene-builder worker processes (0 = one "
                         "prefetch thread; use cores-1 on real hosts)")
    ap.add_argument("--classes", type=int, default=1,
                    help="synthetic object classes (distinct textures/"
                         "shapes; multiclass coverage heads)")
    ap.add_argument("--cache", type=int, default=0,
                    help="device-resident batch cache: compose N "
                         "batches once, train epochs over them from HBM "
                         "(fast on 1-core hosts / remote-TPU tunnels)")
    ap.add_argument("--device-data", action="store_true",
                    help="compose every batch ON the accelerator (one "
                         "jitted dispatch; zero per-step host work)")
    args = ap.parse_args()

    import dataclasses
    import jax.numpy as jnp
    from tpufcn.core.config import DataConfig, GridConfig, TrainConfig
    from tpufcn.data import CompositeTrainPipeline
    from tpufcn.models import build
    from tpufcn.serve.detector import Detector
    from tpufcn.serve.viz import draw_detections
    from tpufcn.train.trainer import Trainer

    rng = np.random.default_rng(0)
    data_dir = os.path.join(args.out, "data")
    samples = make_dataset(data_dir, rng,
                           n=max(8, 4 * args.classes),
                           classes=args.classes)

    grid = GridConfig(im_width=128, im_height=128, stride=8,
                      num_classes=args.classes)
    cfg = TrainConfig(
        grid=grid, model="vgg_detectnet_train",
        data=DataConfig(batch_size=args.batch),
        optimizer="adam", learning_rate=3e-4, lr_decay_step=0,
        max_iter=args.steps, snapshot_every=0,
        snapshot_dir=os.path.join(args.out, "snap"), log_every=20)
    model = build("vgg_detectnet_train", dtype=jnp.bfloat16,
                  num_classes=args.classes)
    # multi-step dispatch amortizes per-dispatch overhead (dominant
    # through the remote-TPU tunnel; see CLAUDE.md)
    trainer = Trainer(cfg, model=model,
                      steps_per_dispatch=args.cache if args.cache else 4)
    parallel_pipe = None
    if args.device_data and args.workers:
        raise SystemExit("--device-data and --workers are exclusive "
                         "(accelerator vs host-pool scene building)")
    if args.device_data:
        from tpufcn.data import DeviceCompositePipeline
        dev_pipe = DeviceCompositePipeline(
            samples, grid, DataConfig(batch_size=args.batch),
            box_capacity=4, seed=1)
        src = iter(dev_pipe)
    elif args.workers > 0:
        from tpufcn.data.parallel import ParallelCompositePipeline
        parallel_pipe = ParallelCompositePipeline(
            samples, grid, DataConfig(batch_size=args.batch),
            box_capacity=4, seed=1, workers=args.workers)
        src = iter(parallel_pipe)
    else:
        pipe = CompositeTrainPipeline(samples, grid,
                                      DataConfig(batch_size=args.batch),
                                      box_capacity=4, seed=1)
        src = iter(pipe)
    if args.cache > 0:
        # wrap whichever builder was chosen (workers still parallelize
        # the one-time cache fill), then train epochs from HBM
        from tpufcn.data import DeviceBatchCache
        src = iter(DeviceBatchCache(trainer.put, src, args.cache))
    elif args.workers == 0 and not args.device_data:
        # (device batches need no host prefetch thread — dispatches
        # are already asynchronous)
        from tpufcn.data import prefetch
        src = prefetch(src, depth=4)
    state = trainer.fit(src, max_iter=args.steps)
    if parallel_pipe is not None:
        parallel_pipe.close()
    print(f"trained {int(state.step)} steps")

    det = Detector("vgg_detectnet_train", dtype=jnp.bfloat16,
                   max_candidates=128,
                   model_kwargs={"num_classes": args.classes})
    det.params = state.params

    out_dir = os.path.join(args.out, "detections")
    os.makedirs(out_dir, exist_ok=True)
    test_pipe = CompositeTrainPipeline(samples, grid,
                                       DataConfig(batch_size=8),
                                       box_capacity=4, seed=99)
    batch = test_pipe.batch(8)
    results = det(batch["image"])
    for i, dets in enumerate(results.to_lists()[:4]):
        overlay = draw_detections(
            batch["image"][i], dets,
            names=[f"object{c}" for c in range(args.classes)])
        path = os.path.join(out_dir, f"det{i}.png")
        cv.imwrite(path, overlay)
        print(f"{path}: {len(dets)} detections "
              + str([d[0] for d in dets]))

    # held-out mAP on fresh composite scenes
    from tpufcn.train.evaluate import evaluate_detections
    dets_all, gts = [], []
    res_lists = results.to_lists()
    for i in range(batch["image"].shape[0]):
        items = res_lists[i]
        boxes = np.asarray([b for b, _, _ in items], np.float64).reshape(-1, 4)
        labels = np.asarray([l for _, l, _ in items], np.int64)
        scores = np.asarray([c for _, _, c in items], np.float64)
        dets_all.append((boxes, labels, scores))
        v = batch["valid"][i]
        r = batch["rects"][i][v]
        corners = np.concatenate([r[:, :2], r[:, :2] + r[:, 2:4]], axis=1)
        gts.append((corners, batch["labels"][i][v]))
    ev = evaluate_detections(gts, dets_all,
                             num_classes=args.classes, iou_thresh=0.5)
    print(f"held-out mAP@0.5: {ev['mAP']:.3f} over "
          f"{batch['image'].shape[0]} composite frames")


if __name__ == "__main__":
    main()
