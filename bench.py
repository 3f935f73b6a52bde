#!/usr/bin/env python3
"""Headline benchmark: 448x448 images/sec/chip for the full fused
inference pipeline (preprocess -> forward -> grid decode ->
groupRectangles NMS -> rescale), matching the BASELINE.md target
(>= 5000 img/s/chip on TPU v5e).

The headline number uses the Caffe-parity flagship (GoogLeNet
DetectNet, faithful LRN/5x5/stride structure) in its serving
configuration: f8e5m2 activation STORAGE for the large stem tensors
(conv1/LRN1/conv2/LRN2 outputs) and the inception concats; all compute
stays bf16 (see models/googlenet.py store_dtype — e5m2 because trained
conv1 activations saturate e4m3, and its bf16-truncation convert is
VPU-cheap).  Accuracy of the mode is tracked below via mAP.
Extras report the exact-bf16 number, the modern-backbone swap
(resnet_fpn_detectnet, BASELINE config #5), single-frame p50 latency,
and a synthetic-dataset mAP tracked for BASELINE.md row 3 — measured
for BOTH the exact and the fp8-serving model so the serving mode's
accuracy parity is on record.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

# On-device scan length per dispatch.  Each DISPATCH pays a fixed
# ~27 ms remote-tunnel round trip that is an artifact of this
# development setup, not of the pipeline: at 20 iters it inflated the
# per-batch wall time by ~0.7 ms (measured 4,995 vs 5,129 img/s
# interleaved).  At 40 iters the wall measurement matches the
# trace-derived device-time sum (24.96 vs 24.9 ms/batch), i.e. it
# reports the true steady-state throughput.
ITERS = 40


def _time_loop(infer, params, frames, iters=ITERS, reps=6):
    """On-device lax.scan loop with a chained data dependency; host-side
    per-dispatch timing is unreliable through the remote-TPU tunnel
    (see CLAUDE.md), so one dispatch covers `iters` full passes and a
    final value fetch forces completion.  Min over reps (each rep is a
    fresh dispatch; more reps only tighten the min against tunnel/system
    noise — within-process spread is <1%, but single dispatches can be
    unlucky)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(p, f):
        def body(c, _):
            out = infer(p, f + c)
            return (out.boxes.sum() % 2).astype(jnp.uint8), None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.uint8), None,
                            length=iters)
        return c

    _ = int(np.asarray(loop(params, frames)))  # compile + warm (value fetch)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = int(np.asarray(loop(params, frames)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _train_synthetic(model_name, grid, root, *, with_seg=False,
                     steps=2000, batch=16, n_cached=25,
                     model_kwargs=None):
    """Shared scaffold for the accuracy trackers: train `model_name` on
    the synthetic compositing dataset with DeviceBatchCache epoch
    training (n_cached batches built+uploaded once, reused from HBM —
    thousands of steps cost seconds of device time instead of minutes
    of 1-core host compositing), then return (state, model, held-out
    seed-99 test batch)."""
    import jax.numpy as jnp
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "examples"))
    from demo import make_dataset
    from tpufcn.core.config import DataConfig, TrainConfig
    from tpufcn.data import CompositeTrainPipeline, DeviceBatchCache
    from tpufcn.models import build
    from tpufcn.train.trainer import Trainer

    rng = np.random.default_rng(0)
    samples = make_dataset(os.path.join(root, "data"), rng)
    cfg = TrainConfig(
        grid=grid, model=model_name,
        data=DataConfig(batch_size=batch),
        optimizer="adam", learning_rate=3e-4,
        lr_decay_step=2500, lr_gamma=0.3,
        max_iter=steps, snapshot_every=0,
        snapshot_dir=os.path.join(root, "snap"), log_every=10**9)
    model = build(model_name, dtype=jnp.bfloat16, **(model_kwargs or {}))
    trainer = Trainer(cfg, model=model, with_seg=with_seg,
                      steps_per_dispatch=n_cached, log_sink=lambda s: None)
    pipe = CompositeTrainPipeline(samples, grid, DataConfig(batch_size=batch),
                                  box_capacity=4, seed=1)
    cache = DeviceBatchCache(trainer.put, iter(pipe), n_batches=n_cached)
    state = trainer.fit(iter(cache), max_iter=steps, resume=False)
    test_pipe = CompositeTrainPipeline(samples, grid,
                                       DataConfig(batch_size=16),
                                       box_capacity=4, seed=99)
    return state, model, test_pipe.batch(16)


def _map_synthetic(steps=2000, batch=16, n_cached=25):
    """Flagship train on the synthetic compositing dataset at the
    deploy geometry (448x448 s16, models/deploy.prototxt:1-7), then
    held-out mAP@0.5 with the exact and fp8-serving detectors.

    Config chosen by sweep: 448x448 reaches mAP@0.5 0.99 at
    2000 steps and drifts DOWN with more epochs over the fixed cache
    (0.95 @ 4000, 0.91 @ 7000); 224x224 plateaus near 0.47."""
    import jax.numpy as jnp
    from tpufcn.core.config import GridConfig
    from tpufcn.serve.detector import Detector
    from tpufcn.train.evaluate import evaluate_detections

    grid = GridConfig(im_width=448, im_height=448, stride=16, num_classes=1)
    state, _, tb = _train_synthetic(
        "googlenet_detectnet_1cls", grid, "/tmp/tpufcn_bench_map",
        steps=steps, batch=batch, n_cached=n_cached)
    gts = []
    for i in range(tb["image"].shape[0]):
        v = tb["valid"][i]
        r = tb["rects"][i][v]
        corners = np.concatenate([r[:, :2], r[:, :2] + r[:, 2:4]], axis=1)
        gts.append((corners, tb["labels"][i][v]))

    maps = {}
    for tag, kw in (("exact", {}),
                    ("fp8", {"store_dtype": jnp.float8_e5m2,
                             "store_blocks": True, "store_stem2": True})):
        det = Detector("googlenet_detectnet_1cls", dtype=jnp.bfloat16,
                       max_candidates=128, model_kwargs=kw)
        det.params = state.params
        res = det(tb["image"]).to_lists()
        dets_all = []
        for items in res:
            boxes = np.asarray([b for b, _, _ in items],
                               np.float64).reshape(-1, 4)
            labels = np.asarray([l for _, l, _ in items], np.int64)
            scores = np.asarray([c for _, _, c in items], np.float64)
            dets_all.append((boxes, labels, scores))
        ev = evaluate_detections(gts, dets_all, num_classes=1,
                                 iou_thresh=0.5)
        maps[tag] = round(float(ev["mAP"]), 4)
    return maps


def _seg_miou_synthetic(steps=2000, batch=16, n_cached=25):
    """FCN-32s seg (C19) trained on the synthetic compositing dataset
    at its 224x224 deploy geometry, scored with held-out mean-IoU —
    the seg-family analog of _map_synthetic (BASELINE.md row 3).
    Measured 0.89 mean-IoU / 0.94 pixel accuracy at 2,000 steps; the
    e5m2-serving model (fcn32s_seg_serving, same trained params) is
    scored alongside so the seg serving mode's accuracy is on record."""
    import jax
    import jax.numpy as jnp
    from tpufcn.core.config import GridConfig
    from tpufcn.models import build
    from tpufcn.ops.image import demean_bgr
    from tpufcn.train.evaluate import evaluate_segmentation

    C = 2  # background + the synthetic object class
    grid = GridConfig(224, 224, stride=16, num_classes=C)
    state, model, tb = _train_synthetic(
        "fcn32s_seg", grid, "/tmp/tpufcn_bench_seg", with_seg=True,
        steps=steps, batch=batch, n_cached=n_cached,
        model_kwargs={"num_classes": C})

    mious = {}
    for tag, m in (("exact", model),
                   ("fp8", build("fcn32s_seg_serving", dtype=jnp.bfloat16,
                                 num_classes=C))):
        @jax.jit
        def seg_fwd(p, x, m=m):
            logits = m.apply(
                p, demean_bgr(jnp.asarray(x, jnp.float32)))["seg"]
            return jnp.argmax(logits, axis=-1)

        preds = np.asarray(seg_fwd(state.params, tb["image"]))
        res = evaluate_segmentation(list(tb["seg"]), list(preds),
                                    num_classes=C)
        mious[tag] = round(float(res["mean_iou"]), 4)
    return mious


def _train_throughput(batch=32, steps_per_dispatch=20, reps=4):
    """Training throughput (fwd + bwd + adam) on the reference
    bounding_box parity geometry — 224x224 stride 8, the config
    `caffe train` ran (reference train/bounding_box/train_val.prototxt:
    14,31; batch 32 is the solver's parity batch, BENCH.md records 128
    as the per-chip optimum).  Methodology matches the serving loop:
    one multi-step dispatch covers `steps_per_dispatch` full train
    steps chained through the carried state, a loss fetch forces
    completion, min over reps."""
    import jax.numpy as jnp
    from tpufcn.core.config import DataConfig, GridConfig, TrainConfig
    from tpufcn.models import build
    from tpufcn.train.trainer import Trainer

    grid = GridConfig(224, 224, stride=8, num_classes=11)
    cfg = TrainConfig(
        grid=grid, model="vgg_detectnet_train",
        data=DataConfig(batch_size=batch),
        optimizer="adam", learning_rate=1e-4,
        max_iter=10 ** 9, snapshot_every=0,
        snapshot_dir="/tmp/tpufcn_bench_train", log_every=10 ** 9)
    model = build("vgg_detectnet_train", dtype=jnp.bfloat16,
                  num_classes=11)
    trainer = Trainer(cfg, model=model,
                      steps_per_dispatch=steps_per_dispatch,
                      log_sink=lambda s: None)
    state = trainer.init_state()

    rng = np.random.default_rng(0)
    one = {
        "image": rng.integers(0, 256, size=(batch, 224, 224, 3)
                              ).astype(np.uint8),
        "rects": np.tile(np.array([40, 40, 120, 120], np.float32),
                         (batch, 4, 1)),
        "labels": np.ones((batch, 4), np.int32),
        "valid": np.tile(np.array([True, False, False, False]),
                         (batch, 1)),
    }
    b = trainer.put({k: np.stack([v] * steps_per_dispatch)
                     for k, v in one.items()}, stacked=True)
    state, m = trainer.step_fn(state, b)       # compile + warm
    _ = float(np.asarray(m["loss_total"][-1]))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        state, m = trainer.step_fn(state, b)
        _ = float(np.asarray(m["loss_total"][-1]))
        best = min(best, (time.perf_counter() - t0) / steps_per_dispatch)
    return batch / best


def _wait_for_backend():
    """Bounded wait for a reachable jax backend before any in-process use.

    The axon TPU tunnel can be down for multi-hour stretches (CLAUDE.md):
    the first jax call then hangs FOREVER in a nanosleep retry loop, which
    would hang the whole benchmark run.  Probe the backend in a subprocess
    with a hard timeout and retry until the self-healing tunnel returns
    (deadline via BENCH_TPU_WAIT_S, default 2 h), keeping stdout clean for
    the single JSON result line."""
    import subprocess
    import sys

    deadline_s = float(os.environ.get("BENCH_TPU_WAIT_S", 7200))
    t0 = time.time()
    while True:
        try:
            out = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].platform)"],
                capture_output=True, timeout=120, text=True)
            if out.returncode == 0:
                return out.stdout.strip()
        except subprocess.TimeoutExpired:
            pass
        waited = time.time() - t0
        if waited > deadline_s:
            raise SystemExit(
                f"bench: jax backend unreachable after {int(waited)}s "
                "(TPU tunnel outage — see CLAUDE.md); raise "
                "BENCH_TPU_WAIT_S to wait longer")
        print(f"bench: backend probe failed ({int(waited)}s elapsed); "
              "TPU tunnel likely down, retrying in 60s", file=sys.stderr)
        time.sleep(60)


def main():
    _wait_for_backend()
    import jax
    import jax.numpy as jnp
    from tpufcn.serve.detector import Detector

    batch = 128
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, size=(batch, 448, 448, 3)).astype(np.uint8))

    # headline: serving configuration (fp8 stem activation storage)
    det = Detector("googlenet_detectnet_serving", dtype=jnp.bfloat16,
                   max_candidates=256)
    dt = _time_loop(det._infer_impl, det.params, frames)
    imgs_per_sec = batch / dt

    # exact bf16 parity configuration
    det_x = Detector("googlenet_detectnet", dtype=jnp.bfloat16,
                     max_candidates=256, params=det.params)
    exact_ips = batch / _time_loop(det_x._infer_impl, det_x.params, frames)

    # single-frame (batch 1) device latency
    lat_ms = _time_loop(det._infer_impl, det.params, frames[:1]) * 1000.0

    # modern-backbone swap (BASELINE config #5)
    det_r = Detector("resnet_fpn_detectnet", dtype=jnp.bfloat16,
                     max_candidates=256,
                     model_kwargs={"store_dtype": jnp.float8_e5m2})
    resnet_ips = batch / _time_loop(det_r._infer_impl, det_r.params, frames)

    # VGG pyramid deploy net (C17, 20-class, 448²) — the reference's
    # heaviest serving graph, tracked at its measured-optimal batch 64
    det_v = Detector("vgg_pyramid_detectnet_serving", dtype=jnp.bfloat16,
                     max_candidates=256)
    vgg_ips = 64 / _time_loop(det_v._infer_impl, det_v.params, frames[:64])
    del det_v

    train_ips = _train_throughput()

    maps = _map_synthetic()
    seg_miou = _seg_miou_synthetic()

    baseline = 5000.0  # BASELINE.md north-star target
    print(json.dumps({
        "metric": "448x448_images_per_sec_per_chip_fwd_decode_nms",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / baseline, 3),
        "extra": {"batch": batch,
                  "mode": "e5m2_activation_storage_stem+blocks",
                  "exact_bf16_img_per_sec": round(exact_ips, 1),
                  "p50_single_frame_ms": round(lat_ms, 3),
                  "resnet_fpn_img_per_sec": round(resnet_ips, 1),
                  "vgg_pyramid_img_per_sec": round(vgg_ips, 1),
                  "train_b32_img_per_sec": round(train_ips, 1),
                  "map_synthetic": maps["exact"],
                  "map_synthetic_fp8": maps["fp8"],
                  "seg_miou_synthetic": seg_miou["exact"],
                  "seg_miou_synthetic_fp8": seg_miou["fp8"],
                  "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    main()
