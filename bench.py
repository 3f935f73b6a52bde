#!/usr/bin/env python3
"""Headline benchmark: 448x448 images/sec/chip for the full fused
inference pipeline (preprocess -> forward -> grid decode ->
groupRectangles NMS -> rescale), matching the BASELINE.md target
(>= 5000 img/s/chip on TPU v5e).

The headline number uses the Caffe-parity flagship (GoogLeNet
DetectNet, faithful LRN/5x5/stride structure).  The modern-backbone
swap (resnet_fpn_detectnet, BASELINE config #5) is also measured and
reported in "extra" — it exceeds the 5k target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from tpufcn.serve.detector import Detector

    batch, iters = 128, 20

    det = Detector("googlenet_detectnet", dtype=jnp.bfloat16,
                   max_candidates=256)
    infer = det._infer_impl

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, size=(batch, 448, 448, 3)).astype(np.uint8))

    # Measurement methodology: host-side per-dispatch timing is unreliable
    # through the remote-TPU tunnel (block_until_ready can return early and
    # each dispatch pays RTT).  Instead the iteration loop runs ON DEVICE
    # via lax.scan with a data dependency chaining iterations, and a final
    # scalar host fetch forces completion — one dispatch, `iters` full
    # pipeline passes, nothing can be elided.
    @jax.jit
    def loop(params, f):
        def body(carry, _):
            out = infer(params, f + carry)
            return (out.boxes.sum() % 2).astype(jnp.uint8), None
        carry, _ = jax.lax.scan(body, jnp.zeros((), jnp.uint8), None,
                                length=iters)
        return carry

    _ = int(np.asarray(loop(det.params, frames)))  # compile + warm
    t0 = time.perf_counter()
    _ = int(np.asarray(loop(det.params, frames)))
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * iters / dt
    p50_ms = dt / iters / batch * 1000.0  # per-frame amortized

    # single-frame (batch 1) device latency, same on-device-loop method
    one = frames[:1]

    @jax.jit
    def loop1(params, f):
        def body(carry, _):
            out = infer(params, f + carry)
            return (out.boxes.sum() % 2).astype(jnp.uint8), None
        carry, _ = jax.lax.scan(body, jnp.zeros((), jnp.uint8), None,
                                length=iters)
        return carry

    _ = int(np.asarray(loop1(det.params, one)))
    t0 = time.perf_counter()
    _ = int(np.asarray(loop1(det.params, one)))
    lat_ms = (time.perf_counter() - t0) / iters * 1000.0

    # modern-backbone swap (BASELINE config #5)
    det_r = Detector("resnet_fpn_detectnet", dtype=jnp.bfloat16,
                     max_candidates=256)
    infer_r = det_r._infer_impl

    @jax.jit
    def loop_r(params, f):
        def body(carry, _):
            out = infer_r(params, f + carry)
            return (out.boxes.sum() % 2).astype(jnp.uint8), None
        carry, _ = jax.lax.scan(body, jnp.zeros((), jnp.uint8), None,
                                length=iters)
        return carry

    _ = int(np.asarray(loop_r(det_r.params, frames)))
    t0 = time.perf_counter()
    _ = int(np.asarray(loop_r(det_r.params, frames)))
    resnet_ips = batch * iters / (time.perf_counter() - t0)

    baseline = 5000.0  # BASELINE.md north-star target
    print(json.dumps({
        "metric": "448x448_images_per_sec_per_chip_fwd_decode_nms",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / baseline, 3),
        "extra": {"batch": batch, "amortized_ms_per_frame": round(p50_ms, 4),
                  "p50_single_frame_ms": round(lat_ms, 3),
                  "resnet_fpn_img_per_sec": round(resnet_ips, 1),
                  "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    main()
