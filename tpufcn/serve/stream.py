"""Stream nodes: the reference's ROS nodes on the tpufcn topic bus.

``DetectorNode`` mirrors ``FCNObjectDetector`` (reference
scripts/fcn_object_detector.py): subscribes ``image`` (drop-oldest
queue sized to the micro-batch — 1 in the default single-frame mode, so
only the freshest frame is kept; ``micro_batch=N`` buffers N frames and
runs one jitted dispatch per batch), runs the single-dispatch TPU
pipeline, publishes corner
rects on ``/fcn_object_detector/rects`` and a mono8 probability map on
``/fcn_object_detector/pmap`` — the same topic contract as the launch
file (reference launch/fcn_object_detector.launch:2-23).

Two inference modes, as the reference's two callbacks:
  * "boxes"  — run_detector (:54-174): full-frame grid decode + NMS;
  * "tiled"  — run_detector2 (:178-303): stride^2 sub-window tiles + a
    center crop, batch-forwarded, per-class score maps stitched into a
    full-frame pmap with bitwise-OR, boxes from the largest contour of
    each tile map (host OpenCV, as the reference).
"""

from __future__ import annotations

import dataclasses
import time
from collections import deque
from typing import Any, List, Optional, Sequence, Tuple

import cv2 as cv
import jax
import jax.numpy as jnp
import numpy as np

from tpufcn.core.config import DetectorConfig
from tpufcn.serve.bus import Message, TopicBus
from tpufcn.serve.detector import DetectionResult, Detector


@dataclasses.dataclass
class RectsMsg:
    """Polygon-of-corners message (the reference publishes PolygonStamped
    with alternating top-left/bottom-right points, fcn_object_detector.py:154-166)."""
    points: List[Tuple[float, float]]
    labels: List[int]
    confidences: List[float]


def detection_window_rois(image: np.ndarray, stride: int = 1):
    """Reference ``detection_window_roi`` (:254-277): stride^2 tiles plus
    a centre crop; returns (rois as (x, y, w, h) int arrays)."""
    im_y, im_x = image.shape[:2]
    w, h = im_x // stride, im_y // stride
    rects = [np.array([i * w, j * h, w, h])
             for j in range(stride) for i in range(stride)]
    cx, cy = im_x // 2 - w // 2, im_y // 2 - h // 2
    rects.append(np.array([cx, cy, w, h]))
    return rects


def create_mask_labels(feat_u8: np.ndarray) -> Optional[Tuple[int, int, int, int]]:
    """Largest-contour bounding rect (reference :279-303)."""
    im = (feat_u8 > 0).astype(np.uint8) * 255
    contours, _ = cv.findContours(im, cv.RETR_CCOMP,
                                  cv.CHAIN_APPROX_SIMPLE)[-2:]
    if not contours:
        return None
    biggest = max(contours, key=cv.contourArea)
    if cv.contourArea(biggest) <= 0:
        # reference scan ('max_area < a') keeps index -1 for all
        # zero-area contours and emits nothing (:289-296)
        return None
    return cv.boundingRect(biggest)


class TiledSegmenter:
    """run_detector2-equivalent over a segmentation model family."""

    def __init__(self, model_name: str = "fcn32s_seg",
                 params: Optional[Any] = None,
                 prob_thresh: float = 0.5,
                 stride: int = 1,
                 padding: int = 10,
                 dtype=jnp.bfloat16):
        from tpufcn.models import build, get_spec
        self.spec = get_spec(model_name)
        self.model = build(model_name, dtype=dtype)
        self.grid = self.spec.grid
        self.prob_thresh = prob_thresh
        self.stride = stride
        self.padding = padding
        if params is None:
            x0 = jnp.zeros((1, self.grid.im_height, self.grid.im_width, 3),
                           jnp.float32)
            params = jax.jit(self.model.init)(jax.random.key(0), x0)
        self.params = params
        self._fwd = jax.jit(self._fwd_impl)

    def _fwd_impl(self, params, tiles):
        x = tiles.astype(jnp.float32)
        if tiles.shape[1:3] != (self.grid.im_height, self.grid.im_width):
            x = jax.image.resize(
                x, (tiles.shape[0], self.grid.im_height,
                    self.grid.im_width, 3), method="linear")
        out = self.model.apply(params, x)
        score = out.get("score", out.get("coverage"))
        score = jnp.where(score < self.prob_thresh, 0.0, score)
        return score                      # (T, gh, gw, C)

    def __call__(self, frame_bgr: np.ndarray):
        """Returns (pmap uint8 full-frame, [(rect, class)] boxes)."""
        img = _demean_host(frame_bgr)
        rois = detection_window_rois(img, self.stride)
        tiles = np.stack([
            cv.resize(img[y:y + h, x:x + w],
                      (self.grid.im_width, self.grid.im_height))
            for x, y, w, h in rois])
        score = np.asarray(self._fwd(self.params, jnp.asarray(tiles)))

        pmap = np.zeros(frame_bgr.shape[:2], np.uint8)
        boxes = []
        pad = self.padding
        for smap, rect in zip(score, rois):
            x, y, w, h = [int(v) for v in rect]
            for cls in range(1, smap.shape[-1]):
                # resize the FLOAT map, cast after (reference order:
                # fcn_object_detector.py resizes prob maps pre-cast)
                feat = cv.resize(smap[..., cls].astype(np.float32), (w, h))
                feat = (feat * 255).astype(np.uint8)
                pmap[y:y + h, x:x + w] |= feat
                r = create_mask_labels(feat)
                if r is not None:
                    bx = [r[0] + x - pad, r[1] + y - pad,
                          r[2] + 2 * pad, r[3] + 2 * pad]
                    boxes.append((bx, cls))
        return pmap, boxes


def _demean_host(img: np.ndarray) -> np.ndarray:
    """Host copy of the demean+minmax preprocessing for the tiled path
    (the tiles are cropped before resize, matching reference order)."""
    from tpufcn.core.config import IMAGENET_BGR_MEAN
    x = img.astype(np.float32)
    x -= np.asarray(IMAGENET_BGR_MEAN, np.float32)
    span = x.max() - x.min()
    # constant tile -> zeros, not NaN (black frames happen on real buses)
    return (x - x.min()) / (span if span > 0 else np.float32(1.0))


class DetectorNode:
    """The detector stream node on a TopicBus."""

    def __init__(self,
                 bus: TopicBus,
                 detector: Optional[Detector] = None,
                 mode: str = "boxes",
                 image_topic: str = "image",
                 rects_topic: str = "/fcn_object_detector/rects",
                 pmap_topic: str = "/fcn_object_detector/pmap",
                 tiled: Optional[TiledSegmenter] = None,
                 publish_rects: bool = True,
                 names: Optional[Sequence[str]] = None,
                 overlay_topic: Optional[str] = None,
                 micro_batch: int = 1,
                 flush_after_ms: Optional[float] = None,
                 timer=None):
        # names: per-class display names from a label manifest
        # (reference rosparam ~manifest -> load_label_manifest,
        # fcn_object_detector.py:44-45,441-461; absent classes fall back
        # to "object_<i>" like the reference).  overlay_topic: publish
        # the reference's class-colored alpha-blended overlay
        # (fcn_object_detector.py:141-170) — the reference cv.imshows it;
        # tpufcn publishes the rendered frame on the bus instead
        # (GUI-less, PARITY.md deviation conventions).
        self.bus = bus
        self.mode = mode
        self.names = list(names) if names else None
        self.overlay_topic = overlay_topic
        # tiled mode never touches the box detector — don't pay its
        # model init/compile just to hold a dead reference
        self.detector = detector if (detector is not None
                                     or mode == "tiled") else Detector()
        self.tiled = tiled
        self.rects_topic = rects_topic
        self.pmap_topic = pmap_topic
        self.publish_rects = publish_rects
        self.timer = timer   # optional tpufcn.utils.StageTimer
        # micro_batch > 1: production serving shape — buffer frames and
        # run ONE jitted dispatch per micro-batch (the measured-fast
        # configuration of replay_throughput / BASELINE config #2),
        # publishing per-frame rects with their ORIGINAL stamps.  Call
        # flush() at stream end; a partial batch pads by repeating the
        # last frame (one compiled shape) and the pad outputs are
        # discarded.  Boxes mode only.
        self.micro_batch = max(1, int(micro_batch))
        # flush_after_ms: max STALENESS of a buffered frame.  Without
        # it a part-filled micro-batch waits for the batch to fill —
        # on a camera slower than the fill rate, frames would wait
        # unboundedly, against the reference's freshest-frame stance
        # (queue_size=1, reference scripts/fcn_object_detector.py:49-50).
        # The deadline is checked when frames arrive AND from a bus
        # spin hook, so a silent stream still flushes.
        self.flush_after_ms = flush_after_ms
        self._pending: List[Tuple[np.ndarray, float]] = []
        self._buffered_at: List[float] = []   # monotonic arrival times
        # per-frame node latency (buffer -> rects published), ms; bounded
        self.latencies_ms: deque = deque(maxlen=1024)
        self.processed = 0
        # buffer up to a full micro-batch in the subscription queue —
        # with the default drop-oldest queue of 1, frames published
        # faster than spin_once would silently vanish before batching
        bus.subscribe(image_topic, self._callback,
                      queue_size=self.micro_batch)
        if self.flush_after_ms is not None and self.micro_batch > 1:
            bus.add_spin_hook(self._deadline_check)

    def _callback(self, msg: Message):
        if self.timer is not None:
            with self.timer.stage(f"detector/{self.mode}"):
                return self._process(msg)
        return self._process(msg)

    def _process(self, msg: Message):
        frame = msg.data
        if frame is None:
            return
        if self.mode == "tiled":
            assert self.tiled is not None, "tiled mode needs a TiledSegmenter"
            pmap, boxes = self.tiled(frame)
            self.bus.publish(self.pmap_topic, pmap, stamp=msg.stamp)
            if self.publish_rects:
                pts, labels = [], []
                for (x, y, w, h), cls in boxes:
                    pts += [(x, y), (x + w, y + h)]
                    labels.append(cls)
                self.bus.publish(self.rects_topic,
                                 RectsMsg(pts, labels, [0.0] * len(labels)),
                                 stamp=msg.stamp)
        elif self.micro_batch > 1:
            if self._pending and self._pending[0][0].shape != frame.shape:
                self.flush()     # camera geometry changed mid-stream
            self._pending.append((frame, msg.stamp))
            self._buffered_at.append(time.monotonic())
            if (len(self._pending) >= self.micro_batch
                    or self._deadline_exceeded()):
                self._dispatch()
            return               # processed counts at dispatch time
        else:
            t0 = time.monotonic()
            res = self.detector(frame[None])
            self._publish_boxes(frame, res.to_lists()[0], msg.stamp)
            self.latencies_ms.append((time.monotonic() - t0) * 1e3)
        self.processed += 1

    def _deadline_exceeded(self) -> bool:
        return (self.flush_after_ms is not None and self._buffered_at
                and (time.monotonic() - self._buffered_at[0]) * 1e3
                >= self.flush_after_ms)

    def _deadline_check(self):
        """Bus spin hook: flush a part-filled micro-batch whose oldest
        frame is staler than ``flush_after_ms`` even when no new frame
        arrives to trigger the check."""
        if self._pending and self._deadline_exceeded():
            self._dispatch()

    def latency_stats(self) -> dict:
        """Per-frame node latency percentiles (buffer -> rects
        published), over the last ≤1024 frames."""
        if not self.latencies_ms:
            return {"frames": 0}
        v = np.asarray(self.latencies_ms)
        return {"frames": int(v.size),
                "p50_ms": float(np.percentile(v, 50)),
                "p90_ms": float(np.percentile(v, 90)),
                "p99_ms": float(np.percentile(v, 99)),
                "max_ms": float(v.max())}

    def _publish_boxes(self, frame, dets, stamp: float):
        if self.publish_rects:
            pts = [p for box, _, _ in dets
                   for p in ((box[0], box[1]), (box[2], box[3]))]
            labels = [l for _, l, _ in dets]
            confs = [c for _, _, c in dets]
            self.bus.publish(self.rects_topic,
                             RectsMsg(pts, labels, confs), stamp=stamp)
        if self.overlay_topic:
            from tpufcn.serve.viz import draw_detections
            self.bus.publish(self.overlay_topic,
                             draw_detections(frame, dets, self.names),
                             stamp=stamp)

    def _dispatch(self):
        # chunk at micro_batch: after a failed dispatch restores its
        # frames, _pending can exceed one batch — never stack a larger
        # (newly compiled) shape
        while self._pending:
            pending = self._pending[:self.micro_batch]
            self._pending = self._pending[self.micro_batch:]
            buffered = self._buffered_at[:self.micro_batch]
            self._buffered_at = self._buffered_at[self.micro_batch:]
            n = len(pending)
            stack = np.stack([f for f, _ in pending])
            if n < self.micro_batch:
                # pad to the one compiled batch shape; discard pad outputs
                stack = np.concatenate(
                    [stack, np.repeat(stack[-1:], self.micro_batch - n,
                                      axis=0)])
            try:
                lists = self.detector(stack).to_lists()
            except Exception:
                # a failed dispatch (device error, bad frame) must not
                # eat the buffered frames: restore them so a later
                # dispatch / flush can retry, and surface the error
                self._pending = pending + self._pending
                self._buffered_at = buffered + self._buffered_at
                raise
            done = time.monotonic()
            for (frame, stamp), dets, t0 in zip(pending, lists[:n],
                                                buffered):
                self._publish_boxes(frame, dets, stamp)
                self.latencies_ms.append((done - t0) * 1e3)
            self.processed += n

    def flush(self):
        """Dispatch a buffered partial micro-batch (call at stream end)."""
        if self._pending:
            self._dispatch()


def replay(node: DetectorNode, frames: Sequence[np.ndarray],
           bus: Optional[TopicBus] = None,
           image_topic: str = "image") -> int:
    """Bag-replay driver: publish frames through the bus and spin the
    node after each (the throughput-mode harness of BASELINE config #2)."""
    bus = bus or node.bus
    for i, f in enumerate(frames):
        bus.publish(image_topic, f, stamp=float(i))
        bus.spin_once()
    node.flush()        # no-op unless a micro-batch is part-filled
    return node.processed


def replay_throughput(detector: Detector,
                      frames: Sequence[np.ndarray],
                      micro_batch: int = 32) -> dict:
    """Batched stream throughput: frames grouped into micro-batches
    through the single-dispatch pipeline (the production serving shape of
    the bag-replay mode).  Returns fps and per-frame latency stats."""
    import time
    n = len(frames)
    stack = np.stack(frames)
    micro_batch = min(micro_batch, n)
    # pad the tail to a full micro-batch by repeating the last frame —
    # one compiled batch shape, every real frame processed and counted
    # (silently dropping the tail misreported throughput runs whose
    # length wasn't a multiple of micro_batch)
    pad = (-n) % micro_batch
    if pad:
        stack = np.concatenate([stack, np.repeat(stack[-1:], pad, axis=0)])
    # warm/compile
    _ = np.asarray(detector(stack[:micro_batch]).valid)
    t0 = time.perf_counter()
    results = 0
    for i in range(0, len(stack), micro_batch):
        res = detector(stack[i:i + micro_batch])
        done = int(np.asarray(res.valid).shape[0])
        results += min(done, n - i)        # don't count padding frames
    dt = time.perf_counter() - t0
    return {"frames": results, "seconds": dt,
            "fps": results / dt if dt > 0 else 0.0,
            "ms_per_frame": dt / max(results, 1) * 1e3}
