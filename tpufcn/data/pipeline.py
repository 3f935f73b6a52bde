"""Device-prefetch input pipeline.

Replaces the reference's in-solver-loop host Python layer (reference
scripts/data_argumentation_layer/data_argumentation_layer.py:75-124 runs
imread + compositing + label building synchronously inside every Caffe
iteration — the known bottleneck).  Here a background thread builds
batches (imread + compositing + photometric jitter, all uint8) while the
device trains, and the DetectNet grid-label encoding + demean run on
device inside the jitted step (tpufcn/train/step.py).  A bounded queue
provides backpressure; ``prefetch_to_device`` keeps N batches in flight.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional, Sequence

import cv2 as cv
import numpy as np

from tpufcn.core.config import DataConfig, GridConfig
from tpufcn.data.compositor import (
    Compositor, random_augmentation, resize_image_and_rects)
from tpufcn.data.manifest import MaskSample
from tpufcn.data.records import RecordReader


def pad_boxes(rects, labels, capacity: int):
    """Fixed-capacity (rects, labels, valid) padding for static shapes."""
    m = len(rects)
    out_r = np.zeros((capacity, 4), np.float32)
    out_l = np.zeros((capacity,), np.int32)
    out_v = np.zeros((capacity,), bool)
    k = min(m, capacity)
    if k:
        out_r[:k] = np.asarray(rects, np.float32)[:k]
        out_l[:k] = np.asarray(labels, np.int32)[:k]
        out_v[:k] = True
    return out_r, out_l, out_v


class CompositeTrainPipeline:
    """Compositing batch source for detection training.

    Yields host batches {image u8 (B,H,W,3), rects, labels, valid,
    seg i32 (B,H,W)} ready for the jitted train step.
    """

    def __init__(self,
                 samples: Sequence[MaskSample],
                 grid: GridConfig,
                 data_cfg: Optional[DataConfig] = None,
                 backgrounds: Optional[Sequence[str]] = None,
                 box_capacity: int = 8,
                 imread=cv.imread,
                 seed: int = 0):
        self.cfg = data_cfg or DataConfig()
        self.grid = grid
        self.box_capacity = box_capacity
        # Decode-once cache for background frames: the reference re-imreads
        # the background every iteration (data_argumentation_layer.py:86) —
        # measured ~20% of host compositing time here.  Consumers only read
        # (the compositor copies before pasting), so sharing the decoded
        # array is safe.
        import functools
        self.imread = functools.lru_cache(maxsize=64)(lambda p: imread(p))
        self.samples = list(samples)
        self.backgrounds = list(backgrounds or [])
        self.compositor = Compositor(
            self.samples,
            iou_thresh=self.cfg.compose_iou_thresh,
            max_trials=self.cfg.compose_max_trials,
            scale_range=self.cfg.scale_range,
            imread=imread)
        self.rng = np.random.default_rng(seed)

    def _background(self) -> np.ndarray:
        """Random half-crop of a background frame (reference
        data_argumentation_layer.py:86-96); falls back to a dataset image
        when no backgrounds are configured."""
        rng = self.rng
        if self.backgrounds:
            path = self.backgrounds[int(rng.integers(0, len(self.backgrounds)))]
        else:
            s = self.samples[int(rng.integers(0, len(self.samples)))]
            path = s.image_path
        img = self.imread(path)
        if img is None:
            raise FileNotFoundError(path)
        h, w = img.shape[0] // 2, img.shape[1] // 2
        x = int(rng.integers(0, max(w, 1)))
        y = int(rng.integers(0, max(h, 1)))
        x = min(x, img.shape[1] - w)
        y = min(y, img.shape[0] - h)
        return img[y:y + h, x:x + w]

    def sample_scene(self):
        bg = self._background()
        num = int(self.rng.integers(self.cfg.num_compose[0],
                                    self.cfg.num_compose[1] + 1))
        scene = self.compositor.compose(num, bg, self.rng)
        img, rects, label_map = random_augmentation(
            scene.image, [list(r) for r in scene.rects], self.rng,
            label_map=scene.mask,
            enable_zoom=len(scene.rects) == 1,
            rotate=self.cfg.rotate)
        img, rects = resize_image_and_rects(
            img, rects, (self.grid.im_width, self.grid.im_height))
        if label_map is None:
            label_map = np.zeros(img.shape[:2], np.uint8)
        seg = cv.resize(label_map, (self.grid.im_width, self.grid.im_height),
                        interpolation=cv.INTER_NEAREST)
        return img, rects, scene.labels[:len(rects)], seg

    def batch(self, batch_size: int) -> Dict[str, np.ndarray]:
        H, W = self.grid.im_height, self.grid.im_width
        images = np.zeros((batch_size, H, W, 3), np.uint8)
        rects = np.zeros((batch_size, self.box_capacity, 4), np.float32)
        labels = np.zeros((batch_size, self.box_capacity), np.int32)
        valid = np.zeros((batch_size, self.box_capacity), bool)
        seg = np.zeros((batch_size, H, W), np.int32)
        for i in range(batch_size):
            img, r, l, m = self.sample_scene()
            images[i] = img
            rects[i], labels[i], valid[i] = pad_boxes(r, l, self.box_capacity)
            seg[i] = m
        return {"image": images, "rects": rects, "labels": labels,
                "valid": valid, "seg": seg}

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        while True:
            yield self.batch(self.cfg.batch_size)


class RecordTrainPipeline:
    """Batch source over pre-built record shards (no compositing)."""

    def __init__(self, prefix: str, grid: GridConfig,
                 batch_size: int = 32, box_capacity: int = 8, seed: int = 0):
        self.reader = RecordReader(prefix)
        self.grid = grid
        self.batch_size = batch_size
        self.box_capacity = box_capacity
        self.rng = np.random.default_rng(seed)
        # shards written with `records --background` store 1-based ids
        # (the labelmap sidecar records the shift); the pipeline yields
        # 0-based OBJECT ids — the train step applies any background
        # shift itself per the model's head contract (label_offset), so
        # stored-shifted labels must be un-shifted here or they'd be
        # shifted twice
        self._label_base = 0
        import json
        import os
        sidecar = prefix + ".labelmap.json"
        if os.path.isfile(sidecar):
            with open(sidecar) as f:
                meta = json.load(f)
            if isinstance(meta, dict) and meta.get("add_background"):
                self._label_base = 1

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        H, W = self.grid.im_height, self.grid.im_width
        order = self.rng.permutation(len(self.reader))
        pos = 0
        while True:
            images = np.zeros((self.batch_size, H, W, 3), np.uint8)
            rects = np.zeros((self.batch_size, self.box_capacity, 4), np.float32)
            labels = np.zeros((self.batch_size, self.box_capacity), np.int32)
            valid = np.zeros((self.batch_size, self.box_capacity), bool)
            for i in range(self.batch_size):
                if pos >= len(order):
                    order = self.rng.permutation(len(self.reader))
                    pos = 0
                rec = self.reader.read(int(order[pos]))
                pos += 1
                img = rec["image"]
                r = rec["rects"].astype(np.float32)
                sy, sx = H / img.shape[0], W / img.shape[1]
                r = r * np.array([sx, sy, sx, sy], np.float32)
                images[i] = cv.resize(img, (W, H))
                rects[i], labels[i], valid[i] = pad_boxes(
                    r, rec["labels"] - self._label_base,
                    self.box_capacity)
            yield {"image": images, "rects": rects, "labels": labels,
                   "valid": valid}


class DeviceBatchCache:
    """Device-resident epoch cache: stack N host batches, upload ONCE,
    then yield the same stacked device batch forever.

    On hosts where batch building or host->device transfer cannot keep
    up with the device (1-core hosts, remote-TPU tunnels with ~40 ms
    per-dispatch RTT), ``Trainer.fit`` re-uploads every dispatch.  This
    cache is the epoch-training analog of the reference's RAM-resident
    LMDB (reference models/train_val.prototxt:8-26 DataLayer streams a
    fixed dataset every epoch): compose ``n_batches`` scenes once, keep
    them in HBM, and let every dispatch consume them with zero host
    work.  Construct the ``Trainer`` with
    ``steps_per_dispatch=n_batches`` and feed ``iter(cache)`` to
    ``fit`` — the pre-stacked (N, B, ...) device batch is detected and
    dispatched directly.
    """

    def __init__(self, put: Callable[[Dict[str, np.ndarray]], Dict],
                 source: Iterator[Dict[str, np.ndarray]],
                 n_batches: int):
        import inspect
        from tpufcn.train.step import stack_batches
        self.n_batches = n_batches
        stacked = stack_batches([next(source) for _ in range(n_batches)])
        # Trainer.put takes stacked=: replicate the leading steps axis on
        # a mesh.  Feature-detect by signature — catching TypeError would
        # mask genuine TypeErrors raised inside put itself.
        try:
            takes_stacked = "stacked" in inspect.signature(put).parameters
        except (TypeError, ValueError):
            takes_stacked = False
        self.batch = put(stacked, stacked=True) if takes_stacked \
            else put(stacked)

    def __iter__(self):
        while True:
            yield self.batch


def prefetch(source: Iterator, depth: int = 2,
             transform: Optional[Callable] = None) -> Iterator:
    """Run ``source`` in a daemon thread with a bounded queue.

    ``transform`` (e.g. device_put with shardings) is applied on the
    consumer side so device transfer overlaps the next host batch build.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()
    _END = object()

    def _put(item) -> bool:
        # bounded put that keeps observing ``stop`` (a plain q.put on a
        # full queue never wakes once the consumer exits)
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in source:
                if stop.is_set():
                    return
                if not _put(item):
                    return
        except BaseException as e:   # propagate, don't fake end-of-data
            _put(e)
        else:
            _put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield transform(item) if transform else item
    finally:
        stop.set()
