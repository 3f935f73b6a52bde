"""In-training validation: the Caffe TEST-phase analog.

The reference's solver carries ``test_iter`` / ``test_interval`` knobs
(reference train/bounding_box/solver.prototxt:6-7) and every train_val
prototxt defines TEST-phase nets (reference models/train_val.prototxt:
8-26, train/bounding_box/train_val.prototxt:31): the engine scores a
held-out net at a step cadence during training.  tpufcn's equivalent is
a ``validator`` callable — ``params -> {metric: float}`` — that
``Trainer.fit`` runs at ``cfg.eval_every`` boundaries, logging the
results into the metrics history and retaining the best-scoring
checkpoint in ``<snapshot_dir>/best`` (beyond the reference: Caffe kept
only cadence snapshots and test-phase scores scrolled by in the log).

This module provides the validators for the two head families —
detection mAP under the FULL serving pipeline (preprocess -> forward ->
decode -> NMS -> rescale, the chain at reference
scripts/fcn_object_detector.py:337-394) and segmentation mean-IoU —
plus held-out-set builders for record shards and manifests.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

Validator = Callable[[object], Dict[str, float]]


def score_detection(det, images: np.ndarray, gts,
                    num_classes: int, chunk: int = 32,
                    iou_thresh: float = 0.5) -> Tuple[float, int]:
    """mAP@``iou_thresh`` of a constructed Detector over ``images``
    (N, H, W, 3) vs ``gts`` [per image (corner boxes, labels)]; also
    returns the total detection count (gate/validation power
    diagnostic).  The trailing chunk is padded to ``chunk`` so every
    dispatch reuses one compiled shape (CLAUDE.md: fixed-capacity
    shapes avoid the multi-minute recompiles on this host)."""
    from tpufcn.train.evaluate import evaluate_detections

    dets_all: List[Tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    n_det = 0
    n = images.shape[0]
    for i in range(0, n, chunk):
        block = images[i:i + chunk]
        pad = chunk - block.shape[0]
        if pad:
            block = np.concatenate([block, np.repeat(block[-1:], pad, 0)])
        for items in det(block).to_lists()[:chunk - pad or chunk]:
            boxes = np.asarray([b for b, _, _ in items],
                               np.float64).reshape(-1, 4)
            labels = np.asarray([l for _, l, _ in items], np.int64)
            scores = np.asarray([c for _, _, c in items], np.float64)
            dets_all.append((boxes, labels, scores))
            n_det += len(items)
    ev = evaluate_detections(gts, dets_all, num_classes=num_classes,
                             iou_thresh=iou_thresh)
    return float(ev["mAP"]), n_det


def detection_validator(model_name: str,
                        images: np.ndarray,
                        gts: Sequence[Tuple[np.ndarray, np.ndarray]],
                        model_kwargs: Optional[dict] = None,
                        chunk: int = 32,
                        iou_thresh: float = 0.5,
                        max_candidates: int = 128) -> Validator:
    """Validator: held-out mAP under the full serving pipeline.

    ``gts``: per image (corner boxes, labels) with labels 0-based
    FOREGROUND ids (the Detector's output convention for every family,
    background-channel models included).  The Detector is built lazily
    on the first call so constructing the validator costs nothing.
    """
    state = {}

    def validate(params) -> Dict[str, float]:
        if "det" not in state:
            from tpufcn.serve.detector import Detector
            state["det"] = Detector(model_name,
                                    max_candidates=max_candidates,
                                    model_kwargs=dict(model_kwargs or {}))
        det = state["det"]
        det.params = params
        m, n_det = score_detection(det, images, gts, det.num_fg,
                                   chunk=chunk, iou_thresh=iou_thresh)
        return {"mAP": round(m, 4), "n_det": n_det}

    return validate


def seg_validator(model_name: str,
                  images: np.ndarray,
                  masks: np.ndarray,
                  num_classes: Optional[int] = None,
                  model_kwargs: Optional[dict] = None,
                  chunk: int = 32) -> Validator:
    """Validator: held-out mean-IoU / pixel accuracy for the seg
    families.  ``masks``: (N, H, W) int label maps, class 0 background
    (compositor convention: mask pixel = label + 1)."""
    state = {}

    def validate(params) -> Dict[str, float]:
        if "fwd" not in state:
            import jax
            import jax.numpy as jnp
            from tpufcn.models import build, get_spec
            from tpufcn.serve.detector import _preprocess
            spec = get_spec(model_name)
            model = build(model_name, **dict(model_kwargs or {}))
            hw = (spec.grid.im_height, spec.grid.im_width)

            @jax.jit
            def fwd(p, x):
                x = _preprocess(jnp.asarray(x), spec.preprocessing, hw)
                return jnp.argmax(model.apply(p, x)["seg"], axis=-1)

            state["fwd"] = fwd
            state["C"] = num_classes or spec.grid.num_classes
        from tpufcn.train.evaluate import evaluate_segmentation
        preds = []
        n = images.shape[0]
        for i in range(0, n, chunk):
            block = images[i:i + chunk]
            pad = chunk - block.shape[0]
            if pad:
                block = np.concatenate([block,
                                        np.repeat(block[-1:], pad, 0)])
            p = np.asarray(state["fwd"](params, block))
            preds.append(p[:chunk - pad or chunk])
        res = evaluate_segmentation(list(masks),
                                    list(np.concatenate(preds)),
                                    num_classes=state["C"])
        return {"mIoU": round(float(res["mean_iou"]), 4),
                "pixel_accuracy": round(float(res["pixel_accuracy"]), 4)}

    return validate


def _resize_with_boxes(img: np.ndarray, rects_xywh: np.ndarray,
                       hw: Tuple[int, int]):
    """Resize to net geometry, scaling xywh rects -> corner boxes (so a
    whole val set batches as ONE fixed shape; mAP is scale-invariant
    when GT and image scale together)."""
    import cv2 as cv
    H, W = hw
    sy, sx = H / img.shape[0], W / img.shape[1]
    out = cv.resize(img, (W, H))
    r = np.asarray(rects_xywh, np.float64).reshape(-1, 4)
    corners = np.stack([r[:, 0] * sx, r[:, 1] * sy,
                        (r[:, 0] + r[:, 2]) * sx,
                        (r[:, 1] + r[:, 3]) * sy], axis=1)
    return out, corners


def val_set_from_records(prefix: str, hw: Tuple[int, int],
                         limit: Optional[int] = None):
    """Held-out detection set from record shards (C8 storage):
    -> (images (N, H, W, 3) u8, gts [per image (corners, labels)])."""
    from tpufcn.data.records import RecordReader
    r = RecordReader(prefix)
    n = len(r) if limit is None else min(limit, len(r))
    images, gts = [], []
    for i in range(n):
        rec = r.read(i)
        img, corners = _resize_with_boxes(rec["image"], rec["rects"], hw)
        images.append(img)
        gts.append((corners, np.asarray(rec["labels"], np.int64)))
    r.close()
    return np.stack(images), gts


def _samples_to_val_set(samples, hw: Tuple[int, int], src: str):
    import cv2 as cv
    images, gts = [], []
    for s in samples:
        img = cv.imread(s.image_path)
        if img is None:
            continue
        img, corners = _resize_with_boxes(img, s.rects, hw)
        images.append(img)
        gts.append((corners, np.asarray(s.labels, np.int64)))
    if not images:
        raise ValueError(f"no readable images in {src}")
    return np.stack(images), gts


def val_set_from_manifest(path: str, hw: Tuple[int, int],
                          limit: Optional[int] = None):
    """Held-out detection set from a ``path x y w h label`` manifest
    (1-based labels, the reference train.txt convention)."""
    from tpufcn.data.manifest import read_detection_manifest
    samples = read_detection_manifest(path)
    return _samples_to_val_set(samples[:limit], hw, path)


def val_set_from_voc(path: str, hw: Tuple[int, int],
                     limit: Optional[int] = None):
    """Held-out detection set from a VOC converter manifest (the
    comma-grouped multi-box format, 0-based labels — `cli voc`
    output)."""
    from tpufcn.data.manifest import read_voc_manifest
    samples = read_voc_manifest(path)
    return _samples_to_val_set(samples[:limit], hw, path)


def seg_val_set_from_manifest(path: str, hw: Tuple[int, int],
                              limit: Optional[int] = None,
                              label_map: Optional[dict] = None):
    """Held-out seg set from a mask manifest (``img mask label x y w h``
    stride-2 records): -> (images (N,H,W,3) u8, masks (N,H,W) i32 with
    mask pixel = class id, 0 background)."""
    import cv2 as cv
    from tpufcn.data.manifest import read_mask_manifest
    samples = read_mask_manifest(path, background_offset=1,
                                 label_map=label_map)
    if limit is not None:
        samples = samples[:limit]
    H, W = hw
    images, masks = [], []
    for s in samples:
        img = cv.imread(s.image_path)
        msk = cv.imread(s.mask_path, cv.IMREAD_GRAYSCALE)
        if img is None or msk is None:
            continue
        images.append(cv.resize(img, (W, H)))
        m = cv.resize(msk, (W, H), interpolation=cv.INTER_NEAREST)
        masks.append(np.where(m > 0, s.label, 0).astype(np.int32))
    if not images:
        raise ValueError(f"no readable image/mask pairs in {path}")
    return np.stack(images), np.stack(masks)
