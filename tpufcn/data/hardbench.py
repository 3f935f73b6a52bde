"""Hard synthetic detection benchmark: the tracked accuracy-gate dataset.

Round 2's tracked gate (examples/demo.py ``make_dataset``: one texture
family per class on flat noise, no distractors, no occlusion) saturated
at mAP 1.0 — a gate pinned at the ceiling cannot trend and cannot catch
the regression class the fp8 work itself documented (BENCH.md
fused-1x1 heads: output-parity clean, trained mAP 0.995 -> 0.879).
This module generates a deliberately harder — still fully synthetic,
deterministic, and dependency-free — scene family targeting a
0.6-0.9 mAP gate regime:

* >= 4 object classes defined by a shape x texture CONJUNCTION
  (rect+checker, ellipse+rings, rect+stripes, triangle+speckle):
  texture alone or shape alone does not identify the class;
* cluttered backgrounds: low-frequency color fields carrying UNLABELED
  distractor shapes drawn from the MISMATCHED shape/texture pairings —
  hard negatives that punish texture-only or shape-only detectors;
* partial occlusion: compositing accepts paste overlap up to scaled
  IoU 0.30 (the easy gate rejected at 0.05), so later pastes occlude
  earlier ones while ground truth keeps the full box;
* ~8x object scale range: 32..88 px sources, 0.7-1.8x paste rescale,
  ~2x background-crop-to-net upscale.

The detection semantics being gated are the reference's decode + NMS
chain (reference scripts/fcn_object_detector.py:337-394); the gate
harness that trains/scores each model family on these scenes lives in
tpufcn/train/gates.py.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import cv2 as cv
import numpy as np

from tpufcn.core.config import DataConfig, GridConfig
from tpufcn.data.manifest import MaskSample
from tpufcn.data.pipeline import CompositeTrainPipeline

# shape x texture pairings; the first `classes` entries are the labeled
# classes, every OTHER pairing is eligible as an unlabeled distractor
SHAPES = ("rect", "ellipse", "triangle")
TEXTURES = ("checker", "rings", "stripes", "speckle")
CLASS_DEFS: Tuple[Tuple[str, str], ...] = (
    ("rect", "checker"),
    ("ellipse", "rings"),
    ("rect", "stripes"),
    ("triangle", "speckle"),
    ("triangle", "rings"),
    ("ellipse", "stripes"),
)


def distractor_defs(classes: int) -> List[Tuple[str, str]]:
    """All shape/texture pairings NOT used by the first ``classes``
    classes — each reuses a class's shape or texture but never both,
    so only the conjunction separates them from real objects."""
    used = set(CLASS_DEFS[:classes])
    return [(s, t) for s in SHAPES for t in TEXTURES
            if (s, t) not in used]


def _two_colors(rng: np.random.Generator) -> Tuple[np.ndarray, np.ndarray]:
    """Two well-separated random BGR colors (per-instance variation)."""
    hsv = np.zeros((1, 2, 3), np.uint8)
    h0 = int(rng.integers(0, 180))
    hsv[0, 0] = (h0, int(rng.integers(120, 256)), int(rng.integers(120, 256)))
    hsv[0, 1] = ((h0 + int(rng.integers(40, 140))) % 180,
                 int(rng.integers(120, 256)), int(rng.integers(60, 200)))
    bgr = cv.cvtColor(hsv, cv.COLOR_HSV2BGR)[0]
    return bgr[0].astype(np.float32), bgr[1].astype(np.float32)


def render_texture(kind: str, h: int, w: int,
                   rng: np.random.Generator) -> np.ndarray:
    """(h, w, 3) uint8 texture patch with per-instance color/period."""
    c1, c2 = _two_colors(rng)
    gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
    p = float(rng.integers(5, 13))
    if kind == "checker":
        sel = ((gx // p).astype(int) + (gy // p).astype(int)) % 2
    elif kind == "rings":
        d = np.hypot(gx - w / 2.0, gy - h / 2.0)
        sel = (d // p).astype(int) % 2
    elif kind == "stripes":
        sel = ((gx + gy) // p).astype(int) % 2
    elif kind == "speckle":
        dots = (rng.random((h, w)) < 0.10).astype(np.uint8)
        sel = cv.dilate(dots, np.ones((2, 2), np.uint8)).astype(int)
    else:
        raise ValueError(f"unknown texture '{kind}'")
    img = np.where(sel[..., None] > 0, c2, c1)
    img += rng.normal(0.0, 6.0, size=img.shape).astype(np.float32)
    return np.clip(img, 0, 255).astype(np.uint8)


def render_shape_mask(kind: str, h: int, w: int,
                      rng: np.random.Generator) -> np.ndarray:
    """(h, w) uint8 {0, 255} mask of the shape, filling the patch."""
    m = np.zeros((h, w), np.uint8)
    if kind == "rect":
        m[:] = 255
    elif kind == "ellipse":
        cv.ellipse(m, (w // 2, h // 2), (w // 2 - 1, h // 2 - 1),
                   0, 0, 360, 255, -1)
    elif kind == "triangle":
        jx = int(rng.integers(-w // 6, w // 6 + 1))
        pts = np.array([[w // 2 + jx, 0], [0, h - 1], [w - 1, h - 1]],
                       np.int32)
        cv.fillPoly(m, [pts], 255)
    else:
        raise ValueError(f"unknown shape '{kind}'")
    return m


def render_object(shape: str, texture: str, h: int, w: int,
                  rng: np.random.Generator):
    """-> (patch (h, w, 3) uint8, mask (h, w) uint8)."""
    return render_texture(texture, h, w, rng), \
        render_shape_mask(shape, h, w, rng)


def _color_field(h: int, w: int, rng: np.random.Generator) -> np.ndarray:
    """Low-frequency color field + fine noise (cluttered background)."""
    small = rng.integers(30, 200, size=(6, 8, 3)).astype(np.uint8)
    field = cv.resize(small, (w, h), interpolation=cv.INTER_CUBIC)
    noise = rng.normal(0.0, 8.0, size=field.shape).astype(np.float32)
    return np.clip(field.astype(np.float32) + noise, 0, 255).astype(np.uint8)


def make_hard_dataset(root: str, rng: np.random.Generator,
                      classes: int = 4, per_class: int = 8,
                      size_range: Tuple[int, int] = (32, 88)
                      ) -> List[MaskSample]:
    """Write the object source library: one object instance per source
    image (192x256 clutter field), ``per_class`` instances per class
    with per-instance size/aspect/color/period variation."""
    if classes > len(CLASS_DEFS):
        raise ValueError(f"classes <= {len(CLASS_DEFS)} supported")
    os.makedirs(root, exist_ok=True)
    samples = []
    for c in range(classes):
        shape, texture = CLASS_DEFS[c]
        for k in range(per_class):
            img = _color_field(192, 256, rng)
            h = int(rng.integers(size_range[0], size_range[1] + 1))
            w = int(rng.integers(size_range[0], size_range[1] + 1))
            x = int(rng.integers(0, 256 - w))
            y = int(rng.integers(0, 192 - h))
            patch, msk = render_object(shape, texture, h, w, rng)
            mask = np.zeros((192, 256), np.uint8)
            sel = msk > 0
            img[y:y + h, x:x + w][sel] = patch[sel]
            mask[y:y + h, x:x + w] = msk
            ip = os.path.join(root, f"hard_c{c}_{k:02d}.png")
            mp = os.path.join(root, f"hard_c{c}_{k:02d}_mask.png")
            cv.imwrite(ip, img)
            cv.imwrite(mp, mask)
            samples.append(MaskSample(ip, mp, c, np.array([x, y, w, h])))
    return samples


def make_hard_backgrounds(root: str, rng: np.random.Generator,
                          classes: int = 4, n: int = 10,
                          size_hw: Tuple[int, int] = (384, 512),
                          distractors: Tuple[int, int] = (3, 7)
                          ) -> List[str]:
    """Cluttered background frames: color field + unlabeled mismatched
    shape/texture distractors (hard negatives)."""
    os.makedirs(root, exist_ok=True)
    defs = distractor_defs(classes)
    H, W = size_hw
    paths = []
    for i in range(n):
        img = _color_field(H, W, rng)
        for _ in range(int(rng.integers(distractors[0],
                                        distractors[1] + 1))):
            shape, texture = defs[int(rng.integers(0, len(defs)))]
            h = int(rng.integers(28, 90))
            w = int(rng.integers(28, 90))
            x = int(rng.integers(0, W - w))
            y = int(rng.integers(0, H - h))
            patch, msk = render_object(shape, texture, h, w, rng)
            sel = msk > 0
            img[y:y + h, x:x + w][sel] = patch[sel]
        p = os.path.join(root, f"hard_bg{i:02d}.png")
        cv.imwrite(p, img)
        paths.append(p)
    return paths


def hard_data_config(batch_size: int = 16) -> DataConfig:
    """The hardness knobs: 2-5 pastes per scene, occlusion allowed up to
    scaled IoU 0.30, 0.7-1.8x paste rescale."""
    return DataConfig(batch_size=batch_size,
                      num_compose=(2, 5),
                      compose_iou_thresh=0.30,
                      scale_range=(0.7, 1.8))


BOX_CAPACITY = 6          # num_compose max 5 + headroom


def hard_sources(root: str, classes: int = 4, dataset_seed: int = 7):
    """Object sources + backgrounds (generated once per ``root``;
    re-runs reuse the files via the manifest sidecar).
    -> (samples, background paths)."""
    import json
    sidecar = os.path.join(root, f"hard_manifest_c{classes}.json")
    if os.path.isfile(sidecar):
        with open(sidecar) as f:
            meta = json.load(f)
        samples = [MaskSample(s["image"], s["mask"], s["label"],
                              np.asarray(s["rect"], np.int32))
                   for s in meta["samples"]]
        backgrounds = meta["backgrounds"]
        ok = all(os.path.isfile(s.image_path) and os.path.isfile(s.mask_path)
                 for s in samples) and all(map(os.path.isfile, backgrounds))
        if not ok:
            samples = None
    else:
        samples = None
    if samples is None:
        rng = np.random.default_rng(dataset_seed)
        samples = make_hard_dataset(root, rng, classes=classes)
        backgrounds = make_hard_backgrounds(root, rng, classes=classes)
        with open(sidecar, "w") as f:
            json.dump({"samples": [
                {"image": s.image_path, "mask": s.mask_path,
                 "label": int(s.label), "rect": [int(v) for v in s.rect]}
                for s in samples], "backgrounds": backgrounds}, f)
    return samples, backgrounds


def hard_pipeline(root: str, grid: GridConfig,
                  batch_size: int = 16, seed: int = 1,
                  classes: int = 4,
                  dataset_seed: int = 7) -> CompositeTrainPipeline:
    """Host (parity-path) compositing pipeline over the hard sources."""
    samples, backgrounds = hard_sources(root, classes, dataset_seed)
    return CompositeTrainPipeline(
        samples, grid, hard_data_config(batch_size),
        backgrounds=backgrounds, box_capacity=BOX_CAPACITY, seed=seed)


def hard_device_pipeline(root: str, grid: GridConfig,
                         batch_size: int = 16, seed: int = 1,
                         classes: int = 4, dataset_seed: int = 7):
    """ON-DEVICE compositing pipeline over the hard sources: one jitted
    dispatch per training batch (data/device_compositor.py) — on this
    1-core host the host compositor is the gate phase's wall-clock
    bottleneck, not the TPU (round-4 gate budget recalibration)."""
    from tpufcn.data.device_compositor import DeviceCompositePipeline
    samples, backgrounds = hard_sources(root, classes, dataset_seed)
    return DeviceCompositePipeline(
        samples, grid, hard_data_config(batch_size),
        backgrounds=backgrounds, box_capacity=BOX_CAPACITY, seed=seed)


def eval_cache_path(root: str, grid: GridConfig, classes: int,
                    n_images: int, seed: int = 99) -> str:
    """On-disk location of the memoized held-out eval set (the gate
    scheduler probes this to decide whether a gate unit pays
    first-touch compose costs — tpufcn/train/gates.py)."""
    return os.path.join(
        root, f"hard_eval_{grid.im_height}x{grid.im_width}_s{grid.stride}"
              f"_c{classes}_n{n_images}_seed{seed}.npz")


def build_eval_set(root: str, grid: GridConfig, classes: int = 4,
                   n_images: int = 128, seed: int = 99,
                   chunk: int = 32):
    """Fixed held-out eval set: composited scenes + corner-box GT.

    Returns (images (N, H, W, 3) u8, gts [per image (corners, labels)],
    segs (N, H, W) i32).  ``seed`` separates it from every train seed.

    Disk-cached per (grid, classes, n_images, seed): the HOST compositor
    stays the eval-set source (parity path, stable round-over-round GT)
    but composing 100+ net-resolution scenes costs minutes on a 1-core
    host — the cache makes every re-run (and every gate family sharing
    a config) pay it once.
    """
    cache = eval_cache_path(root, grid, classes, n_images, seed)
    if os.path.isfile(cache):
        z = np.load(cache, allow_pickle=False)
        gts = [(z[f"gt_c{i}"], z[f"gt_l{i}"]) for i in range(n_images)]
        return z["images"], gts, z["segs"]
    pipe = hard_pipeline(root, grid, batch_size=chunk, seed=seed,
                         classes=classes)
    images, segs, gts = [], [], []
    for _ in range(0, n_images, chunk):
        b = pipe.batch(chunk)
        images.append(b["image"])
        segs.append(b["seg"])
        for i in range(chunk):
            v = b["valid"][i]
            r = b["rects"][i][v]
            corners = np.concatenate([r[:, :2], r[:, :2] + r[:, 2:4]],
                                     axis=1)
            gts.append((corners, b["labels"][i][v]))
    images = np.concatenate(images)[:n_images]
    segs = np.concatenate(segs)[:n_images]
    gts = gts[:n_images]
    np.savez(cache, images=images, segs=segs,
             **{f"gt_c{i}": g[0] for i, g in enumerate(gts)},
             **{f"gt_l{i}": g[1] for i, g in enumerate(gts)})
    return images, gts, segs
