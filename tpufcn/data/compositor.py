"""Copy-paste scene compositing + photometric augmentation (host side).

Numpy/OpenCV re-implementation of the reference augmentation engines
(reference scripts/data_argumentation_layer/argumentation_engine.py):

* :class:`Compositor` — ``ArgumentationEngineMapping`` (:601-754): paste
  1..N masked object crops onto a background at non-overlapping random
  positions (scaled-IoU < 0.05, bounded rejection sampling <= 100 trials),
  random flip and 1.0-2.2x rescale per object; returns composite image,
  instance mask, rects, labels.
* :func:`random_augmentation` — ``ArgumentationEngine.random_argumentation``
  (:143-188): random flip (3 of 4 draws), zoom-crop around the GT box,
  photometric jitter.
* :func:`photometric` — the imgaug pipeline (:308-322) rebuilt on OpenCV:
  OneOf(gaussian|average|median blur), sharpen, additive + multiplicative
  per-channel jitter, partial grayscale.
* :func:`fcn_crop_sample` — ``ArgumentationEngineFCN.process2`` (:403-483):
  flip + scale-jittered (3/3.5/4x) crop around the mask bbox -> full-res
  semantic mask label.

Deviation (documented): the reference demeans on the host inside the data
layer; tpufcn leaves images uint8 and demeans on device in the jitted
train step (identical math, device-side).  Pixel-loop pastes are replaced
by vectorized masked assignment.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import cv2 as cv
import numpy as np

from tpufcn.data.manifest import MaskSample


def _scaled_iou(a, b) -> float:
    """Reference JaccardCoeff.iou (see tpufcn.ops.boxes.scaled_iou_xywh)."""
    ix = max(a[0], b[0]); iy = max(a[1], b[1])
    iw = min(a[0] + a[2], b[0] + b[2]) - ix
    ih = min(a[1] + a[3], b[1] + b[3]) - iy
    if iw < 0 or ih < 0 or iw * ih == 0:
        return 0.0
    ux = min(a[0], b[0]); uy = min(a[1], b[1])
    uw = max(a[0] + a[2], b[0] + b[2]) - ux
    uh = max(a[1] + a[3], b[1] + b[3]) - uy
    score = (iw * ih) / float(uw * uh)
    return score / (float(a[2] * a[3]) / float(b[2] * b[3]))


def _scaled_iou_vec(b, cx, cy, w, h):
    """_scaled_iou(b, [cx, cy, w, h]) over candidate vectors cx/cy."""
    ix = np.maximum(b[0], cx)
    iy = np.maximum(b[1], cy)
    iw = np.minimum(b[0] + b[2], cx + w) - ix
    ih = np.minimum(b[1] + b[3], cy + h) - iy
    ux = np.minimum(b[0], cx)
    uy = np.minimum(b[1], cy)
    uw = np.maximum(b[0] + b[2], cx + w) - ux
    uh = np.maximum(b[1] + b[3], cy + h) - uy
    inter = iw * ih
    score = np.where((iw < 0) | (ih < 0) | (inter == 0),
                     0.0, inter / (uw * uh))
    return score / (float(b[2] * b[3]) / float(w * h))


def flip_image_with_rects(image: np.ndarray, rects, flip_code: int):
    """cv.flip + the reference rect transform (argumentation_engine.py:241-267),
    including its -1 pixel shifts."""
    im = cv.flip(image, flip_code)
    h, w = image.shape[:2]
    out = []
    for rect in rects:
        x, y, rw, rh = [int(v) for v in rect]
        p1 = (x, y)
        p2 = (x + rw, y + rh)
        if flip_code == -1:
            p1 = (w - p1[0] - 1, h - p1[1] - 1)
            p2 = (w - p2[0] - 1, h - p2[1] - 1)
        elif flip_code == 0:
            p1 = (p1[0], h - p1[1] - 1)
            p2 = (p2[0], h - p2[1] - 1)
        elif flip_code == 1:
            p1 = (w - p1[0] - 1, p1[1])
            p2 = (w - p2[0] - 1, p2[1])
        nx = max(min(p1[0], p2[0]), 0)
        ny = max(min(p1[1], p2[1]), 0)
        out.append([nx, ny, abs(p2[0] - p1[0]), abs(p2[1] - p1[1])])
    return im, out


def photometric(image: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Blur -> sharpen -> add -> multiply -> grayscale chain with the
    reference's parameter ranges."""
    img = image.astype(np.float32)

    blur_kind = rng.integers(0, 3)
    if blur_kind == 0:
        sigma = float(rng.uniform(0.0, 3.0))
        if sigma > 1e-3:
            img = cv.GaussianBlur(img, (0, 0), sigma)
    elif blur_kind == 1:
        k = int(rng.integers(2, 8))
        img = cv.blur(img, (k, k))
    else:
        k = int(rng.integers(1, 4)) * 2 + 1  # odd in 3..7
        img = cv.medianBlur(img.astype(np.uint8), k).astype(np.float32)

    # sharpen: blend identity with a sharpening kernel (imgaug Sharpen)
    alpha = float(rng.uniform(0.0, 1.0))
    lightness = float(rng.uniform(0.75, 1.5))
    kern = np.array([[-1, -1, -1],
                     [-1, 8 + lightness, -1],
                     [-1, -1, -1]], np.float32)
    sharp = cv.filter2D(img, -1, kern)
    img = (1 - alpha) * img + alpha * sharp

    # Add (-2, 21), per_channel p=0.5
    if rng.random() < 0.5:
        img += rng.uniform(-2, 21, size=(1, 1, img.shape[2]))
    else:
        img += float(rng.uniform(-2, 21))

    # Multiply (0.75, 1.25), per_channel p=0.5
    if rng.random() < 0.5:
        img *= rng.uniform(0.75, 1.25, size=(1, 1, img.shape[2]))
    else:
        img *= float(rng.uniform(0.75, 1.25))

    # Grayscale alpha in (0, 0.5)
    ga = float(rng.uniform(0.0, 0.5))
    if ga > 1e-3:
        gray = cv.cvtColor(np.clip(img, 0, 255).astype(np.uint8),
                           cv.COLOR_BGR2GRAY).astype(np.float32)
        img = (1 - ga) * img + ga * gray[..., None]

    return np.clip(img, 0, 255).astype(np.uint8)


def zoom_crop(image: np.ndarray, rect, rng: np.random.Generator,
              label_map: Optional[np.ndarray] = None):
    """Reference crop_image_dimension + enlarge-factor draw
    (argumentation_engine.py:155-236): random crop containing the GT box.

    ``label_map`` is cropped with the SAME window.  (The reference crops
    only the image — argumentation_engine.py:155-188 — leaving its seg
    labels misaligned with zoom-cropped pixels; that is a bug, not a
    quirk to keep, since tpufcn trains seg heads on this output.)"""
    x, y, w, h = [int(v) for v in rect]
    if w <= 0 or h <= 0:
        return image, list(rect), label_map
    scale_x = int(math.floor(image.shape[1] / float(w)))
    scale_y = int(math.floor(image.shape[0] / float(h)))
    e1 = float(rng.uniform(1.0, max(scale_x, 1.0)))
    e2 = float(rng.uniform(1.0, max(scale_y, 1.0)))
    widths = (int(w * e1), w * e2)
    heights = (int(h * e1), h * e2)

    cx0 = x + w // 2 - widths[0]
    cy0 = y + h // 2 - heights[0]
    cw = widths[1] + widths[0]
    ch = heights[1] + heights[0]

    cx, cy = x + w / 2.0, y + h / 2.0
    sx = int(rng.integers(0, max(int(cw / 2), 1)))
    sy = int(rng.integers(0, max(int(ch / 2), 1)))
    cx = cx + sx if rng.integers(0, 2) else cx - sx
    cy = cy + sy if rng.integers(0, 2) else cy - sy

    nx = int(cx - cw / 2)
    ny = int(cy - ch / 2)
    nw, nh = int(cw), int(ch)
    if nx > cx0:
        nx = cx0
        nw -= abs(nx - cx0)
    if ny > cy0:
        ny = cy0
        nh -= abs(ny - cy0)
    if nx + nw < cx0 + cw:
        nx += (cx0 + cw) - (nx + nw)
    if ny + nh < cy0 + ch:
        ny += (cy0 + ch) - (ny + nh)

    nx = max(int(nx), 0)
    ny = max(int(ny), 0)
    roi = image[ny:ny + int(nh), nx:nx + int(nw)]
    if roi.size == 0:
        return image, list(rect), label_map
    if label_map is not None:
        label_map = label_map[ny:ny + int(nh), nx:nx + int(nw)].copy()
    return roi.copy(), [int(x - nx), int(y - ny), w, h], label_map


def rotate_image_with_rects(image: np.ndarray, rects,
                            rng: np.random.Generator,
                            max_angle: int = 5,
                            label_map: Optional[np.ndarray] = None):
    """Reference ``rotate_image_with_rect`` (argumentation_engine.py:
    327-355; committed but gated OFF at :179 ``rotate_img = False``):
    warpAffine about the image center by a random INTEGER angle in
    [-max_angle, max_angle] (the reference's random.randint draw), each
    rect replaced by the axis-aligned bounding rect of its four rotated
    corners with the reference's int truncation.  The reference version
    ignores the mask; ours rotates a given label_map with
    nearest-neighbor so seg training can opt in too."""
    h, w = image.shape[:2]
    center = (w / 2, h / 2)
    angle = float(rng.integers(-max_angle, max_angle + 1))
    m = cv.getRotationMatrix2D(center, angle, 1)
    im_rot = cv.warpAffine(image, m, (w, h))
    out = []
    for rect in rects:
        x, y, rw, rh = [float(v) for v in rect]
        xs = (x, x + rw, x, x + rw)
        ys = (y, y, y + rh, y + rh)
        px = [int(xc * m[0, 0] + yc * m[0, 1] + m[0, 2])
              for xc, yc in zip(xs, ys)]
        py = [int(xc * m[1, 0] + yc * m[1, 1] + m[1, 2])
              for xc, yc in zip(xs, ys)]
        out.append([min(px), min(py),
                    max(px) - min(px), max(py) - min(py)])
    if label_map is not None:
        label_map = cv.warpAffine(label_map, m, (w, h),
                                  flags=cv.INTER_NEAREST)
    return im_rot, out, label_map


def random_augmentation(image: np.ndarray, rects,
                        rng: np.random.Generator,
                        label_map: Optional[np.ndarray] = None,
                        enable_zoom: bool = True,
                        enable_photometric: bool = True,
                        rotate: bool = False):
    """Flip + zoom-crop (single-box case, as the reference) + photometric
    (+ the reference's gated-off rotation when ``rotate=True``, applied
    after photometric like the reference chain :176-183)."""
    flip_code = int(rng.integers(-1, 3))    # {-1, 0, 1, 2}; 2 = no flip
    if -2 < flip_code < 2:
        image, rects = flip_image_with_rects(image, rects, flip_code)
        if label_map is not None:
            label_map = cv.flip(label_map, flip_code)
    else:
        rects = [list(r) for r in rects]

    if enable_zoom and len(rects) == 1:
        image, rect, label_map = zoom_crop(image, rects[0], rng, label_map)
        rects = [rect]

    if enable_photometric:
        image = photometric(image, rng)
    if rotate:
        image, rects, label_map = rotate_image_with_rects(
            image, rects, rng, label_map=label_map)
    return image, rects, label_map


def resize_image_and_rects(image: np.ndarray, rects,
                           size_wh: Tuple[int, int]):
    """Reference resize_image_and_labels (:114-138) incl. its int floors."""
    img = cv.resize(image, size_wh, interpolation=cv.INTER_CUBIC)
    rx = np.float32(image.shape[1]) / np.float32(size_wh[0])
    ry = np.float32(image.shape[0]) / np.float32(size_wh[1])
    out = []
    for rect in rects:
        x, y, w, h = [np.float32(v) for v in rect]
        xt, yt = x / rx, y / ry
        xb, yb = (x + w) / rx, (y + h) / ry
        out.append([int(xt), int(yt), int(xb - xt), int(yb - yt)])
    return img, out


@dataclasses.dataclass
class ComposedScene:
    image: np.ndarray        # (H, W, 3) uint8 BGR
    mask: np.ndarray         # (H, W) uint8 instance labels (label+1)
    rects: np.ndarray        # (M, 4) int
    labels: np.ndarray       # (M,) int


class Compositor:
    """Copy-paste scene builder over a MaskSample dataset."""

    def __init__(self, samples: Sequence[MaskSample],
                 iou_thresh: float = 0.05,
                 max_trials: int = 100,
                 scale_range: Tuple[float, float] = (1.0, 2.2),
                 imread=cv.imread,
                 cache_images: int = 256):
        if not samples:
            raise ValueError("empty compositor dataset")
        self.samples = list(samples)
        self.iou_thresh = iou_thresh
        self.max_trials = max_trials
        self.scale_range = scale_range
        self._raw_imread = imread
        if cache_images:
            # decode-once cache: the reference re-imreads every paste
            # (argumentation_engine.py:671-672), which dominates host time
            import functools
            self.imread = functools.lru_cache(maxsize=cache_images)(
                lambda p: imread(p))
        else:
            self.imread = imread

    def compose(self, num_proposals: int, background: np.ndarray,
                rng: np.random.Generator,
                base_mask: Optional[np.ndarray] = None,
                base_rect=None) -> ComposedScene:
        im_y, im_x = background.shape[:2]
        img_out = background.copy()
        mask_out = (base_mask.copy() if base_mask is not None
                    else np.zeros((im_y, im_x), np.uint8))
        # `placed` drives overlap rejection (and includes the caller's
        # base_rect, as the reference seeds flag_position with mrect);
        # `rects`/`labels` report only the pasted objects, kept aligned.
        placed: List = [list(base_rect)] if base_rect is not None else []
        rects: List = []
        labels: List = []

        for _ in range(num_proposals):
            s = self.samples[int(rng.integers(0, len(self.samples)))]
            image = self.imread(s.image_path)
            mask = self.imread(s.mask_path)
            if image is None or mask is None:
                continue
            if mask.ndim == 3:
                mask = cv.cvtColor(mask, cv.COLOR_BGR2GRAY)
            mask = (mask > 0).astype(np.uint8) * 255
            rect = [int(v) for v in s.rect]

            flip_code = int(rng.integers(-1, 3))
            if -2 < flip_code < 2:
                image, fr = flip_image_with_rects(image, [rect], flip_code)
                mask = cv.flip(mask, flip_code)
                rect = fr[0]
            x, y, w, h = rect
            x, y = max(x, 0), max(y, 0)
            w = min(w, image.shape[1] - x)
            h = min(h, image.shape[0] - y)
            if w <= 1 or h <= 1:
                continue
            roi = image[y:y + h, x:x + w]
            msk = mask[y:y + h, x:x + w]

            if rng.integers(0, 2):
                scale = float(rng.uniform(*self.scale_range))
                w = int(w * scale)
                h = int(h * scale)
                if w < 1 or h < 1 or w > im_x or h > im_y:
                    w = min(max(w, 1), im_x)
                    h = min(max(h, 1), im_y)
                roi = cv.resize(roi, (w, h))
                msk = cv.resize(msk, (w, h), interpolation=cv.INTER_NEAREST)

            nrect = self._place(w, h, im_x, im_y, placed, rng)
            if nrect is None:
                continue
            cx, cy = nrect[0], nrect[1]
            ph = min(h, im_y - cy)
            pw = min(w, im_x - cx)
            sel = msk[:ph, :pw] > 0
            img_out[cy:cy + ph, cx:cx + pw][sel] = roi[:ph, :pw][sel]
            # instance mask stores label+1 (reference :728)
            mask_out[cy:cy + ph, cx:cx + pw][sel] = s.label + 1
            placed.append(nrect)
            rects.append(nrect)
            labels.append(s.label)

        return ComposedScene(
            image=img_out, mask=mask_out,
            rects=np.asarray(rects, np.int32).reshape(-1, 4),
            labels=np.asarray(labels, np.int32))

    def _place(self, w, h, im_x, im_y, placed, rng):
        # Rejection sampling, vectorized: the reference (and v1 of this
        # code) drew and IoU-checked one candidate per Python iteration —
        # ~45 interpreter round-trips per paste, ~30% of host compositing
        # time.  Drawing all max_trials candidates in two bulk rng calls
        # and checking them against `placed` as one numpy broadcast is
        # distributionally identical (iid uniforms, first passing
        # candidate wins, None after max_trials).
        cx = rng.integers(0, im_x, size=self.max_trials)
        cy = rng.integers(0, im_y, size=self.max_trials)
        cx = np.maximum(np.where(cx + w > im_x - 1, cx - (cx + w - im_x), cx),
                        0)
        cy = np.maximum(np.where(cy + h > im_y - 1, cy - (cy + h - im_y), cy),
                        0)
        if not placed:
            return [int(cx[0]), int(cy[0]), w, h]
        p = np.asarray(placed, np.float64)            # (P, 4)
        ok = np.ones(self.max_trials, bool)
        for b in p:                                   # P is 1-4 rects
            iou = _scaled_iou_vec(b, cx, cy, w, h)
            ok &= iou <= self.iou_thresh
        idx = int(np.argmax(ok))
        if not ok[idx]:
            return None
        return [int(cx[idx]), int(cy[idx]), w, h]


def fcn_crop_sample(image: np.ndarray, mask: np.ndarray, label: int,
                    size_wh: Tuple[int, int], rng: np.random.Generator,
                    scales=(3.0, 3.5, 4.0)):
    """ArgumentationEngineFCN.process2: flip, scale-jittered crop around
    the mask's largest-contour bbox, nearest-resize mask -> (rgb, mask)."""
    flip_code = int(rng.integers(-1, 2))
    image = cv.flip(image, flip_code)
    mask = cv.flip(mask, flip_code)
    if mask.ndim == 3:
        mask = cv.cvtColor(mask, cv.COLOR_BGR2GRAY)

    binary = (mask > 0).astype(np.uint8) * 255
    contours, _ = cv.findContours(binary, cv.RETR_CCOMP,
                                  cv.CHAIN_APPROX_SIMPLE)[-2:]
    if not contours:
        return (cv.resize(image, size_wh),
                cv.resize(mask, size_wh, interpolation=cv.INTER_NEAREST))
    biggest = max(contours, key=cv.contourArea)
    x, y, w, h = cv.boundingRect(biggest)

    s = float(scales[int(rng.integers(0, len(scales)))])
    cx, cy = x + w / 2.0, y + h / 2.0
    nw, nh = int(s * w), int(s * h)
    nx = max(int(cx - nw / 2.0), 0)
    ny = max(int(cy - nh / 2.0), 0)
    r = int(rng.integers(-min(w // 2, h // 2) or -1,
                         (min(w // 2, h // 2) or 1) + 1))
    nx, ny = max(nx + r, 0), max(ny + r, 0)
    nw = min(nw, image.shape[1] - nx)
    nh = min(nh, image.shape[0] - ny)
    if nw < 2 or nh < 2:
        nx, ny, nw, nh = 0, 0, image.shape[1], image.shape[0]

    rgb = cv.resize(image[ny:ny + nh, nx:nx + nw], size_wh)
    m = cv.resize(mask[ny:ny + nh, nx:nx + nw], size_wh,
                  interpolation=cv.INTER_NEAREST)
    m = np.where(m > 0, np.uint8(label), np.uint8(0))
    return rgb, m
