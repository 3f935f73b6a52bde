"""Independent numpy golden models of the reference algorithms.

These are fresh, loop-style re-statements of the behaviours documented in
SURVEY.md (grid labels: reference argumentation_engine.py:69-109; decode:
reference fcn_object_detector.py:357-394; grouping: OpenCV
groupRectangles), used only as test oracles for the vectorized device ops.
"""

from __future__ import annotations

import math

import numpy as np


# ---------------------------------------------------------------------------
# Reference-quirk IoU (JaccardCoeff semantics)
# ---------------------------------------------------------------------------

def golden_scaled_iou(a, b) -> float:
    ax, ay, aw, ah = [float(v) for v in a]
    bx, by, bw, bh = [float(v) for v in b]
    ix = max(ax, bx)
    iy = max(ay, by)
    iw = min(ax + aw, bx + bw) - ix
    ih = min(ay + ah, by + bh) - iy
    if iw < 0 or ih < 0:
        return 0.0
    inter = iw * ih
    if inter == 0:
        return 0.0
    ux = min(ax, bx)
    uy = min(ay, by)
    uw = max(ax + aw, bx + bw) - ux
    uh = max(ay + ah, by + bh) - uy
    union_bbox = uw * uh
    score = inter / union_bbox
    score /= (aw * ah) / (bw * bh)
    return score


# ---------------------------------------------------------------------------
# Grid label encoding (DetectNet label grids)
# ---------------------------------------------------------------------------

def golden_encode(rects, labels, im_w, im_h, stride, num_classes,
                  iou_thresh=0.1):
    """Returns CHW tensors (coverage C, bbox 4C, size 4C, obj 4C, cvg_block 4C)."""
    gh, gw = im_h // stride, im_w // stride
    C = num_classes
    coverage = np.zeros((C, gh, gw), np.float32)
    bbox = np.zeros((4 * C, gh, gw), np.float32)
    size = np.zeros((4 * C, gh, gw), np.float32)
    obj = np.zeros((4 * C, gh, gw), np.float32)
    cvg_block = np.zeros((4 * C, gh, gw), np.float32)

    for rect, label in zip(rects, labels):
        x, y, w, h = [float(v) for v in rect]
        k = int(label) * 4
        for j in range(gh):
            for i in range(gw):
                cell = (i * stride, j * stride, stride, stride)
                if golden_scaled_iou(cell, rect) > iou_thresh:
                    cx, cy = cell[0], cell[1]
                    bbox[k + 0, j, i] = x - cx
                    bbox[k + 1, j, i] = y - cy
                    bbox[k + 2, j, i] = (x + w) - cx
                    bbox[k + 3, j, i] = (y + h) - cy
                    size[k + 0, j, i] = 1.0 / w
                    size[k + 1, j, i] = 1.0 / h
                    size[k + 2, j, i] = 1.0 / w
                    size[k + 3, j, i] = 1.0 / h
                    obj[k:k + 4, j, i] = (stride * stride) / np.float32(w * h)
                    cvg_block[k:k + 4, j, i] = 1.0
                    coverage[int(label), j, i] = 1.0
    return coverage, bbox, size, obj, cvg_block


# ---------------------------------------------------------------------------
# Grid decode
# ---------------------------------------------------------------------------

def golden_decode(net_cvg, net_boxes, im_w, im_h, stride, prob_thresh):
    """net_cvg (gh, gw), net_boxes (4, gh, gw) -> boxes list, cvg list."""
    gw, gh = im_w // stride, im_h // stride
    cell_w, cell_h = im_w // gw, im_h // gh
    boxes, cvgs = [], []
    for j in range(gh):
        for i in range(gw):
            if net_cvg[j, i] >= prob_thresh:
                mx, my = i * cell_w, j * cell_h
                boxes.append([net_boxes[0, j, i] + mx, net_boxes[1, j, i] + my,
                              net_boxes[2, j, i] + mx, net_boxes[3, j, i] + my])
                cvgs.append(net_cvg[j, i])
    return np.asarray(boxes, np.float32).reshape(-1, 4), np.asarray(cvgs)


# ---------------------------------------------------------------------------
# groupRectangles (OpenCV semantics, (x, y, w, h) field interpretation)
# ---------------------------------------------------------------------------

def _similar(r1, r2, eps):
    delta = eps * (min(r1[2], r2[2]) + min(r1[3], r2[3])) * 0.5
    return (abs(r1[0] - r2[0]) <= delta and abs(r1[1] - r2[1]) <= delta
            and abs(r1[0] + r1[2] - r2[0] - r2[2]) <= delta
            and abs(r1[1] + r1[3] - r2[1] - r2[3]) <= delta)


def golden_group_rectangles(rects, group_threshold, eps):
    """Union-find partition + average + filter, per OpenCV groupRectangles."""
    rects = [tuple(int(round(v)) for v in r) for r in rects]
    n = len(rects)
    if n == 0:
        return [], []
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        for j in range(i + 1, n):
            if _similar(rects[i], rects[j], eps):
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)

    roots = sorted({find(i) for i in range(n)})
    root_ix = {r: k for k, r in enumerate(roots)}
    sums = np.zeros((len(roots), 4), np.float64)
    counts = np.zeros(len(roots), np.int64)
    for i, r in enumerate(rects):
        c = root_ix[find(i)]
        sums[c] += r
        counts[c] += 1

    # cvRound = round-half-to-even
    means = [tuple(int(np.rint(v / c)) for v in s) for s, c in zip(sums, counts)]

    out_rects, out_w = [], []
    for i, (r1, n1) in enumerate(zip(means, counts)):
        if n1 <= group_threshold:
            continue
        rejected = False
        for j, (r2, n2) in enumerate(zip(means, counts)):
            if j == i or n2 <= group_threshold:
                continue
            dx = int(np.rint(r2[2] * eps))
            dy = int(np.rint(r2[3] * eps))
            if (r1[0] >= r2[0] - dx and r1[1] >= r2[1] - dy
                    and r1[0] + r1[2] <= r2[0] + r2[2] + dx
                    and r1[1] + r1[3] <= r2[1] + r2[3] + dy
                    and (n2 > max(3, n1) or n1 < 3)):
                rejected = True
                break
        if not rejected:
            out_rects.append(r1)
            out_w.append(int(n1))
    return out_rects, out_w


def golden_vote_boxes(propose_boxes, group_threshold, eps, min_height=20):
    """Reference vote_boxes: group + height filter + log-votes confidence."""
    nboxes, weights = golden_group_rectangles(propose_boxes, group_threshold, eps)
    out = []
    for rect, w in zip(nboxes, weights):
        if rect[3] - rect[1] >= min_height:
            out.append([rect[0], rect[1], rect[2], rect[3], math.log(w)])
    return out
