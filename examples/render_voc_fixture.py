"""Render the miniature photoreal-ish Pascal-VOC fixture set.

VERDICT round-2 #5: the VOC path (converter -> records -> train ->
eval) had only ever seen synthetic-compositor scenes evaluating
themselves.  This renderer is an INDEPENDENT image source — no shared
code with the training compositor (tpufcn/data/compositor.py) — that
produces VOC-devkit-layout scenes with enough photographic structure
(directional lighting, lambertian + specular shading, cast shadows,
perspective ground plane, sensor noise, JPEG artifacts) to exercise
the pipeline on something other than flat texture patches.  The bench
environment has zero network egress, so real CC0 photos are not an
option; this is the documented substitute (BENCH.md "VOC fixture").

The rendered JPEGs + XML annotations are COMMITTED under
tests/fixtures/voc_mini (regeneration is deterministic for a seed, but
committed bytes keep the fixture stable across codec versions):

    python3 examples/render_voc_fixture.py tests/fixtures/voc_mini

Classes: ball (shaded sphere), crate (isometric cuboid), cone.
Reference anchor for the converter being driven:
scripts/voc/create_train_val.py:47-94.
"""

from __future__ import annotations

import os
import sys

import cv2 as cv
import numpy as np

CLASSES = ("ball", "crate", "cone")
W, H = 320, 240


def _smooth_noise(rng, h, w, scale, lo=0.0, hi=1.0):
    small = rng.random((max(h // scale, 2), max(w // scale, 2)))
    big = cv.resize(small.astype(np.float32), (w, h),
                    interpolation=cv.INTER_CUBIC)
    big = np.clip(big, 0, 1)
    return lo + (hi - lo) * big


def _sky_ground(rng, light_x):
    """Gradient sky + clouds above a perspective-textured ground."""
    horizon = int(H * rng.uniform(0.42, 0.55))
    img = np.zeros((H, W, 3), np.float32)
    # sky gradient between two plausible sky colors (BGR)
    top = np.array([rng.uniform(140, 230), rng.uniform(110, 180),
                    rng.uniform(60, 140)], np.float32)
    bot = top * rng.uniform(1.05, 1.25)
    t = (np.arange(H)[:, None] / max(horizon, 1)).clip(0, 1)
    img[:] = (1 - t[..., None]) * top + t[..., None] * bot
    clouds = _smooth_noise(rng, H, W, 40, 0.0, 1.0)
    img += (clouds[..., None] ** 3) * rng.uniform(20, 60)
    # ground: base color + two noise octaves, stretched near the horizon
    g = np.array([rng.uniform(40, 90), rng.uniform(90, 140),
                  rng.uniform(90, 150)], np.float32)  # grass/dirt-ish
    gh = H - horizon
    tex = (_smooth_noise(rng, gh * 3, W, 24, 0.75, 1.25)
           * _smooth_noise(rng, gh * 3, W, 5, 0.85, 1.15))
    # perspective: sample the stretched texture denser near the bottom
    rows = (np.linspace(0.0, 1.0, gh) ** 1.8 * (tex.shape[0] - 1))
    tex = tex[rows.astype(int)]
    ground = g[None, None] * tex[..., None]
    # distance haze toward the horizon
    fade = np.linspace(0.35, 0.0, gh)[:, None, None]
    ground = ground * (1 - fade) + img[horizon:] * fade
    img[horizon:] = ground
    # sun side slightly brighter
    xg = np.linspace(-1, 1, W)[None, :, None] * light_x
    img *= (1.0 + 0.08 * xg).astype(np.float32)
    return img, horizon


def _shadow(img, cx, cy, rx, ry, light_x, strength=0.45):
    """Soft elliptical cast shadow offset away from the light."""
    mask = np.zeros(img.shape[:2], np.float32)
    cv.ellipse(mask, (int(cx - light_x * rx * 0.9), int(cy)),
               (int(rx * 1.15), int(ry)), 0, 0, 360, 1.0, -1)
    mask = cv.GaussianBlur(mask, (0, 0), max(rx * 0.25, 1.0))
    img *= (1.0 - strength * mask[..., None])


def _draw_ball(img, rng, cx, cy, r, light):
    """Lambert-shaded sphere with a specular highlight."""
    yy, xx = np.mgrid[0:img.shape[0], 0:img.shape[1]].astype(np.float32)
    dx, dy = (xx - cx) / r, (yy - cy) / r
    d2 = dx * dx + dy * dy
    inside = d2 <= 1.0
    nz = np.sqrt(np.clip(1.0 - d2, 0, 1))
    lx, ly, lz = light
    lam = np.clip(dx * lx + (-dy) * ly + nz * lz, 0.05, 1.0)
    color = np.array([rng.uniform(30, 220) for _ in range(3)], np.float32)
    if color.max() < 80:
        color += 80
    spec = np.clip(dx * lx + (-dy) * ly + nz * lz, 0, 1) ** 30
    shaded = color[None, None] * lam[..., None] * 1.15 \
        + 200.0 * spec[..., None]
    img[inside] = np.clip(shaded[inside], 0, 255)
    x0, y0 = int(cx - r), int(cy - r)
    return [x0, y0, int(2 * r), int(2 * r)]


def _draw_crate(img, rng, cx, cy, s, light):
    """Isometric cuboid: top/front/side faces, per-face lambert
    shading, plank stripes."""
    lx = light[0]
    w, h, d = s, int(s * rng.uniform(0.7, 1.1)), int(s * 0.45)
    base = np.array([rng.uniform(40, 90), rng.uniform(90, 150),
                     rng.uniform(140, 200)], np.float32)  # wood-ish BGR
    # brightness per face from the light direction
    top_b, front_b = 1.15, 0.8 + 0.25 * light[2]
    side_b = 0.55 + 0.4 * (lx if lx > 0 else 0)
    front = np.array([[cx, cy], [cx + w, cy], [cx + w, cy + h],
                      [cx, cy + h]], np.int32)
    top = np.array([[cx, cy], [cx + w, cy], [cx + w + d, cy - d],
                    [cx + d, cy - d]], np.int32)
    side = np.array([[cx + w, cy], [cx + w + d, cy - d],
                     [cx + w + d, cy - d + h], [cx + w, cy + h]], np.int32)
    overlay = img.copy()
    for quad, b in ((front, front_b), (top, top_b), (side, side_b)):
        cv.fillConvexPoly(overlay, quad, (base * b).tolist())
    # plank stripes on the front face
    planks = max(h // rng.integers(8, 14), 2)
    for k in range(1, int(h / planks)):
        y = int(cy + k * planks)
        cv.line(overlay, (int(cx), y), (int(cx + w), y),
                (base * front_b * 0.75).tolist(), 1)
    for quad in (front, top, side):
        cv.polylines(overlay, [quad], True, (base * 0.4).tolist(), 1)
    img[:] = overlay
    x0, y0 = int(cx), int(cy - d)
    return [x0, y0, int(w + d), int(h + d)]


def _draw_cone(img, rng, cx, cy, s, light):
    """Cone: triangle silhouette shaded around its axis + ellipse base."""
    h = int(s * rng.uniform(1.3, 1.8))
    r = s // 2
    color = np.array([rng.uniform(30, 90), rng.uniform(60, 160),
                      rng.uniform(160, 240)], np.float32)  # orange-ish
    yy, xx = np.mgrid[0:img.shape[0], 0:img.shape[1]].astype(np.float32)
    mask = np.zeros(img.shape[:2], np.uint8)
    tri = np.array([[cx, cy - h], [cx - r, cy], [cx + r, cy]], np.int32)
    cv.fillConvexPoly(mask, tri, 255)
    cv.ellipse(mask, (int(cx), int(cy)), (r, max(r // 3, 2)),
               0, 0, 360, 255, -1)
    sel = mask > 0
    # shading: azimuthal gradient around the vertical axis
    t = np.clip((xx - (cx - r)) / max(2 * r, 1), 0, 1)
    lam = np.clip(0.35 + 0.8 * (1 - np.abs(t - (0.5 + 0.35 * light[0]))),
                  0.2, 1.2)
    shaded = color[None, None] * lam[..., None]
    img[sel] = np.clip(shaded[sel], 0, 255)
    # reflective band (traffic-cone stripe)
    band = np.zeros_like(mask)
    cv.fillConvexPoly(band, np.array(
        [[cx - r // 2 - 1, cy - h // 2], [cx + r // 2 + 1, cy - h // 2],
         [cx + int(r * 0.7), cy - h // 4], [cx - int(r * 0.7), cy - h // 4]],
        np.int32), 255)
    bsel = (band > 0) & sel
    img[bsel] = np.clip(230 * lam[bsel, None], 0, 255)
    return [int(cx - r), int(cy - h), int(2 * r), int(h + max(r // 3, 2))]


_DRAW = {"ball": _draw_ball, "crate": _draw_crate, "cone": _draw_cone}


def render_scene(rng):
    """-> (uint8 BGR image, [(class_name, (x, y, w, h))])."""
    light_x = rng.uniform(-0.9, 0.9)
    light = (light_x, rng.uniform(0.3, 0.8), rng.uniform(0.4, 0.9))
    light = tuple(np.asarray(light) / np.linalg.norm(light))
    img, horizon = _sky_ground(rng, light_x)
    n_obj = int(rng.integers(1, 4))
    objs = []
    placed = []
    for _ in range(n_obj):
        cls = CLASSES[int(rng.integers(0, len(CLASSES)))]
        # ground placement with fake perspective: farther (higher) ->
        # smaller
        gy = rng.uniform(0.15, 0.95)
        cy = horizon + int(gy * (H - horizon - 6)) + 4
        depth = 0.35 + 0.65 * gy
        s = int(rng.uniform(18, 52) * depth)
        cx = int(rng.uniform(s + 8, W - s - 16))
        if any(abs(cx - px) < (s + ps) * 0.7 and abs(cy - py) < 28
               for px, py, ps in placed):
            continue
        placed.append((cx, cy, s))
        if cls == "ball":
            cyb = cy - s // 2
            _shadow(img, cx, cy, s * 0.55, s * 0.18, light_x)
            box = _draw_ball(img, rng, cx, cyb, s // 2, light)
        elif cls == "crate":
            _shadow(img, cx + s // 2, cy, s * 0.7, s * 0.2, light_x)
            box = _draw_crate(img, rng, cx - s // 2, cy - s, s, light)
        else:
            _shadow(img, cx, cy, s * 0.6, s * 0.18, light_x)
            box = _draw_cone(img, rng, cx, cy, s, light)
        x, y, w, h = box
        x0, y0 = max(x, 0), max(y, 0)
        x1, y1 = min(x + w, W - 1), min(y + h, H - 1)
        if x1 - x0 >= 8 and y1 - y0 >= 8:
            objs.append((cls, (x0, y0, x1 - x0, y1 - y0)))
    # photographic post: white balance tint, mild blur, sensor noise,
    # vignette
    tint = np.array([rng.uniform(0.92, 1.08) for _ in range(3)], np.float32)
    img *= tint[None, None]
    img = cv.GaussianBlur(img, (0, 0), rng.uniform(0.4, 0.8))
    img += rng.normal(0, rng.uniform(1.5, 4.0), img.shape).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    d = np.sqrt(((xx - W / 2) / (W / 2)) ** 2 + ((yy - H / 2) / (H / 2)) ** 2)
    img *= (1.0 - 0.18 * np.clip(d - 0.5, 0, 1)[..., None])
    return np.clip(img, 0, 255).astype(np.uint8), objs


def _write_xml(path, idx, objs):
    parts = [f"<annotation><filename>{idx}.jpg</filename>",
             f"<size><width>{W}</width><height>{H}</height>"
             "<depth>3</depth></size>"]
    for name, (x, y, w, h) in objs:
        parts.append(
            f"<object><name>{name}</name><bndbox>"
            f"<xmin>{x}</xmin><ymin>{y}</ymin>"
            f"<xmax>{x + w}</xmax><ymax>{y + h}</ymax>"
            "</bndbox></object>")
    parts.append("</annotation>")
    with open(path, "w") as f:
        f.write("".join(parts))


def render_fixture(root: str, n_train: int = 48, n_val: int = 96,
                   seed: int = 20260819) -> None:
    # n_val 24 -> 96 (round 4): the voc-fixture accuracy gate needs
    # >= 100 detections to resolve sub-0.1 mAP moves (VERDICT r03 #7);
    # the RNG consumes scenes sequentially, so growing n_val APPENDS
    # val scenes while every committed train/val byte stays identical.
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "JPEGImages")
    ann_dir = os.path.join(root, "Annotations")
    set_dir = os.path.join(root, "ImageSets", "Main")
    for d in (img_dir, ann_dir, set_dir):
        os.makedirs(d, exist_ok=True)
    splits = {"train": [], "val": []}
    i = 0
    for split, n in (("train", n_train), ("val", n_val)):
        made = 0
        while made < n:
            img, objs = render_scene(rng)
            if not objs:
                continue
            idx = f"{split}_{i:04d}"
            i += 1
            made += 1
            cv.imwrite(os.path.join(img_dir, idx + ".jpg"), img,
                       [cv.IMWRITE_JPEG_QUALITY, 88])
            _write_xml(os.path.join(ann_dir, idx + ".xml"), idx, objs)
            splits[split].append(idx)
    for split, ids in splits.items():
        with open(os.path.join(set_dir, split + ".txt"), "w") as f:
            f.write("\n".join(ids) + "\n")
    print(f"rendered {len(splits['train'])} train + {len(splits['val'])} "
          f"val scenes into {root}")


if __name__ == "__main__":
    render_fixture(sys.argv[1] if len(sys.argv) > 1
                   else "tests/fixtures/voc_mini")
