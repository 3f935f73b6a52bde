"""Image preprocessing ops (device-side, jittable).

The reference demeans with ImageNet BGR means and then min-max normalizes
to [0, 1] — a *data-dependent* transform (the min/max are per-image) —
five separate times (e.g. reference scripts/fcn_object_detector.py:407-413,
scripts/data_argumentation_layer/argumentation_engine.py:297-303).  It is
implemented exactly once here.

Layout: images are NHWC (or HWC) with **BGR** channel order, matching the
reference's OpenCV-native convention end to end (the Caffe nets were
trained on BGR).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tpufcn.core.config import IMAGENET_BGR_MEAN


def demean_bgr(img: jax.Array) -> jax.Array:
    """Subtract ImageNet BGR means then min-max normalize to [0, 1].

    Matches reference ``demean_rgb_image`` (fcn_object_detector.py:407-413;
    despite its name the reference operates on BGR images).  The min/max
    are taken over the whole image (all pixels and channels).
    """
    img = jnp.asarray(img, jnp.float32)
    mean = jnp.asarray(IMAGENET_BGR_MEAN, jnp.float32)
    out = img - mean  # broadcasts over trailing channel axis
    lo = jnp.min(out, axis=(-3, -2, -1), keepdims=True)
    hi = jnp.max(out, axis=(-3, -2, -1), keepdims=True)
    # Constant frame (hi == lo) maps to all-zeros instead of NaN — the
    # reference would divide by zero here (fcn_object_detector.py:412).
    return (out - lo) / jnp.maximum(hi - lo, jnp.finfo(jnp.float32).tiny)


def resize_bilinear(img: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Bilinear resize to (height, width), half-pixel centers.

    Device-side replacement for the reference's host ``cv.resize``
    (fcn_object_detector.py:80).  ``jax.image.resize(method="linear")``
    uses half-pixel sampling like OpenCV INTER_LINEAR; results agree to
    interpolation rounding.
    """
    h, w = size
    shape = img.shape[:-3] + (h, w, img.shape[-1])
    return jax.image.resize(img.astype(jnp.float32), shape, method="linear")


def preprocess_bgr(img: jax.Array, net_hw: Tuple[int, int]) -> jax.Array:
    """Full inference preprocessing: demean+normalize, resize to net input.

    Reference order (fcn_object_detector.py:79-82): demean first, then
    resize.  Keeps NHWC (no CHW transpose — TPU layout).
    """
    return resize_bilinear(demean_bgr(img), net_hw)
