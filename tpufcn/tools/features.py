"""CNN-code feature extraction for the offline label tools.

The reference extracts "CNN codes" (CaffeNet fc7 activations) per image
crop for similarity gating and clustering (reference
scripts/boundary_adjustment/boundary_refinement.py:385-396,
scripts/boundary_adjustment/rank_object_models.py:270-276).  tpufcn's
equivalent is the global-average-pooled VGG16 conv5_3 activation
(512-d) from the shared backbone, jitted and batched on TPU.
"""

from __future__ import annotations

from typing import Optional, Sequence

import cv2 as cv
import jax
import jax.numpy as jnp
import numpy as np

from tpufcn.models.vgg import VGG16Backbone
from tpufcn.ops.image import demean_bgr


class CnnCodeExtractor:
    def __init__(self, input_size: int = 224, dtype=jnp.bfloat16,
                 params=None, rng_seed: int = 0):
        self.size = input_size
        self.backbone = VGG16Backbone(dtype=dtype)
        if params is None:
            # Codes from a RANDOM backbone are far less discriminative
            # than the pretrained-CaffeNet fc7 codes the reference's
            # gating thresholds were tuned for (similarity 0.5, dbscan
            # eps 0.25) — load trained weights (convert_caffemodel /
            # load_snapshot_params) for production refinement runs.
            import logging
            logging.getLogger(__name__).warning(
                "CnnCodeExtractor built with randomly initialized "
                "VGG16 weights; similarity gating will be weak — pass "
                "trained params for real refinement/ranking runs")
            x0 = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
            params = jax.jit(self.backbone.init)(jax.random.key(rng_seed), x0)
        self.params = params

        @jax.jit
        def _codes(p, x):
            taps = self.backbone.apply(p, demean_bgr(x))
            feat = taps["conv5_3"].astype(jnp.float32)
            code = jnp.mean(feat, axis=(1, 2))            # (B, 512)
            norm = jnp.linalg.norm(code, axis=-1, keepdims=True)
            return code / jnp.maximum(norm, 1e-8)

        self._codes = _codes

    @classmethod
    def from_caffemodel(cls, path: str, input_size: int = 224,
                        dtype=jnp.bfloat16) -> "CnnCodeExtractor":
        """Build the extractor from a VGG16 ``.caffemodel`` — the
        trained-weights path the reference tools use (they load a
        CaffeNet/VGG ``.caffemodel`` for fc7 codes,
        boundary_refinement.py:374-383).  Layers present in the file
        are converted by name; heads the backbone lacks are ignored."""
        from tpufcn.convert import convert_caffemodel
        backbone = VGG16Backbone(dtype=dtype)
        x0 = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
        init = jax.jit(backbone.init)(jax.random.key(0), x0)
        params = convert_caffemodel(init, path, strict=False)
        return cls(input_size=input_size, dtype=dtype, params=params)

    def __call__(self, crops_bgr: Sequence[np.ndarray]) -> np.ndarray:
        """(N crops, any sizes) -> (N, 512) L2-normalized codes.

        Batches are padded to the next power-of-two capacity so XLA
        compiles O(log N) distinct graphs instead of one per crop
        count (30 s-5 min per compile on this host — CLAUDE.md)."""
        n = len(crops_bgr)
        batch = np.stack([
            cv.resize(np.asarray(c), (self.size, self.size))
            for c in crops_bgr]).astype(np.float32)
        cap = 1 << max(n - 1, 0).bit_length()   # next pow2 >= n
        if cap > n:
            batch = np.concatenate(
                [batch, np.zeros((cap - n,) + batch.shape[1:],
                                 np.float32)])
        codes = np.asarray(self._codes(self.params, jnp.asarray(batch)))
        return codes[:n]


def bhattacharyya(a: np.ndarray, b: np.ndarray) -> float:
    """Bhattacharyya distance between nonnegative feature vectors, the
    reference's similarity gate (cv.compareHist HISTCMP_BHATTACHARYYA,
    boundary_refinement.py:129-135)."""
    a = np.abs(np.asarray(a, np.float64))
    b = np.abs(np.asarray(b, np.float64))
    sa, sb = a.sum(), b.sum()
    if sa == 0 or sb == 0:
        return 1.0
    bc = np.sum(np.sqrt(a * b)) / np.sqrt(sa * sb)
    return float(np.sqrt(max(0.0, 1.0 - bc)))


def chi_square(a: np.ndarray, b: np.ndarray) -> float:
    """chi^2 histogram distance (cv.HISTCMP_CHISQR), used by the ranking
    walk (rank_object_models.py)."""
    a = np.abs(np.asarray(a, np.float64))
    b = np.abs(np.asarray(b, np.float64))
    denom = a + b
    mask = denom > 0
    return float(np.sum((a[mask] - b[mask]) ** 2 / denom[mask]))
