"""VGG16-backbone DetectNet variants.

Two heads over a shared VGG16 conv stack:

* :class:`VGGDetectNet` — the *training* net of the reference bounding_box
  recipe (reference train/bounding_box/train_val.prototxt): conv5_3 ->
  fixed bilinear x2 upsample (k4 s2 p1, depthwise) -> dropout 0.5 ->
  1x1 coverage (sigmoid) + 1x1 bbox heads at stride 8.

* :class:`VGGPyramidDetectNet` — the *deploy* net
  (reference train/bounding_box/deploy.prototxt): adds spatial pyramid
  pooling of conv4_3 (adaptive 1/2/4/7-bin average pools -> 1x1 conv 128
  -> fixed bilinear upsample to the conv5_3 grid), concatenated with
  [conv5_3, pool4], dropout, heads at stride 16.  Faithful quirks: the
  commented-out BatchNorms are omitted (they are comments in the
  reference), and conv5_3 has **no** ReLU in this net
  (deploy.prototxt:846-861 — conv5_3 feeds the concat directly).

Input convention: demean+minmax preprocessed BGR in [0, 1]
(see tpufcn.ops.image.preprocess_bgr), matching the reference data layer.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from tpufcn.models.layers import conv_relu, max_pool_caffe, avg_pool_caffe, upsample_factor

# VGG16 conv stack: (stage, n_convs, width)
VGG_STAGES = ((1, 2, 64), (2, 2, 128), (3, 3, 256), (4, 3, 512), (5, 3, 512))


class VGG16Backbone(nn.Module):
    """conv1_1 .. conv5_3 with taps; pools are k2 s2 (even sizes, exact).

    Returns dict of tap activations: pool3, conv4_3, pool4, conv5_3.
    ``relu5_3`` toggles the final ReLU (absent in the pyramid deploy net).
    """

    dtype: Any = jnp.bfloat16
    relu5_3: bool = True
    # Serving fast path (same design as GoogLeNetDetectNet.store_dtype):
    # conv outputs are STORED in a compact dtype (use f8e5m2 — its
    # bf16-truncation convert rides the conv epilogue); max pools are
    # fp8-exact and the next conv's prologue absorbs the up-convert.
    # Compute stays ``dtype``.  None = exact (default; training uses it).
    # ``store_stages`` limits quantization to stages <= it.  The fcn8s
    # family measures a consistent trained-mAP cost from FULL-backbone
    # e5m2 (below exact in all three gate runs, BENCH.md) while
    # stages-1-2-only matches exact on the better-converged gate and
    # keeps ~the whole bandwidth win (stages 1-2 are the large-spatial
    # tensors).  Other families gate clean at the default 5.
    store_dtype: Any = None
    store_stages: int = 5

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        taps = {}
        x = x.astype(self.dtype)
        for stage, n_convs, width in VGG_STAGES:
            for i in range(1, n_convs + 1):
                relu = True
                if stage == 5 and i == 3 and not self.relu5_3:
                    relu = False
                x = conv_relu(x, width, 3, pad=1, name=f"conv{stage}_{i}",
                              relu=relu, dtype=self.dtype)
                if (self.store_dtype is not None
                        and stage <= self.store_stages):
                    x = x.astype(self.store_dtype)
            taps[f"conv{stage}_{n_convs}"] = x
            if stage < 5:
                x = max_pool_caffe(x, 2, 2)
                taps[f"pool{stage}"] = x
        return taps


class VGGDetectNet(nn.Module):
    """Reference bounding_box train net head (stride 8)."""

    num_classes: int = 11
    dropout_rate: float = 0.5
    dtype: Any = jnp.bfloat16
    store_dtype: Any = None    # serving: compact activation storage
    store_stages: int = 5      # quantize backbone stages <= this

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> Dict[str, jnp.ndarray]:
        taps = VGG16Backbone(dtype=self.dtype, store_dtype=self.store_dtype,
                             store_stages=self.store_stages,
                             name="backbone")(x)
        y = taps["conv5_3"]                         # stride 16
        # bilinear upsample is a (depthwise) conv: compute dtype
        y = upsample_factor(y.astype(self.dtype), 2)  # -> stride 8
        y = nn.Dropout(self.dropout_rate, deterministic=not train,
                       name="dropout5")(y)
        cvg = conv_relu(y, self.num_classes, 1, name="cvg/classifier",
                        relu=False, dtype=self.dtype)
        coverage = nn.sigmoid(cvg.astype(jnp.float32))
        bboxes = conv_relu(y, 4 * self.num_classes, 1, name="bbox/regressor",
                           relu=False, dtype=self.dtype).astype(jnp.float32)
        return {"coverage": coverage, "bboxes": bboxes}


class VGGPyramidDetectNet(nn.Module):
    """Reference bounding_box deploy net with spatial pyramid pooling
    (stride 16; default 20 VOC classes)."""

    num_classes: int = 20
    dropout_rate: float = 0.5
    dtype: Any = jnp.bfloat16
    store_dtype: Any = None    # serving: compact activation storage
    store_stages: int = 5      # quantize backbone stages <= this

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> Dict[str, jnp.ndarray]:
        taps = VGG16Backbone(dtype=self.dtype, relu5_3=False,
                             store_dtype=self.store_dtype,
                             store_stages=self.store_stages,
                             name="backbone")(x)
        c43 = taps["conv4_3"]                       # stride 8: (H/8, W/8)
        p4 = taps["pool4"]                          # stride 16
        c53 = taps["conv5_3"]                       # stride 16 (no ReLU)

        s = c43.shape[-3]                           # conv4_3 spatial size
        half = s // 2                               # target grid (stride 16)
        pyramid = []
        for bins in (1, 2, 4, 7):
            k = math.ceil(s / bins)                 # adaptive pool kernel
            # avg pool sums in the COMPUTE dtype (fp8 adds are inexact)
            p = avg_pool_caffe(c43.astype(self.dtype), k, k)  # (bins, bins)
            p = conv_relu(p, 128, 1, name=f"conv4_3/{bins}x{bins}",
                          dtype=self.dtype)
            p = upsample_factor(p, half // p.shape[-3])
            pyramid.append(p)

        # Concat order matters for head-weight parity with the reference:
        # [conv5_3, pool4, up1x1, up2x2, up4x4, up7x7]
        # (deploy.prototxt conv4_3/conv5_3/concat).  All inputs are cast
        # to ONE dtype first (8-bit floats have no implicit promotion
        # path): 8-bit lanes when the full backbone is stored compactly,
        # else the compute dtype.
        cat_dt = (self.store_dtype
                  if self.store_dtype is not None and self.store_stages >= 5
                  else self.dtype)
        y = jnp.concatenate([t.astype(cat_dt) for t in [c53, p4] + pyramid],
                            axis=-1)
        y = nn.Dropout(self.dropout_rate, deterministic=not train,
                       name="dropout5")(y)
        cvg = conv_relu(y, self.num_classes, 1, name="cvg/classifier",
                        relu=False, dtype=self.dtype)
        coverage = nn.sigmoid(cvg.astype(jnp.float32))
        bboxes = conv_relu(y, 4 * self.num_classes, 1, name="bbox/regressor",
                           relu=False, dtype=self.dtype).astype(jnp.float32)
        return {"coverage": coverage, "bboxes": bboxes}
