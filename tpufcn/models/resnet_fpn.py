"""Modern backbone swap: ResNet-18 + FPN DetectNet head (BASELINE
config #5's stretch goal).

Unlike the Caffe-parity families, this model is free-designed for TPU:

* ResNet-18 basic blocks (3x3+3x3, identity shortcuts, stride-2
  downsample convs) with GroupNorm — no batch statistics, so train and
  serve share one code path and data-parallel training needs no
  cross-replica batch-stat sync;
* an FPN top-down pathway fusing C5(+C4, +C3) into a stride-16 P4
  feature map (matching the DetectNet decode-grid contract at 448:
  28x28), lateral 1x1 + nearest-neighbor upsample + 3x3 smoothing;
* the standard tpufcn head contract: 1x1 sigmoid coverage (C channels)
  + 1x1 bbox corner-offset regressor (4C channels), drop-in for the
  grid decoder, NMS, losses, converter-free training.

Input: raw BGR in [0, 255]; normalized to [-1, 1] internally.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpufcn.models.layers import conv_relu


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.bfloat16
    # Serving: store the block OUTPUT (post-GN, post-relu) compactly —
    # GroupNorm statistics are computed in f32 BEFORE storage, so the
    # normalizer is unaffected; consumers are the next block's conv
    # prologue and the elementwise shortcut add.
    store_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=1, use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.GroupNorm(num_groups=32, dtype=jnp.float32, name="gn1")(y)
        y = nn.relu(y).astype(self.dtype)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.GroupNorm(num_groups=32, dtype=jnp.float32, name="gn2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name="down")(x)
            residual = nn.GroupNorm(num_groups=32, dtype=jnp.float32,
                                    name="gn_down")(residual)
        out = nn.relu(y + residual.astype(y.dtype)).astype(self.dtype)
        if self.store_dtype is not None:
            out = out.astype(self.store_dtype)
        return out


class ResNetFPNDetectNet(nn.Module):
    """ResNet-18 + FPN -> stride-16 DetectNet heads."""

    num_classes: int = 4
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    widths: Sequence[int] = (64, 128, 256, 512)
    fpn_channels: int = 256
    dtype: Any = jnp.bfloat16
    store_dtype: Any = None    # serving: compact block-output storage

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> Dict[str, jnp.ndarray]:
        x = ((jnp.asarray(x, jnp.float32) - 127.0) / 128.0).astype(self.dtype)

        # stem: 7x7/2 + maxpool/2 -> stride 4
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        y = nn.GroupNorm(num_groups=32, dtype=jnp.float32, name="stem_gn")(y)
        y = nn.relu(y).astype(self.dtype)
        if self.store_dtype is not None:
            y = y.astype(self.store_dtype)   # stem out (max pool is exact)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        taps = {}
        for si, (n, w) in enumerate(zip(self.stage_sizes, self.widths)):
            for bi in range(n):
                stride = 2 if (bi == 0 and si > 0) else 1
                y = BasicBlock(w, stride, dtype=self.dtype,
                               store_dtype=self.store_dtype,
                               name=f"stage{si + 1}_block{bi}")(y)
            taps[f"c{si + 2}"] = y       # c2 (s4) .. c5 (s32)

        # FPN top-down to P4 (stride 16)
        f = self.fpn_channels
        p5 = conv_relu(taps["c5"], f, 1, name="lat5", relu=False,
                       dtype=self.dtype)
        lat4 = conv_relu(taps["c4"], f, 1, name="lat4", relu=False,
                         dtype=self.dtype)
        up5 = jnp.repeat(jnp.repeat(p5, 2, axis=1), 2, axis=2)
        p4 = lat4 + up5
        p4 = conv_relu(p4, f, 3, pad=1, name="smooth4", dtype=self.dtype)

        p4 = nn.Dropout(0.1, deterministic=not train, name="drop")(p4)

        cvg = conv_relu(p4, self.num_classes, 1, name="cvg/classifier",
                        relu=False, dtype=self.dtype)
        coverage = nn.sigmoid(cvg.astype(jnp.float32))
        bboxes = conv_relu(p4, 4 * self.num_classes, 1,
                           name="bbox/regressor", relu=False,
                           dtype=self.dtype).astype(jnp.float32)
        return {"coverage": coverage, "bboxes": bboxes}
