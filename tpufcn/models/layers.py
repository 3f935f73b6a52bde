"""Shared building blocks for the model zoo (flax.linen, NHWC).

Module names mirror the Caffe layer names (reference models/deploy.prototxt,
train/*/*.prototxt) so the ``.caffemodel`` converter maps blobs to param
paths 1:1.  Compute dtype is configurable (bfloat16 for MXU speed, float32
for parity); accumulation is always float32.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpufcn.ops.caffe_layers import (
    avg_pool_caffe, lrn_across_channels, max_pool_caffe,
    upsample_bilinear_separable)

Dtype = Any

# Caffe "xavier" filler: uniform(-a, a), a = sqrt(3 / fan_in).
xavier_caffe = nn.initializers.variance_scaling(
    1.0, "fan_in", "uniform")


class CaffeConv(nn.Module):
    """2-D conv with Caffe geometry (explicit symmetric padding)."""

    features: int
    kernel: int
    stride: int = 1
    pad: int = 0
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.pad, self.pad), (self.pad, self.pad)],
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=xavier_caffe,
            name="conv",
        )(x)


def conv_relu(x, features, kernel, stride=1, pad=0, *, name,
              dtype=jnp.bfloat16, param_dtype=jnp.float32, relu=True):
    """Conv (+ReLU) helper used inside @nn.compact bodies."""
    y = CaffeConv(features, kernel, stride, pad, dtype=dtype,
                  param_dtype=param_dtype, name=name)(x)
    return nn.relu(y) if relu else y


class _S2DConvInner(nn.Module):
    """Raw-param conv applied via the space-to-depth fast path; param
    layout (HWIO kernel + bias) identical to nn.Conv for the converter."""

    features: int
    kernel: int
    pad: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from tpufcn.ops.fast_conv import conv2d_space_to_depth
        cin = x.shape[-1]
        kern = self.param("kernel", xavier_caffe,
                          (self.kernel, self.kernel, cin, self.features),
                          self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        # accumulator dtype == operand dtype: mixed-dtype conv transpose
        # is unsupported by this jax version (see Inception fused conv)
        y = conv2d_space_to_depth(x.astype(self.dtype),
                                  kern.astype(self.dtype), 2, self.pad,
                                  preferred_element_type=self.dtype)
        return (y + bias).astype(self.dtype)


class SpaceToDepthStemConv(nn.Module):
    """Drop-in replacement for CaffeConv(stride=2) on tiny-C_in stems:
    numerically identical, 4x denser MXU packing (see
    tpufcn.ops.fast_conv).  Param tree matches CaffeConv ("conv" child)."""

    features: int
    kernel: int
    pad: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return _S2DConvInner(self.features, self.kernel, self.pad,
                             self.dtype, self.param_dtype, name="conv")(x)


def upsample_factor(x, factor: int) -> jax.Array:
    """Caffe FCN upsampling rule: fixed bilinear deconv with
    k = 2f - f%2, s = f, p = ceil((f-1)/2) — the exact kernel recipe the
    reference documents inline (train/bounding_box/deploy.prototxt:
    'kernel 2*factor - factor%2, pad int(ceil((factor-1)/2.))')."""
    k = 2 * factor - factor % 2
    p = math.ceil((factor - 1) / 2.0)
    # separable two-matmul form: same numerics (tests/test_caffe_layers
    # parity), rides the MXU instead of lowering to C depthwise convs
    return upsample_bilinear_separable(x, k, factor, p)


class LRN(nn.Module):
    size: int = 5
    alpha: float = 1e-4
    beta: float = 0.75

    @nn.compact
    def __call__(self, x):
        # XLA's fused banded-matmul formulation measures faster than the
        # Pallas kernel (tpufcn/ops/pallas/lrn.py) at the GoogLeNet sites;
        # keep the XLA path as default.
        return lrn_across_channels(x, self.size, self.alpha, self.beta)


__all__ = [
    "CaffeConv", "conv_relu", "upsample_factor", "LRN",
    "max_pool_caffe", "avg_pool_caffe", "xavier_caffe",
]
