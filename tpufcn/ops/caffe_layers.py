"""Caffe-semantics primitive ops, TPU-native (NHWC, XLA-friendly).

These reproduce the exact numerics of the Caffe layers the reference model
zoo is built from (reference models/*.prototxt, train/*/*.prototxt), so
converted ``.caffemodel`` weights produce bitwise-close outputs:

* across-channel LRN with Caffe's ``alpha/n`` scaling
  (models/deploy.prototxt LRN local_size 5, alpha 1e-4, beta 0.75);
* ceil-mode pooling (Caffe computes output size with ``ceil``, XLA with
  ``floor`` — we pad the bottom/right edge explicitly);
* transposed convolution with Caffe's output geometry
  ``(in-1)*stride + kernel - 2*pad``;
* fixed bilinear depthwise upsampling — every Deconvolution in the
  reference is ``group == channels`` with a frozen bilinear filler and no
  bias (e.g. train/fcn_bbox/train_val.prototxt upscore_* layers), i.e.
  pure bilinear interpolation expressed as a depthwise conv.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _lrn_band(c: int, size: int) -> jnp.ndarray:
    """(C, C) 0/1 band matrix: band[i, j] = 1 iff |i - j| <= size // 2."""
    idx = np.arange(c)
    return jnp.asarray(
        (np.abs(idx[:, None] - idx[None, :]) <= size // 2).astype(np.float32))


def lrn_across_channels(x: jax.Array,
                        size: int = 5,
                        alpha: float = 1e-4,
                        beta: float = 0.75,
                        k: float = 1.0) -> jax.Array:
    """Caffe LRN (across channels): x / (k + alpha/size * sum_win x^2)^beta.

    NHWC input; the window slides over the channel axis with zero padding,
    matching Caffe's ACROSS_CHANNELS norm region (note Caffe divides alpha
    by the local size).

    TPU notes: a sliding window over the channel (lane) axis is slow as a
    reduce_window; instead the window sum is a (C, C) banded matmul that
    rides the MXU.  For the Caffe-universal beta = 0.75 the power is
    computed as s^-0.75 = rsqrt(s) * rsqrt(rsqrt(s)) (two VPU rsqrts)
    instead of a transcendental pow.
    """
    c = x.shape[-1]
    if x.dtype in (jnp.float8_e5m2, jnp.float8_e4m3fn):
        # fp8 STORAGE input (serving mode): the values are fp8-exact, so
        # computing through bf16 loses nothing; reading the 8-bit buffer
        # halves this chain's HBM pull.  Emit back in the input dtype.
        return lrn_across_channels(x.astype(jnp.bfloat16), size, alpha,
                                   beta, k).astype(x.dtype)
    if x.dtype == jnp.bfloat16:
        # fast path: bf16 squares + single-pass MXU matmul (~0.5% scale
        # error -> <0.4% output error; full-precision parity runs use a
        # float32 activation dtype and take the branch below).  A bf16
        # window emission measured end-to-end NEUTRAL (XLA already fuses
        # the f32 window away in context — see BENCH.md negative results),
        # so the f32 emission is kept for numerical headroom.
        sq = jnp.square(x)
        win = jnp.matmul(sq, _lrn_band(c, size).astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
    else:
        sq = jnp.square(x.astype(jnp.float32))
        win = jnp.matmul(sq, _lrn_band(c, size),
                         precision=jax.lax.Precision.HIGHEST)
    s = k + (alpha / size) * win
    if beta == 0.75:
        inv = jax.lax.rsqrt(s) * jax.lax.rsqrt(jax.lax.sqrt(s))
        return (x.astype(jnp.float32) * inv).astype(x.dtype)
    return (x.astype(jnp.float32) / jnp.power(s, beta)).astype(x.dtype)


def _ceil_pool_extra(in_size: int, kernel: int, stride: int, pad: int) -> Tuple[int, int]:
    """Caffe pooled size uses ceil: out = ceil((in + 2p - k)/s) + 1.

    Returns (out_size, extra_end_padding) so an XLA floor-mode window with
    padding (pad, pad + extra) produces the Caffe output size.  Caffe also
    guarantees the last window starts inside the image when pad > 0; all
    reference pools with ceil-slack have pad == 0, and we assert the
    clip rule is not violated otherwise.
    """
    out = int(math.ceil((in_size + 2 * pad - kernel) / stride)) + 1
    if pad > 0 and (out - 1) * stride >= in_size + pad:
        out -= 1
    extra = (out - 1) * stride + kernel - in_size - 2 * pad
    return out, max(extra, 0)


def max_pool_caffe(x: jax.Array, kernel: int, stride: int, pad: int = 0) -> jax.Array:
    """Ceil-mode max pooling over NHWC."""
    h, w = x.shape[-3], x.shape[-2]
    _, eh = _ceil_pool_extra(h, kernel, stride, pad)
    _, ew = _ceil_pool_extra(w, kernel, stride, pad)
    # init_value must be a static scalar (a traced array breaks reverse-mode
    # partial-eval under jit)
    neg = -np.inf if jnp.issubdtype(x.dtype, jnp.floating) \
        else int(jnp.iinfo(x.dtype).min)
    return jax.lax.reduce_window(
        x, neg, jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (pad, pad + eh), (pad, pad + ew), (0, 0)))


def avg_pool_caffe(x: jax.Array, kernel: int, stride: int, pad: int = 0) -> jax.Array:
    """Ceil-mode average pooling with Caffe's AVE divisor: the window
    size clipped to the padded extent — Caffe counts padded zeros up to
    ``in + pad`` but NOT the ceil-slack beyond it
    (caffe pooling_layer.cpp: ``hend = min(hstart + k, height + pad);
    pool_size = (hend - hstart) * (wend - wstart)``).  For exact-fit
    windows (every pool in the committed reference nets) the divisor is
    the full kernel area, as before."""
    h, w = x.shape[-3], x.shape[-2]
    oh, eh = _ceil_pool_extra(h, kernel, stride, pad)
    ow, ew = _ceil_pool_extra(w, kernel, stride, pad)
    s = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (pad, pad + eh), (pad, pad + ew), (0, 0)))

    def sizes(n, out_n):
        starts = np.arange(out_n) * stride - pad
        return np.minimum(starts + kernel, n + pad) - starts

    div = np.asarray(sizes(h, oh)[:, None] * sizes(w, ow)[None, :],
                     np.float32)
    return (s / div[None, :, :, None]).astype(x.dtype)


def conv_transpose_caffe(x: jax.Array,
                         w: jax.Array,
                         stride: int,
                         pad: int,
                         feature_group_count: int = 1,
                         preferred_element_type=jnp.float32,
                         precision=None) -> jax.Array:
    """Transposed conv with Caffe geometry: out = (in-1)*s + k - 2*p.

    Implemented as an input-dilated convolution.  ``w`` is HWIO for the
    *equivalent forward conv* (i.e. already spatially flipped relative to
    Caffe's deconv blob; the weight converter handles flip+transpose —
    bilinear kernels are symmetric so flipping is a no-op for them).

    ``precision=None`` lets the MXU run its fast (bf16-accumulate-fp32)
    path; pass ``jax.lax.Precision.HIGHEST`` for fp32 parity runs.
    """
    k = w.shape[0]
    p = k - 1 - pad
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=((p, p), (p, p)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
        preferred_element_type=preferred_element_type,
        precision=precision,
    ).astype(x.dtype)


def bilinear_kernel(kernel_size: int, dtype=jnp.float32) -> jax.Array:
    """Caffe 'bilinear' filler 2-D kernel (kernel_size, kernel_size).

    f = ceil(k/2); c = (2f - 1 - f%2) / (2f);
    w[y, x] = (1 - |x/f - c|) * (1 - |y/f - c|).
    """
    f = math.ceil(kernel_size / 2.0)
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    ax = np.arange(kernel_size, dtype=np.float64)
    v = 1.0 - np.abs(ax / f - c)
    return jnp.asarray(np.outer(v, v), dtype)


def bilinear_upsample_matrix(in_size: int, kernel: int, stride: int,
                             pad: int) -> np.ndarray:
    """Dense (out, in) interpolation matrix of the 1-D bilinear
    transposed conv: ``U[o, i] = v[o + pad - i*stride]`` for kernel
    offsets inside ``[0, kernel)``, where ``v`` is the 1-D Caffe
    bilinear filler (the 2-D filler is its outer product, so the 2-D
    deconv separates into H- and W-matmuls).  out = (in-1)*s + k - 2p.
    """
    f = math.ceil(kernel / 2.0)
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    v = 1.0 - np.abs(np.arange(kernel, dtype=np.float64) / f - c)
    out = (in_size - 1) * stride + kernel - 2 * pad
    kidx = (np.arange(out)[:, None] + pad
            - np.arange(in_size)[None, :] * stride)
    valid = (kidx >= 0) & (kidx < kernel)
    return np.where(valid, v[np.clip(kidx, 0, kernel - 1)], 0.0
                    ).astype(np.float32)


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def upsample_bilinear_separable(x: jax.Array, kernel: int, stride: int,
                                pad: int,
                                high_precision: bool = True) -> jax.Array:
    """Same math as :func:`upsample_bilinear_caffe`, restructured as two
    dense matmuls (H then W) instead of a depthwise transposed conv.

    TPU rationale: a ``group == C`` deconv with few channels (C = 12 for
    FCN-32s seg) lowers to per-channel convolutions that leave the MXU
    idle — measured 33 % MFU on the fcn32s serving graph where the
    VGG stacks hit ~60 % (BENCH.md round-3 table).  The bilinear filler
    is an outer product, so the 2-D interpolation separates exactly into
    ``out = Uy @ S @ Ux^T`` per (batch, channel) — two dense matmuls
    that ride the MXU and let XLA fuse the consumer (argmax in the seg
    serving surface) instead of scheduling C tiny convolutions.
    Numerics match the deconv path to f32 accumulation order.
    """
    h, w_in = x.shape[-3], x.shape[-2]
    uy = jnp.asarray(bilinear_upsample_matrix(h, kernel, stride, pad))
    ux = jnp.asarray(bilinear_upsample_matrix(w_in, kernel, stride, pad))
    xf = x.astype(jnp.float32)
    precision = jax.lax.Precision.HIGHEST if high_precision else None
    y = jnp.einsum("yh,bhwc->bywc", uy, xf, precision=precision)
    y = jnp.einsum("xw,bywc->byxc", ux, y, precision=precision)
    return y.astype(x.dtype)


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def upsample_bilinear_caffe(x: jax.Array, kernel: int, stride: int, pad: int,
                            high_precision: bool = True) -> jax.Array:
    """Fixed bilinear depthwise transposed conv (all reference Deconvs).

    Equivalent to Caffe ``Deconvolution(group=C, weight_filler=bilinear,
    bias_term=false, lr_mult=0)`` — e.g. reference
    train/fcn_bbox/train_val.prototxt ``upscore_pool3`` (k16 s8 p4).
    Interpolation weights lose visible accuracy in bf16, so this defaults
    to full precision (it is depthwise — negligible FLOPs).
    """
    c = x.shape[-1]
    k2d = bilinear_kernel(kernel, jnp.float32)
    w = jnp.broadcast_to(k2d[:, :, None, None], (kernel, kernel, 1, c))
    precision = jax.lax.Precision.HIGHEST if high_precision else None
    return conv_transpose_caffe(x.astype(jnp.float32), w, stride, pad,
                                feature_group_count=c,
                                precision=precision).astype(x.dtype)
