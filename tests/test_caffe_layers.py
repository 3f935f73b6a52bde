"""Caffe-semantics ops vs torch (independent golden implementation).

torch.nn.functional LRN / ceil-mode pooling / conv_transpose2d implement
the same semantics as Caffe's layers, giving an oracle that shares no code
with tpufcn.
"""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from tpufcn.ops.caffe_layers import (
    lrn_across_channels, max_pool_caffe, avg_pool_caffe,
    conv_transpose_caffe, bilinear_kernel, upsample_bilinear_caffe)
from tpufcn.ops.image import demean_bgr


def _nchw(x_nhwc):
    return torch.from_numpy(np.moveaxis(x_nhwc, -1, 1).copy())


def _nhwc(t_nchw):
    return np.moveaxis(t_nchw.numpy(), 1, -1)


def test_lrn_matches_torch(rng):
    x = rng.standard_normal((2, 7, 9, 16), dtype=np.float32)
    got = np.asarray(lrn_across_channels(jnp.asarray(x), 5, 1e-4, 0.75))
    want = _nhwc(F.local_response_norm(_nchw(x), size=5, alpha=1e-4,
                                       beta=0.75, k=1.0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_lrn_fp8_storage_input(rng):
    """Serving mode feeds LRN an f8e5m2 STORAGE buffer (pool1's output —
    models/googlenet.py): the fast path must compute through bf16 on the
    same values and emit back in the input dtype."""
    x8 = jnp.asarray(
        rng.standard_normal((2, 7, 9, 16), dtype=np.float32)).astype(
            jnp.float8_e5m2)
    got = lrn_across_channels(x8, 5, 1e-4, 0.75)
    assert got.dtype == jnp.float8_e5m2
    want = lrn_across_channels(x8.astype(jnp.bfloat16), 5, 1e-4, 0.75)
    # same values in, bf16 compute both ways; `got` additionally rounds
    # the bf16 result to e5m2 (half-ulp quantization, up to ~12.5%
    # relative) while `want` stays bf16 — that final rounding is the
    # bound rtol covers
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.13, atol=1e-6)


def test_max_pool_ceil_mode(rng):
    # 224 -> 112 under Caffe ceil mode (floor mode gives 111): the
    # GoogLeNet pool1 case, reference models/deploy.prototxt.
    x = rng.standard_normal((1, 224, 224, 8), dtype=np.float32)
    got = np.asarray(max_pool_caffe(jnp.asarray(x), kernel=3, stride=2))
    want = _nhwc(F.max_pool2d(_nchw(x), 3, 2, padding=0, ceil_mode=True))
    assert got.shape == want.shape == (1, 112, 112, 8)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_max_pool_same_size_inception(rng):
    x = rng.standard_normal((1, 28, 28, 8), dtype=np.float32)
    got = np.asarray(max_pool_caffe(jnp.asarray(x), kernel=3, stride=1, pad=1))
    want = _nhwc(F.max_pool2d(_nchw(x), 3, 1, padding=1, ceil_mode=True))
    assert got.shape == (1, 28, 28, 8)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_avg_pool_pyramid_sizes(rng):
    # The four pyramid pools of reference train/bounding_box/deploy.prototxt
    x = rng.standard_normal((1, 56, 56, 4), dtype=np.float32)
    for k, s, out in [(56, 56, 1), (28, 28, 2), (14, 14, 4), (8, 8, 7)]:
        got = np.asarray(avg_pool_caffe(jnp.asarray(x), k, s))
        want = _nhwc(F.avg_pool2d(_nchw(x), k, s, ceil_mode=True))
        assert got.shape == (1, out, out, 4)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_avg_pool_ceil_slack_divisor(rng):
    """Caffe AVE divides edge windows by the CLIPPED size (pooling_layer
    .cpp: hend = min(hstart+k, height+pad)), not the full kernel area —
    a 6x6 k3 s2 pool's last windows cover only 2 rows/cols."""
    x = rng.standard_normal((1, 6, 6, 2), dtype=np.float32)
    got = np.asarray(avg_pool_caffe(jnp.asarray(x), 3, 2))
    assert got.shape == (1, 3, 3, 2)
    # hand golden with the clipped divisor
    xp = np.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    for i in range(3):
        for j in range(3):
            h = min(2 * i + 3, 6) - 2 * i
            w = min(2 * j + 3, 6) - 2 * j
            want = xp[0, 2*i:2*i+3, 2*j:2*j+3].sum((0, 1)) / (h * w)
            np.testing.assert_allclose(got[0, i, j], want, rtol=1e-5)


def test_conv_transpose_geometry_and_values(rng):
    # Caffe geometry out = (in-1)*s + k - 2p for the reference deconv
    # configs (k8 s4 p2), (k4 s2 p1), (k16 s8 p4), (k13 s7 p3).
    for k, s, p in [(8, 4, 2), (4, 2, 1), (16, 8, 4), (13, 7, 3)]:
        cin, cout, n = 3, 5, 6
        x = rng.standard_normal((1, n, n, cin), dtype=np.float32)
        # torch weight layout (C_in, C_out, kh, kw)
        wt = rng.standard_normal((cin, cout, k, k), dtype=np.float32)
        want = F.conv_transpose2d(_nchw(x), torch.from_numpy(wt),
                                  stride=s, padding=p)
        # our kernel: HWIO of the equivalent forward conv = flip(spatial),
        # then (kh, kw, C_in, C_out)
        w = np.moveaxis(wt[:, :, ::-1, ::-1], (0, 1), (2, 3)).copy()
        import jax
        got = np.asarray(conv_transpose_caffe(
            jnp.asarray(x), jnp.asarray(w), stride=s, pad=p,
            precision=jax.lax.Precision.HIGHEST))
        assert got.shape == tuple(_nhwc(want).shape)
        np.testing.assert_allclose(got, _nhwc(want), rtol=1e-4, atol=1e-4)


def test_bilinear_upsample_matches_torch_grouped_deconv(rng):
    # upscore_pool3 config: k16 s8 p4, depthwise fixed bilinear
    c, n = 11, 9
    x = rng.standard_normal((2, n, n, c), dtype=np.float32)
    got = np.asarray(upsample_bilinear_caffe(jnp.asarray(x), 16, 8, 4))
    k2d = np.asarray(bilinear_kernel(16))
    wt = torch.from_numpy(np.broadcast_to(k2d, (c, 1, 16, 16)).copy())
    want = _nhwc(F.conv_transpose2d(_nchw(x), wt, stride=8, padding=4, groups=c))
    assert got.shape == (2, (n - 1) * 8 + 16 - 8, (n - 1) * 8 + 16 - 8, c)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_separable_upsample_matches_deconv(rng):
    # The MXU-friendly two-matmul restructure must reproduce the
    # depthwise-deconv path exactly for every reference Deconv config:
    # fcn32s k32 s16 p8 (on the 14x14 stride-16 grid), fcn8s k16 s8 p4 /
    # k8 s4 p2 / k4 s2 p1, and the pyramid's non-square grids.
    from tpufcn.ops.caffe_layers import upsample_bilinear_separable
    for k, s, p, n, c in [(32, 16, 8, 14, 12), (16, 8, 4, 9, 11),
                          (8, 4, 2, 7, 44), (4, 2, 1, 5, 3)]:
        x = rng.standard_normal((2, n, n, c), dtype=np.float32)
        want = np.asarray(upsample_bilinear_caffe(jnp.asarray(x), k, s, p))
        got = np.asarray(upsample_bilinear_separable(jnp.asarray(x), k, s, p))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # non-square spatial grid (H != W)
    x = rng.standard_normal((1, 6, 9, 5), dtype=np.float32)
    want = np.asarray(upsample_bilinear_caffe(jnp.asarray(x), 4, 2, 1))
    got = np.asarray(upsample_bilinear_separable(jnp.asarray(x), 4, 2, 1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_bilinear_kernel_values():
    # k=4, f=2, c=0.75: 1-|x/2-0.75| over x=0..3 -> .25, .75, .75, .25
    k = np.asarray(bilinear_kernel(4))
    v = np.array([0.25, 0.75, 0.75, 0.25])
    np.testing.assert_allclose(k, np.outer(v, v), atol=1e-7)


def test_demean_bgr_reference_semantics(rng):
    img = rng.integers(0, 256, size=(32, 32, 3)).astype(np.float32)
    got = np.asarray(demean_bgr(jnp.asarray(img)))
    x = img.copy()
    x[:, :, 0] -= np.float32(104.0069879317889)
    x[:, :, 1] -= np.float32(116.66876761696767)
    x[:, :, 2] -= np.float32(122.6789143406786)
    want = (x - x.min()) / (x.max() - x.min())
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert got.min() == 0.0 and abs(got.max() - 1.0) < 1e-6


def test_demean_bgr_constant_frame_no_nan():
    # A frame whose demeaned values are constant (min == max) must map to
    # zeros, not NaN (the reference divides by zero at
    # fcn_object_detector.py:412).
    from tpufcn.core.config import IMAGENET_BGR_MEAN
    img = jnp.broadcast_to(jnp.asarray(IMAGENET_BGR_MEAN, jnp.float32),
                           (16, 16, 3))
    got = np.asarray(demean_bgr(img))
    assert np.isfinite(got).all()
    np.testing.assert_array_equal(got, 0.0)


def test_demean_host_constant_frame_no_nan():
    from tpufcn.core.config import IMAGENET_BGR_MEAN
    from tpufcn.serve.stream import _demean_host
    img = np.broadcast_to(np.asarray(IMAGENET_BGR_MEAN, np.float32),
                          (8, 8, 3)).copy()
    got = _demean_host(img)
    assert np.isfinite(got).all()
    np.testing.assert_array_equal(got, 0.0)
