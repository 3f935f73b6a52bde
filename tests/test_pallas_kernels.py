"""Pallas kernels in interpreter mode (CPU) vs XLA references.

On real TPU these run compiled (exercised by bench.py / the serve
pipeline); the interpreter keeps kernel semantics under CI on the CPU
backend.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpufcn.ops.caffe_layers import lrn_across_channels, max_pool_caffe
from tpufcn.ops.pallas.stem import googlenet_stem_pallas, stem_tail_pallas


def _stem_ref(x, w1, b1, wr, br, w2, b2):
    y = (jnp.asarray(x, jnp.float32) - 127.0).astype(jnp.bfloat16)
    y = jax.lax.conv_general_dilated(
        y, jnp.asarray(w1, jnp.bfloat16), (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = jnp.maximum(y + b1, 0).astype(jnp.bfloat16)
    y = max_pool_caffe(y, 3, 2)
    y = lrn_across_channels(y)
    y = jax.lax.conv_general_dilated(
        y, jnp.asarray(wr, jnp.bfloat16), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = jnp.maximum(y + br, 0).astype(jnp.bfloat16)
    y = jax.lax.conv_general_dilated(
        y, jnp.asarray(w2, jnp.bfloat16), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = jnp.maximum(y + b2, 0).astype(jnp.bfloat16)
    y = lrn_across_channels(y)
    return max_pool_caffe(y, 3, 2)


def _weights(rng):
    return (
        (rng.standard_normal((7, 7, 3, 64)) * 0.05).astype(np.float32),
        (rng.standard_normal(64) * 0.1).astype(np.float32),
        (rng.standard_normal((1, 1, 64, 64)) * 0.05).astype(np.float32),
        (rng.standard_normal(64) * 0.1).astype(np.float32),
        (rng.standard_normal((3, 3, 64, 192)) * 0.05).astype(np.float32),
        (rng.standard_normal(192) * 0.1).astype(np.float32),
    )


@pytest.mark.parametrize("H", [64, 128])
def test_stem_kernel_matches_xla(rng, H):
    """Single- and multi-stripe geometries, bf16-rounding tolerance."""
    ws = _weights(rng)
    x = rng.integers(0, 256, (2, H, H, 3)).astype(np.uint8)
    ref = np.asarray(_stem_ref(x, *ws), np.float32)
    got = np.asarray(
        googlenet_stem_pallas(jnp.asarray(x), *ws, interpret=True),
        np.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=0.26)
    # most entries agree exactly in bf16
    close = np.abs(got - ref) < 1e-3
    assert close.mean() > 0.97


def test_stem_tail_multi_stripe_seams(rng):
    """The stripe-boundary rows (the historical bug surface) on a
    4-stripe geometry."""
    ws = _weights(rng)
    x = rng.integers(0, 256, (1, 448, 448, 3)).astype(np.uint8)
    ref = np.asarray(_stem_ref(x, *ws), np.float32)
    got = np.asarray(
        googlenet_stem_pallas(jnp.asarray(x), *ws, interpret=True),
        np.float32)
    for row in (13, 14, 27, 28, 41, 42, 55):  # stripe seams + ceil edge
        np.testing.assert_allclose(got[0, row], ref[0, row], atol=0.26,
                                   err_msg=f"row {row}")


@pytest.mark.parametrize("shape", [(2, 112, 112, 192), (1, 32, 32, 64)])
def test_lrn_maxpool_kernel_exact(rng, shape):
    """Fused LRN+pool kernel is bit-exact vs the XLA chain it mirrors
    (kept as a documented toolchain probe — see lrn_pool.py STATUS)."""
    from tpufcn.ops.caffe_layers import lrn_across_channels, max_pool_caffe
    from tpufcn.ops.pallas.lrn_pool import lrn_maxpool_pallas
    x = jnp.asarray(rng.standard_normal(shape) * 3, jnp.bfloat16)
    want = max_pool_caffe(lrn_across_channels(x, 5, 1e-4, 0.75), 3, 2)
    got = lrn_maxpool_pallas(x, interpret=True)
    assert jnp.array_equal(want, got)


@pytest.mark.parametrize("b", [3, 4, 16])
def test_group_rects_kernel_matches_xla(rng, b):
    """The fused groupRectangles kernel (interpret mode) vs the XLA
    formulation, across instance-batching widths: b=16 -> G=8 lanes per
    grid step, b=4 -> G=4, b=3 -> G=1 (the per-instance fallback)."""
    from tpufcn.ops.group_rects import group_rectangles
    from tpufcn.ops.pallas.group_rects import group_rectangles_pallas

    N = 128
    rects = np.zeros((b, N, 4), np.float32)
    valid = np.zeros((b, N), bool)
    for i in range(b):
        boxes = _clustered(rng, n_clusters=int(rng.integers(1, 5)),
                           per_cluster=int(rng.integers(2, 9)))
        n = min(len(boxes), N)
        rects[i, :n] = boxes[:n]
        valid[i, :n] = True

    got = group_rectangles_pallas(jnp.asarray(rects), jnp.asarray(valid),
                                  group_threshold=3, eps=0.2,
                                  interpret=True)
    for i in range(b):
        want = group_rectangles(jnp.asarray(rects[i]),
                                jnp.asarray(valid[i]),
                                group_threshold=3, eps=0.2)
        assert np.array_equal(np.asarray(got.valid[i]),
                              np.asarray(want.valid)), f"instance {i}"
        m = np.asarray(want.valid)
        assert np.array_equal(np.asarray(got.rects[i])[m],
                              np.asarray(want.rects)[m]), f"instance {i}"
        assert np.array_equal(np.asarray(got.weights[i])[m],
                              np.asarray(want.weights)[m]), f"instance {i}"


def _clustered(rng, n_clusters, per_cluster, jitter=4.0):
    boxes = []
    for _ in range(n_clusters):
        x1 = rng.uniform(0, 300)
        y1 = rng.uniform(0, 300)
        x2 = x1 + rng.uniform(60, 140)
        y2 = y1 + rng.uniform(60, 140)
        for _ in range(per_cluster):
            boxes.append([x1 + rng.normal(0, jitter),
                          y1 + rng.normal(0, jitter),
                          x2 + rng.normal(0, jitter),
                          y2 + rng.normal(0, jitter)])
    return np.asarray(boxes, np.float32)
