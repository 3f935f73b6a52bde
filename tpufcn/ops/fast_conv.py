"""TPU-fast convolution variants.

``conv2d_space_to_depth``: a stride-2 convolution with tiny C_in (the
classic RGB stem problem — C_in=3 occupies 3/128 MXU input lanes) is
rewritten as a stride-1 convolution over a 2x2 space-to-depth transform
of the input (C_in*4 lanes), with the kernel re-laid out to match.  The
result is numerically identical (same taps, same zero padding), but the
MXU packing is 4x denser.  Used for GoogLeNet's conv1 7x7/2
(reference models/deploy.prototxt conv1/7x7_s2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth_2x2(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel order (dy, dx, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def _repack_kernel(w: jax.Array, pad: int):
    """(K, K, Cin, Cout) stride-2 kernel -> (nb, nb, 4*Cin, Cout) stride-1
    kernel over 2x2-space-to-depth input, plus the conv padding.

    Tap u maps to input offset u - pad; block index floor(off/2), in-block
    index off mod 2.
    """
    k, _, cin, cout = w.shape
    offs = np.arange(k) - pad
    blocks = offs // 2          # floor division (negatives round down)
    inblock = offs % 2
    bmin, bmax = int(blocks.min()), int(blocks.max())
    nb = bmax - bmin + 1

    wb = jnp.zeros((nb, 2, nb, 2, cin, cout), w.dtype)
    for ui in range(k):
        for vi in range(k):
            wb = wb.at[blocks[ui] - bmin, inblock[ui],
                       blocks[vi] - bmin, inblock[vi]].set(w[ui, vi])
    wb = wb.transpose(0, 2, 1, 3, 4, 5).reshape(nb, nb, 4 * cin, cout)
    return wb, (-bmin, bmax)


def conv2d_space_to_depth(x: jax.Array, w: jax.Array, stride: int, pad: int,
                          preferred_element_type=jnp.float32) -> jax.Array:
    """Stride-2 conv with Caffe geometry via 2x2 space-to-depth.

    Identical output to ``lax.conv_general_dilated(x, w, (2, 2),
    [(pad, pad)]*2)`` for even input sizes.
    """
    assert stride == 2, "space-to-depth path is specialized for stride 2"
    assert x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
    xs = space_to_depth_2x2(x)
    wb, (pl, pr) = _repack_kernel(w, pad)
    return jax.lax.conv_general_dilated(
        xs, wb.astype(x.dtype),
        window_strides=(1, 1),
        padding=((pl, pr), (pl, pr)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred_element_type,
    )
