"""Pallas TPU kernel for across-channel LRN.

LRN is pure bandwidth: per pixel, a C-wide window sum over channels and a
power.  The XLA formulation (tpufcn.ops.caffe_layers.lrn_across_channels)
materializes fp32 intermediates in HBM; this kernel reads the bf16 input
once into VMEM, does the banded window-sum as an in-VMEM MXU dot and the
x^-0.75 as two rsqrts, and writes the bf16 result once — ~6x less HBM
traffic at the GoogLeNet LRN sites (112x112x64 / 112x112x192 at batch).

Layout trick: the op is pixelwise over channels, so the tensor is viewed
as (pixels, C) rows.  When 128 % C == 0, P = 128 // C pixels are packed
per row and the band matrix is block-diagonal — full 128-lane occupancy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpufcn.ops.caffe_layers import _lrn_band


def _kernel(x_ref, band_ref, out_ref, *, alpha, size, k):
    x = x_ref[:]
    sq = jnp.square(x.astype(jnp.float32))
    win = jnp.dot(sq, band_ref[:], preferred_element_type=jnp.float32)
    s = k + (alpha / size) * win
    inv = jax.lax.rsqrt(s) * jax.lax.rsqrt(jax.lax.sqrt(s))
    out_ref[:] = (x.astype(jnp.float32) * inv).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("size", "alpha", "beta", "k"))
def lrn_pallas(x: jax.Array, size: int = 5, alpha: float = 1e-4,
               beta: float = 0.75, k: float = 1.0) -> jax.Array:
    """Caffe LRN via Pallas; beta must be 0.75 (the Caffe-universal value).

    Any NHWC (or other pixel-major) shape; channels last.
    """
    assert beta == 0.75, "pallas LRN specializes beta=0.75"
    shape = x.shape
    c = shape[-1]
    m = int(np.prod(shape[:-1]))

    pack = 128 // c if (c < 128 and 128 % c == 0) else 1
    lanes = c * pack

    rows_per_block = 1024
    block_elems = rows_per_block * lanes
    total = m * c
    # pad the flattened pixel stream to a whole number of blocks
    n_blocks = -(-total // block_elems)
    padded = n_blocks * block_elems
    xf = x.reshape(-1)
    if padded != total:
        xf = jnp.pad(xf, (0, padded - total), constant_values=1)
    x2 = xf.reshape(-1, lanes)

    band = _lrn_band(c, size)
    if pack > 1:
        big = jnp.zeros((lanes, lanes), jnp.float32)
        for i in range(pack):
            big = big.at[i * c:(i + 1) * c, i * c:(i + 1) * c].set(band)
        band = big

    out = pl.pallas_call(
        functools.partial(_kernel, alpha=alpha, size=size, k=k),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((rows_per_block, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lanes, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_per_block, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x2, band)

    return out.reshape(-1)[:total].reshape(shape)
