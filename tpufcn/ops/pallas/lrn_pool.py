"""Fused LRN + ceil-mode 3x3/2 max-pool Pallas kernel.

Targets the GoogLeNet stem tail ``conv2/norm2 -> pool2/3x3_s2``
(reference models/deploy.prototxt): under XLA the LRN banded-matmul
materializes a window tensor as large as the input and the pool re-reads
both, costing ~3 HBM passes over a 112x112x192 batch-128 tensor
(~2.5 GB); this kernel reads the conv2 output once per row-stripe and
writes only the pooled 56x56 output (~0.77 GB total).

STATUS: numerically exact and kept under test, but NOT wired into the
model — on this v5e toolchain Mosaic's generated code runs the kernel at
~14.5 ms/128-batch vs ~4.5 ms for the XLA chain it replaces.  A bisect
(copy-only 5.9 / +LRN 5.9 / +row-pool 5.9 / +col-pool 14.5) shows the
column decimation (sublane-pair reshape) alone costs ~8.5 ms; 128-aligned
lane-packed variants (C=256 view) still land ~2x over the XLA chain, and
sub-128 lane slicing crashes the remote Mosaic compiler.  Like
ops/pallas/stem.py, this documents the toolchain boundary: IO-streaming
kernels measure far from the HBM roofline here, so the stem keeps XLA's
banded-matmul LRN + reduce_window pool.

Exact semantics (bf16 rounding):
  * LRN across channels, window 5, alpha/size scaling, beta 0.75 via
    rsqrt(s)*rsqrt(sqrt(s)) — identical formulation to
    tpufcn.ops.caffe_layers.lrn_across_channels (bf16 fast path with
    float32 window accumulation);
  * Caffe ceil-mode 3x3 stride-2 pool: the last window in each axis
    hangs one element past the input edge and maxes against -inf.

Layout notes (why this lowers well where ops/pallas/stem.py did not):
the only tensors in VMEM are (rows, W, C)=( <=17, 112, 192 ) stripes —
C=192 lanes (1.5 registers) and no sub-128 lane concats; pooling is
expressed as static row maxes + one sublane-pair reshape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpufcn.ops.caffe_layers import _lrn_band

NEG = -1e30  # -inf sentinel that survives bf16


def _lrn_bf16(x, band, alpha, size):
    sq = x * x
    win = jnp.dot(sq, band, preferred_element_type=jnp.float32)
    s = 1.0 + (alpha / size) * win
    inv = jax.lax.rsqrt(s) * jax.lax.rsqrt(jax.lax.sqrt(s))
    return (x.astype(jnp.float32) * inv).astype(x.dtype)


def _kernel(x_ref, band_ref, out_ref, *, R: int, H: int, W: int,
            alpha: float, size: int):
    """One image per grid step; stripes of R output rows unrolled."""
    HO, WO = H // 2, W // 2
    S = -(-HO // R)
    band = band_ref[:]
    for s in range(S):
        r0 = s * R                     # first output row of the stripe
        rows = min(R, HO - r0)         # static per stripe
        i0 = 2 * r0                    # first input row
        ni = min(2 * rows + 1, H - i0)  # available input rows (static)
        x = x_ref[0, i0:i0 + ni]       # (ni, W, C)
        y = _lrn_bf16(x, band, alpha, size)

        # row pool: out row r needs input rows 2r, 2r+1, 2r+2
        rmax = []
        for r in range(rows):
            top = 2 * r
            m = jnp.maximum(y[top], y[top + 1])
            if top + 2 < ni:
                m = jnp.maximum(m, y[top + 2])
            rmax.append(m[None])
        m = jnp.concatenate(rmax, axis=0)          # (rows, W, C)

        # col pool: out col c needs cols 2c, 2c+1, 2c+2 (last: 2c+1 only)
        a = m.reshape(rows, WO, 2, m.shape[-1]).max(axis=2)
        shifted = m[:, 2:]                         # cols 2..W-1 (W-2 cols)
        b = shifted.reshape(rows, WO - 1, 2,
                            m.shape[-1])[:, :, 0]  # cols 2c+2, c<WO-1
        # last output col has no 2c+2 neighbour (ceil padding) -> -inf
        pad = jnp.full((rows, 1, m.shape[-1]), NEG, m.dtype)
        out = jnp.maximum(a, jnp.concatenate([b, pad], axis=1))
        out_ref[0, r0:r0 + rows] = out


@functools.partial(jax.jit,
                   static_argnames=("size", "alpha", "beta", "interpret"))
def lrn_maxpool_pallas(x, size: int = 5, alpha: float = 1e-4,
                       beta: float = 0.75, interpret: bool = False):
    """LRN(size, alpha, beta=0.75) then Caffe 3x3/2 ceil max pool.

    x: (B, H, W, C) bf16, H and W even.  Returns (B, H/2, W/2, C) bf16.
    Numerically identical (bf16 rounding) to
    ``max_pool_caffe(lrn_across_channels(x, size, alpha, beta), 3, 2)``.
    """
    assert beta == 0.75, "kernel specializes the Caffe-universal beta"
    B, H, W, C = x.shape
    assert H % 2 == 0 and W % 2 == 0
    R = 8 if (H // 2) % 8 == 0 else H // 2
    band = _lrn_band(C, size).astype(jnp.bfloat16)

    kern = functools.partial(_kernel, R=R, H=H, W=W, alpha=alpha, size=size)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, H // 2, W // 2, C), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H // 2, W // 2, C),
                               lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), band)
