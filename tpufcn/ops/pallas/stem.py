"""Fused Pallas kernel for the GoogLeNet stem tail (EXPERIMENTAL).

The stem (conv1 7x7/2 -> maxpool -> LRN -> conv2_reduce 1x1 -> conv2 3x3
-> LRN -> maxpool; reference models/deploy.prototxt conv1/7x7_s2 ..
pool2/3x3_s2) is bandwidth-bound under XLA: the 112^2 intermediates
round-trip HBM between every op.  This kernel fuses everything from LRN1
onward — LRN1 -> conv2_reduce -> conv2 -> LRN2 -> pool2 — per
(image, row-stripe) in VMEM, so the only HBM traffic for that span is
pool1's output in and the 56-grid output out (~5x less than the
unfused chain).  conv1 + pool1 remain XLA ops: their input/output
channel counts (3/64) pack VMEM tiles poorly (sub-128 lane dims are
padded to full tiles), which makes a whole-stem kernel VMEM-infeasible.

STATUS: numerically exact (bf16-rounding parity with the XLA stem; see
tests/test_pallas_kernels.py) but measured SLOWER than XLA's fused stem
on v5e (~41 vs ~15 ms per 128-batch): the 64/192-channel buffers pad to
128/256 VMEM lanes (2x traffic), and Mosaic's codegen for the pooling
reshapes is far from the roofline.  Not wired into the model; kept as
the starting point for a layout-aware (channel-packed) redesign.
Caffe-exact details preserved:
  * conv2's zero padding applies to conv2_reduce's *output*: rows/cols
    outside [0, H/4) are zeroed after conv2r+relu;
  * ceil-mode pool2: out-of-image window edges max against -inf;
  * LRN window sums are in-VMEM banded matmuls; x^-0.75 as two rsqrts.

Numerics match the XLA stem (bf16 compute) to bf16 rounding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpufcn.ops.caffe_layers import _lrn_band, max_pool_caffe

NEG = -1e30  # -inf sentinel that survives bf16


def _lrn_apply(x, band, alpha=1e-4, size=5):
    """bf16 LRN with banded matmul (beta = 0.75)."""
    sq = x * x
    win = jnp.dot(sq, band, preferred_element_type=jnp.float32)
    s = 1.0 + (alpha / size) * win
    inv = jax.lax.rsqrt(s) * jax.lax.rsqrt(jax.lax.sqrt(s))
    return (x.astype(jnp.float32) * inv).astype(x.dtype)


def _kernel(p1_ref, wr_ref, br_ref, w2_ref, b2_ref, band1_ref, band2_ref,
            out_ref, c2in_scr, l2_scr,
            *, R2: int, S: int, H112: int, W112: int, RB: int):
    N2 = 2 * R2 + 1                       # conv2/LRN2 rows per stripe
    NIN = N2 + 2                          # conv2-in rows
    W56 = W112 // 2
    NB = -(-N2 // RB)

    # One grid step per image; the stripe loop is unrolled inside to
    # amortize grid-step overheads (512 tiny steps measured 3x slower).
    for s in range(S):
        G2 = 2 * R2 * s                   # stripe's first conv2-out row

        if s == 0:
            # scratch pad regions (edge cols, tail rows) are filled once
            # per image: every stripe fully overwrites the live region
            c2in_scr[:] = jnp.zeros(c2in_scr.shape, jnp.bfloat16)
            l2_scr[:] = jnp.full(l2_scr.shape, NEG, jnp.bfloat16)

        # ---- LRN1 + conv2_reduce on the stripe's input rows ------------
        # The input is pre-padded by (1, 2) rows in XLA, so padded row
        # index k holds global row k-1: rows [G2, G2+NIN) cover exactly
        # the wanted window [G2-1, G2+N2] with no edge clamping.
        p1 = p1_ref[0, G2:G2 + NIN]        # (NIN, W112, 64)

        l1 = _lrn_apply(p1, band1_ref[:])
        cr = jnp.dot(l1.reshape(NIN * W112, 64), wr_ref[:],
                     preferred_element_type=jnp.float32)
        cr = jnp.maximum(cr + br_ref[:], 0.0).astype(jnp.bfloat16)
        cr = cr.reshape(NIN, W112, 64)

        # conv2's zero padding: zero rows with global index out of image
        gids = (jax.lax.broadcasted_iota(jnp.int32, (NIN, 1, 1), 0)
                + G2 - 1)
        cr = jnp.where((gids >= 0) & (gids < H112), cr, jnp.bfloat16(0))

        c2in_scr[0:NIN, 1:W112 + 1] = cr

        # ---- conv2 3x3 + fused LRN2 (row blocks, 9 tap matmuls) --------
        def conv2_block(k, _, G2=G2):
            i = k * RB
            r3 = c2in_scr[pl.ds(i, RB + 2)]    # (RB+2, W112+2, 64)
            acc = jnp.zeros((RB * W112, 192), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    lhs = r3[dy:dy + RB, dx:dx + W112, :].reshape(
                        RB * W112, 64)
                    acc = acc + jnp.dot(lhs, w2_ref[3 * dy + dx],
                                        preferred_element_type=jnp.float32)
            o = jnp.maximum(acc + b2_ref[:], 0.0).astype(jnp.bfloat16)
            o = _lrn_apply(o, band2_ref[:]).reshape(RB, W112, 192)
            # -inf ceil/edge mask for pool2
            rid = (jax.lax.broadcasted_iota(jnp.int32, (RB, 1, 1), 0)
                   + G2 + i)
            lid = (jax.lax.broadcasted_iota(jnp.int32, (RB, 1, 1), 0) + i)
            o = jnp.where((rid < H112) & (lid < N2), o, jnp.bfloat16(NEG))
            l2_scr[pl.ds(i, RB), 0:W112] = o
            return 0

        jax.lax.fori_loop(0, NB, conv2_block, 0)
        l2p = l2_scr[:]                    # (l2_rows, W112+2, 192)

        # ---- pool2 3x3/2 (ceil) ----------------------------------------
        qr = jnp.maximum(
            l2p[0:2 * R2].reshape(R2, 2, W112 + 2, 192).max(axis=1),
            l2p[2:2 * R2 + 2].reshape(R2, 2, W112 + 2, 192)[:, 0])
        qc = jnp.maximum(
            qr[:, 0:W112].reshape(R2, W56, 2, 192).max(axis=2),
            qr[:, 2:W112 + 2].reshape(R2, W56, 2, 192)[:, :, 0])

        out_ref[0, R2 * s:R2 * (s + 1)] = qc


@functools.partial(jax.jit, static_argnames=("interpret",))
def stem_tail_pallas(pool1_out, wr, br, w2, b2, interpret: bool = False):
    """LRN1 -> conv2r -> conv2 -> LRN2 -> pool2, fused.

    pool1_out: (B, H112, W112, 64) bf16 (the XLA conv1+pool1 output).
    Weights in nn.Conv layout: wr (1,1,64,64), w2 (3,3,64,192).
    Returns (B, H112/2, W112/2, 192) bf16.
    """
    B, H112, W112, _ = pool1_out.shape
    H56, W56 = H112 // 2, W112 // 2
    R2 = 14 if H56 % 14 == 0 else H56
    S = H56 // R2
    N2 = 2 * R2 + 1
    NIN = N2 + 2
    RB = N2  # single conv2 block per stripe: M = N2*W112 fills the MXU
    NB = -(-N2 // RB)
    l2_rows = max(NB * RB, N2 + 1)
    # padded input rows H112+3 always cover start+NIN (= H112+3 max)

    wrf = jnp.asarray(wr, jnp.float32).reshape(64, 64).astype(jnp.bfloat16)
    w2f = jnp.asarray(w2, jnp.float32).reshape(9, 64, 192).astype(jnp.bfloat16)
    brf = jnp.asarray(br, jnp.float32)[None, :]
    b2f = jnp.asarray(b2, jnp.float32)[None, :]
    band1 = _lrn_band(64, 5).astype(jnp.bfloat16)
    band2 = _lrn_band(192, 5).astype(jnp.bfloat16)

    kern = functools.partial(_kernel, R2=R2, S=S, H112=H112, W112=W112,
                             RB=RB)

    def fixed(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda b, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    # pad rows (1, 2): padded row k = global row k-1, so stripe reads
    # start at G2 and never clamp (pad values are masked in-kernel)
    p1_padded = jnp.pad(pool1_out.astype(jnp.bfloat16),
                        ((0, 0), (1, 2), (0, 0), (0, 0)))

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, H56, W56, 192), jnp.bfloat16),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H112 + 3, W112, 64), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            fixed((64, 64)),
            fixed((1, 64)),
            fixed((9, 64, 192)),
            fixed((1, 192)),
            fixed((64, 64)),
            fixed((192, 192)),
        ],
        out_specs=pl.BlockSpec((1, H56, W56, 192),
                               lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            # NB*RB+2 rows: the last conv2 row-block reads past NIN
            pltpu.VMEM((NB * RB + 2, W112 + 2, 64), jnp.bfloat16),
            pltpu.VMEM((l2_rows, W112 + 2, 192), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(p1_padded, wrf, brf, w2f, b2f, band1, band2)


def googlenet_stem_pallas(x_u8, w1, b1, wr, br, w2, b2,
                          interpret: bool = False):
    """Full stem: raw (B, H, W, 3) BGR -> (B, H/8, W/8, 192) bf16.

    conv1 (space-to-depth fast path) + pool1 run as XLA ops; the rest is
    the fused Pallas tail.  Power(-127) input shift folded in.
    """
    from tpufcn.ops.fast_conv import conv2d_space_to_depth
    x = (jnp.asarray(x_u8, jnp.float32) - 127.0).astype(jnp.bfloat16)
    y = conv2d_space_to_depth(x, jnp.asarray(w1, jnp.bfloat16), 2, 3)
    y = jnp.maximum(y + jnp.asarray(b1, jnp.float32), 0.0).astype(jnp.bfloat16)
    y = max_pool_caffe(y, 3, 2)
    return stem_tail_pallas(y, wr, br, w2, b2, interpret=interpret)
