"""Minimal Caffe prototxt parser + shape inference.

Purpose: structural-parity protection for the hand-transcribed model zoo
(tests/test_prototxt_parity.py).  The reference's models are ~10.5 kLoC of
prototxt (reference models/deploy.prototxt, train/*/...); the flax modules
mirror them by hand, so this module re-derives, from the prototxt text
itself, (a) every learnable conv's geometry and (b) every blob's (C, H, W)
under Caffe's shape rules — and the test asserts the flax zoo against it.

No Caffe dependency: the format is a line-structured protobuf text form —
``key: value`` scalars and ``key { ... }`` nested messages, ``#`` comments,
both quote styles.  Parsed messages are plain dicts mapping each key to a
LIST of values (protobuf fields repeat), with scalars kept as strings.
"""

from __future__ import annotations

import math
import re
from typing import Dict, List, Optional, Tuple

Msg = Dict[str, list]

_TOKEN = re.compile(
    r"""
      "[^"]*"        # double-quoted string
    | '[^']*'        # single-quoted string
    | [{}:]          # structure
    | [^\s{}:#]+     # bare scalar / key
    """,
    re.VERBOSE,
)


def _tokenize(text: str) -> List[str]:
    out: List[str] = []
    for line in text.splitlines():
        # comments run to end of line; quoted '#' does not occur in practice
        line = line.split("#", 1)[0]
        out.extend(_TOKEN.findall(line))
    return out


def _parse_msg(tokens: List[str], pos: int,
               nested: bool = False) -> Tuple[Msg, int]:
    msg: Msg = {}
    n = len(tokens)
    while pos < n:
        tok = tokens[pos]
        if tok == "}":
            if not nested:
                raise ValueError(f"unmatched '}}' at token {pos}")
            return msg, pos + 1
        key = tok
        pos += 1
        if pos >= n:
            raise ValueError(
                f"dangling key {key!r} at end of prototxt (truncated?)")
        if tokens[pos] == ":":
            pos += 1
            if pos >= n:
                raise ValueError(
                    f"missing value for {key!r} at end of prototxt "
                    "(truncated?)")
            if tokens[pos] == "{":  # "key: { ... }" message form
                sub, pos = _parse_msg(tokens, pos + 1, nested=True)
                msg.setdefault(key, []).append(sub)
                continue
            val = tokens[pos]
            pos += 1
            if val and val[0] in "\"'":
                val = val[1:-1]
            msg.setdefault(key, []).append(val)
        elif tokens[pos] == "{":
            sub, pos = _parse_msg(tokens, pos + 1, nested=True)
            msg.setdefault(key, []).append(sub)
        else:
            raise ValueError(f"unexpected token {tokens[pos]!r} after {key!r}")
    if nested:
        # a truncated file (e.g. a partial copy ending mid-layer) must
        # not parse into a silently shorter net
        raise ValueError("unclosed '{' at end of prototxt (truncated?)")
    return msg, pos


def parse_prototxt(text: str) -> Msg:
    """Parse prototxt text into a nested dict-of-lists message.

    Malformed/truncated input (unclosed or unmatched braces, a dangling
    key at EOF) raises ValueError — the structural-parity tests rely on
    a corrupt prototxt failing loudly rather than yielding a partial
    layer list."""
    tokens = _tokenize(text)
    msg, pos = _parse_msg(tokens, 0)
    if pos != len(tokens):  # pragma: no cover - malformed input
        raise ValueError("trailing tokens in prototxt")
    return msg


def first(msg: Msg, key: str, default=None):
    v = msg.get(key)
    return v[0] if v else default


def ints(msg: Msg, key: str) -> List[int]:
    return [int(float(v)) for v in msg.get(key, [])]


def layers(net: Msg, phase: str = "TEST") -> List[Msg]:
    """Layers active in ``phase`` (layers with no include{} run in both)."""
    out = []
    for lyr in net.get("layer", []):
        inc = lyr.get("include")
        if inc and all(first(m, "phase") != phase for m in inc):
            continue
        out.append(lyr)
    return out


_NONUNIFORM_GEOM_KEYS = ("kernel_h", "kernel_w", "stride_h", "stride_w",
                         "pad_h", "pad_w", "dilation")


def _reject_nonuniform(p: Msg, where: str) -> None:
    # only the uniform kernel_size/stride/pad keys are modeled; a
    # prototxt using per-axis keys or dilation must fail loudly, not
    # parse as kernel=0 (none of the reference's prototxts use them)
    used = [k for k in _NONUNIFORM_GEOM_KEYS if p.get(k)]
    if used:
        raise NotImplementedError(
            f"{where}: unsupported geometry keys {used} (only uniform "
            "kernel_size/stride/pad are modeled)")


def conv_geometry(lyr: Msg) -> Dict[str, int]:
    """(num_output, kernel, stride, pad, group) with Caffe defaults."""
    p = first(lyr, "convolution_param", {})
    _reject_nonuniform(p, first(lyr, "name", "conv"))
    return {
        "num_output": int(first(p, "num_output", 0)),
        "kernel": int(first(p, "kernel_size", 0)),
        "stride": int(first(p, "stride", 1)),
        "pad": int(first(p, "pad", 0)),
        "group": int(first(p, "group", 1)),
        "bias": first(p, "bias_term", "true") != "false",
    }


def is_fixed_bilinear(lyr: Msg) -> bool:
    """Deconvolution with a bilinear filler and all-zero lr_mult — the
    reference's fixed upsampling recipe (lr_mult 0, weight_filler
    bilinear, e.g. train/bounding_box/train_val.prototxt:542-562)."""
    p = first(lyr, "convolution_param", {})
    wf = first(p, "weight_filler", {})
    if first(wf, "type") != "bilinear":
        return False
    lrs = [float(first(m, "lr_mult", 1)) for m in lyr.get("param", [])]
    return all(lr == 0.0 for lr in lrs)


Shape = Optional[Tuple[int, int, int]]  # (C, H, W); None = unknown


def _conv_out(h: int, k: int, s: int, p: int) -> int:
    return (h + 2 * p - k) // s + 1


def _pool_out(h: int, k: int, s: int, p: int) -> int:
    # Caffe pooling: ceil mode, with the clip that the last window must
    # start inside the (padded) image.
    out = int(math.ceil((h + 2 * p - k) / s)) + 1
    if p > 0 and (out - 1) * s >= h + p:
        out -= 1
    return out


def infer_shapes(net: Msg, inputs: Dict[str, Tuple[int, int, int]],
                 phase: str = "TEST") -> Dict[str, Shape]:
    """Propagate (C, H, W) blob shapes through the active-phase graph.

    ``inputs`` seeds data-layer tops (and the ``input:`` header blob).
    Blobs fed by unseeded Data/Python layers (e.g. LMDB labels) become
    None and stay unknown through downstream layers.
    """
    blobs: Dict[str, Shape] = dict(inputs)

    # input/input_shape header (deploy nets)
    names = net.get("input", [])
    shapes = net.get("input_shape", [])
    for i, name in enumerate(names):
        if name not in blobs and i < len(shapes):
            dim = ints(shapes[i], "dim")
            if len(dim) == 4:
                blobs[name] = (dim[1], dim[2], dim[3])

    for lyr in layers(net, phase):
        ltype = first(lyr, "type")
        bottoms = lyr.get("bottom", [])
        tops = lyr.get("top", [])
        b0: Shape = blobs.get(bottoms[0]) if bottoms else None

        if ltype == "Input":
            p = first(lyr, "input_param", {})
            shp = first(p, "shape", {})
            dim = ints(shp, "dim") if shp else []
            for t in tops:
                if len(dim) == 4:
                    blobs.setdefault(t, (dim[1], dim[2], dim[3]))
                else:
                    blobs.setdefault(t, None)
        elif ltype in ("Data", "Python", "HDF5Data"):
            for t in tops:
                blobs.setdefault(t, None)
        elif ltype == "Convolution":
            g = conv_geometry(lyr)
            if b0 is None:
                blobs[tops[0]] = None
            else:
                c, h, w = b0
                blobs[tops[0]] = (g["num_output"],
                                  _conv_out(h, g["kernel"], g["stride"],
                                            g["pad"]),
                                  _conv_out(w, g["kernel"], g["stride"],
                                            g["pad"]))
        elif ltype == "Deconvolution":
            g = conv_geometry(lyr)
            if b0 is None:
                blobs[tops[0]] = None
            else:
                c, h, w = b0
                out = lambda x: (x - 1) * g["stride"] + g["kernel"] \
                    - 2 * g["pad"]  # noqa: E731
                blobs[tops[0]] = (g["num_output"], out(h), out(w))
        elif ltype == "Pooling":
            p = first(lyr, "pooling_param", {})
            if b0 is None:
                blobs[tops[0]] = None
            elif first(p, "global_pooling") == "true":
                blobs[tops[0]] = (b0[0], 1, 1)
            else:
                _reject_nonuniform(p, first(lyr, "name", "pool"))
                k = int(first(p, "kernel_size", 0))
                s = int(first(p, "stride", 1))
                pd = int(first(p, "pad", 0))
                blobs[tops[0]] = (b0[0], _pool_out(b0[1], k, s, pd),
                                  _pool_out(b0[2], k, s, pd))
        elif ltype == "Concat":
            parts = [blobs.get(b) for b in bottoms]
            if any(x is None for x in parts):
                blobs[tops[0]] = None
            else:
                blobs[tops[0]] = (sum(x[0] for x in parts),
                                  parts[0][1], parts[0][2])
        elif ltype == "Slice":
            p = first(lyr, "slice_param", {})
            points = ints(p, "slice_point")
            if b0 is None or not points:
                for t in tops:
                    blobs[t] = None
            else:
                edges = [0] + points + [b0[0]]
                for t, lo, hi in zip(tops, edges[:-1], edges[1:]):
                    blobs[t] = (hi - lo, b0[1], b0[2])
        elif ltype == "Eltwise":
            blobs[tops[0]] = b0
        elif ltype in ("ReLU", "Sigmoid", "TanH", "Power", "Dropout",
                       "LRN", "Softmax", "Scale", "BatchNorm", "AbsVal"):
            if tops:
                blobs[tops[0]] = b0
        elif ltype in ("SoftmaxWithLoss", "EuclideanLoss", "L1Loss",
                       "SigmoidCrossEntropyLoss", "Accuracy"):
            for t in tops:
                blobs[t] = None  # scalar losses — not shape-checked
        else:  # pragma: no cover - new layer type appearing in a prototxt
            raise NotImplementedError(f"layer type {ltype!r} "
                                      f"({first(lyr, 'name')})")
    return blobs


__all__ = ["parse_prototxt", "layers", "first", "ints", "conv_geometry",
           "is_fixed_bilinear", "infer_shapes"]
