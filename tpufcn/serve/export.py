"""AOT serving artifacts (StableHLO export of the serving pipeline).

The reference deploys by shipping ``deploy.prototxt`` + ``.caffemodel``
and rebuilding a Caffe net on the serving host (``load_caffe_model``,
reference fcn_object_detector.py:315-328).  The TPU-native analog is a
serialized StableHLO artifact of the WHOLE jitted pipeline (preprocess
-> forward -> grid decode -> NMS -> rescale): ``jax.export`` captures
the traced computation with its input/output trees, so a serving host
needs only jax, the artifact, and the weights — no model zoo, no
Python model code, no trace/retrace at startup.

Weights stay OUTSIDE the artifact (they are the first call argument),
so a snapshot refresh never re-exports: pair the artifact with a
Trainer orbax snapshot (``load_snapshot_params``) or a ``cli convert``
.npz.

    art = export_detector(det, batch_size=8)        # bytes
    fn = load_exported(art)                         # callable
    res = fn(params, frames_u8)                     # DetectionResult
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax import export as jexport

from tpufcn.serve.detector import DetectionResult, Detector

# the pipeline returns a NamedTuple; its pytree type must be registered
# for (de)serialization under a stable name
try:
    jexport.register_namedtuple_serialization(
        DetectionResult, serialized_name="tpufcn.DetectionResult")
except ValueError:
    pass  # already registered (re-import)


def export_detector(det: Detector,
                    batch_size: int,
                    in_hw: Optional[Tuple[int, int]] = None,
                    platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize ``det``'s full jitted serving pipeline to StableHLO.

    in_hw: incoming frame (H, W) — defaults to the model's native
    geometry (the pipeline resizes on device, so exporting at the
    camera's resolution bakes that resize in).  platforms: lowering
    targets, e.g. ("tpu", "cpu"); defaults to the current backend.
    """
    g = det.grid
    if det.mesh is not None:
        raise ValueError("export captures the single-chip pipeline; "
                         "mesh-sharded serving re-wraps it at load time")
    h, w = in_hw or (g.im_height, g.im_width)
    frames_aval = jax.ShapeDtypeStruct((batch_size, h, w, 3), np.uint8)
    params_avals = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), det.params)
    exp = jexport.export(det._infer,
                         platforms=tuple(platforms) if platforms else None)(
        params_avals, frames_aval)
    return bytes(exp.serialize())


def load_exported(artifact: bytes):
    """Deserialize an artifact into ``fn(params, frames) ->
    DetectionResult`` (jit-compiled on first call for the local
    backend)."""
    exp = jexport.deserialize(bytearray(artifact))
    return jax.jit(exp.call)
