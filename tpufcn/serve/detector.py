"""Single-dispatch TPU inference pipeline.

The reference's per-frame path (reference scripts/fcn_object_detector.py
``run_detector``, :54-174) crosses host<->device once for the conv stack
and then decodes grids in Python list-comprehension loops on the host.
Here the entire chain

    raw BGR frames -> preprocess -> forward -> grid decode -> top-K
    candidate select -> groupRectangles NMS -> rescale to frame coords

is ONE jitted XLA program: a single dispatch per batch, nothing returns
to the host until the fixed-capacity detection tensors.  This is the
BASELINE.json north-star structure ("grid decode, boundary adjustment,
and NMS run on-device so the node callback is a single dispatched call").
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpufcn.core.config import DetectorConfig, GridConfig
from tpufcn.models import build as build_model, get_spec
from tpufcn.ops.grid_codec import decode_gridboxes
from tpufcn.ops.group_rects import vote_boxes_batched
from tpufcn.ops.image import demean_bgr, resize_bilinear

# Packing base for the candidate sort payload: two integer coords in
# [-_PACK/2, _PACK/2) pack exactly into one f32 (product < 2^24).
_PACK = 4096.0


def select_candidates(cvg, boxes, valid, K):
    """Top-K candidates by coverage among valid cells.

    Selected with a variadic stable sort carrying the boxes as payload:
    bit-identical to top_k + take (stable, ties by cell index), but
    avoids TPU row gathers, which measure ~3x slower than the payload
    sort.  Sort cost scales with operand count, so the payload is packed
    to two lanes: groupRectangles consumes integer rects (both NMS paths
    cvRound on entry), so the coords are pre-rounded here — bit-identical
    downstream — and two int-valued coords pack exactly into one f32
    (values < 2^24).  Coords are clamped to [-2048, 2047] (4.5x the
    frame; only degenerate regressions land outside).  Validity rides
    the key's sign: invalid cells get score -1 (key +1), valid coverage
    is a sigmoid in [0, 1] (key <= 0), so no separate valid payload is
    needed.

    Args:
      cvg: (..., M) coverage scores in [0, 1].
      boxes: (..., M, 4) decoded cell boxes.
      valid: (..., M) bool.
      K: candidates kept per instance.
    Returns (boxes (..., K, 4) rounded to ints, valid (..., K)).
    """
    score = jnp.where(valid, cvg, -1.0)
    half = _PACK / 2
    r = jnp.clip(jnp.rint(boxes), -half, half - 1) + half
    packed_xy = r[..., 0] * _PACK + r[..., 1]
    packed_wh = r[..., 2] * _PACK + r[..., 3]
    key, packed_xy, packed_wh = jax.lax.sort(
        (-score, packed_xy, packed_wh),
        dimension=-1, num_keys=1, is_stable=True)
    key = key[..., :K]
    packed_xy, packed_wh = packed_xy[..., :K], packed_wh[..., :K]
    bx = jnp.floor(packed_xy / _PACK)
    bw = jnp.floor(packed_wh / _PACK)
    cand_boxes = jnp.stack(
        [bx, packed_xy - bx * _PACK,
         bw, packed_wh - bw * _PACK], axis=-1) - half
    return cand_boxes, key <= 0.0


class DetectionResult(NamedTuple):
    """Fixed-capacity per-class detections, frame coordinates.

    boxes: (B, C, K, 4) int corner boxes (x1, y1, x2, y2).
    confidence: (B, C, K) float log-votes (reference conf = log(weight)).
    valid: (B, C, K) bool.
    """

    boxes: jax.Array
    confidence: jax.Array
    valid: jax.Array

    def to_lists(self):
        """Host-side: list (per image) of (box, label, conf) tuples."""
        boxes = np.asarray(self.boxes)
        conf = np.asarray(self.confidence)
        valid = np.asarray(self.valid)
        out = []
        for b in range(boxes.shape[0]):
            dets = []
            for c in range(boxes.shape[1]):
                for k in np.nonzero(valid[b, c])[0]:
                    dets.append((boxes[b, c, k].tolist(), int(c),
                                 float(conf[b, c, k])))
            out.append(dets)
        return out


def _preprocess(frames: jax.Array, mode: str, net_hw: Tuple[int, int]) -> jax.Array:
    """Family-specific preprocessing on device.

    * "shift127": GoogLeNet DetectNet family — resize raw 0..255 BGR; the
      model itself applies the Power(-127) shift (deploy.prototxt:9-18).
    * "demean": FCN/VGG families — ImageNet-BGR demean + per-image minmax
      (computed at the *input* resolution, as the reference does:
      fcn_object_detector.py:79 demeans before the resize at :80), then
      resize.
    """
    if mode == "shift127" and frames.shape[-3:-1] == net_hw:
        # keep raw uint8: the model's Power(-127) cast fuses into its
        # first transpose/conv, avoiding a materialized f32 frame copy
        return frames
    x = jnp.asarray(frames, jnp.float32)
    if mode == "demean":
        x = demean_bgr(x)
    if x.shape[-3:-1] != net_hw:
        x = resize_bilinear(x, net_hw)
    return x


class Detector:
    """TPU detector over one model family.

    Example:
        det = Detector("googlenet_detectnet")
        result = det(frames_u8)   # (B, H, W, 3) BGR
    """

    def __init__(self,
                 model_name: str = "googlenet_detectnet",
                 config: Optional[DetectorConfig] = None,
                 params: Optional[Any] = None,
                 dtype=jnp.bfloat16,
                 max_candidates: Optional[int] = None,
                 rng_seed: int = 0,
                 model_kwargs: Optional[dict] = None,
                 mesh=None):
        self.spec = get_spec(model_name)
        model_kwargs = dict(model_kwargs or {})
        self.model = build_model(model_name, dtype=dtype, **model_kwargs)
        grid = self.spec.grid
        if "num_classes" in model_kwargs:
            grid = dataclasses.replace(
                grid, num_classes=model_kwargs["num_classes"])
        self.config = config or DetectorConfig(
            grid=grid, model=model_name, max_candidates=max_candidates)
        self.grid = self.config.grid
        if params is None:
            x0 = jnp.zeros((1, grid.im_height, grid.im_width, 3), jnp.float32)
            params = jax.jit(self.model.init)(jax.random.key(rng_seed), x0)
        self.params = params
        self.mesh = mesh
        self._frames_sharding = None
        if mesh is None:
            self._infer = jax.jit(self._infer_impl)
        else:
            # Multi-chip DP serving: shard the batch over the mesh's
            # ``data`` axis with shard_map — each chip runs the FULL
            # per-shard pipeline (forward + decode + NMS, including the
            # Pallas groupRectangles kernel, which has no GSPMD
            # partitioning rule and therefore must stay per-shard).
            # Batch size must be a multiple of the data-axis size.
            try:
                from jax import shard_map
                rep_off = {"check_vma": False}   # jax >= 0.8 spelling
            except ImportError:  # pre-0.8 jax
                from jax.experimental.shard_map import shard_map
                rep_off = {"check_rep": False}
            from jax.sharding import NamedSharding, PartitionSpec as P
            from tpufcn.core.mesh import DATA_AXIS, SPACE_AXIS
            extra = {a: n for a, n in mesh.shape.items()
                     if a not in (DATA_AXIS, SPACE_AXIS) and n > 1}
            if extra:
                raise ValueError(
                    f"Detector(mesh=...) shards over '{DATA_AXIS}' and "
                    f"'{SPACE_AXIS}' only; mesh has extra non-trivial "
                    f"axes {extra} whose chips would run redundant "
                    "replicas — pass a (data, space) mesh, e.g. "
                    "make_mesh(MeshConfig(data=N, space=M))")
            space_n = dict(mesh.shape).get(SPACE_AXIS, 1)
            if space_n > 1:
                # Spatially-sharded serving — the big-frame / fewer-
                # frames-than-chips path (SURVEY.md §5 long-context
                # analog): activations are partitioned over ROWS and
                # GSPMD inserts the conv halo exchanges (single-device
                # parity pinned by tests/test_spatial_inference.py).
                # The stride-16 head grids are tiny, so they are
                # re-gathered to data-only sharding and decode+NMS runs
                # per data shard (the Pallas groupRectangles kernel has
                # no GSPMD partitioning rule and must stay per-shard);
                # the space-axis replicas of the decode are redundant
                # but negligible next to the conv stack.
                data_sh = NamedSharding(mesh, P(DATA_AXIS))

                def spatial_infer(params, frames):
                    cov, bbox = self._forward(params, frames)
                    cov = jax.lax.with_sharding_constraint(cov, data_sh)
                    bbox = jax.lax.with_sharding_constraint(bbox, data_sh)
                    in_hw = (frames.shape[-3], frames.shape[-2])
                    decode = shard_map(
                        lambda c, b: self._decode_nms(c, b, in_hw),
                        mesh=mesh,
                        in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                        out_specs=P(DATA_AXIS), **rep_off)
                    return decode(cov, bbox)

                self._frames_sharding = NamedSharding(
                    mesh, P(DATA_AXIS, SPACE_AXIS))
                self._infer = jax.jit(
                    spatial_infer,
                    in_shardings=(NamedSharding(mesh, P()),   # params repl.
                                  self._frames_sharding))
            else:
                sharded = shard_map(
                    self._infer_impl, mesh=mesh,
                    in_specs=(P(), P(DATA_AXIS)),
                    out_specs=P(DATA_AXIS), **rep_off)
                self._infer = jax.jit(sharded)
                self._frames_sharding = NamedSharding(mesh, P(DATA_AXIS))

    # number of foreground classes actually decoded
    @property
    def num_fg(self) -> int:
        C = self.grid.num_classes
        return C - 1 if self.spec.background_channel is not None else C

    def _forward(self, params, frames):
        """preprocess + model forward -> (coverage, bboxes) grids."""
        grid = self.grid
        x = _preprocess(frames, self.spec.preprocessing,
                        (grid.im_height, grid.im_width))
        out = self.model.apply(params, x)
        return out["coverage"], out["bboxes"]

    def _infer_impl(self, params, frames):
        coverage, bboxes = self._forward(params, frames)
        return self._decode_nms(coverage, bboxes,
                                (frames.shape[-3], frames.shape[-2]))

    def _decode_nms(self, coverage, bboxes, in_hw):
        cfg = self.config
        grid = self.grid
        in_h, in_w = in_hw

        bg = self.spec.background_channel
        if bg is not None:
            # Skip the background coverage channel (reference
            # fcn_object_detector.py:89 reads [1:]) and pair foreground
            # class k with bbox BLOCK k — the block its training
            # encoder writes (grid labels are encoded with object ids
            # shifted past the background channel, train/step.py
            # label_offset; reference encoder likewise uses one-based
            # ids, argumentation_engine.py:82).  The reference's
            # runtime instead pairs sliced index c with block c, i.e.
            # the never-supervised previous block — inconsistent with
            # its own training nets (PARITY.md known deviations).
            keep = [c for c in range(grid.num_classes) if c != bg]
            coverage = coverage[..., keep]
            bboxes = bboxes[..., [4 * c + i for c in keep
                                  for i in range(4)]]
            dec_grid = dataclasses.replace(grid, num_classes=len(keep))
        else:
            dec_grid = grid

        K = min(cfg.candidate_capacity, dec_grid.grid_h * dec_grid.grid_w)

        def per_image(cvg_i, bbox_i):
            return decode_gridboxes(cvg_i, bbox_i, dec_grid,
                                    cfg.detection_threshold)

        boxes, cvg, valid = jax.vmap(per_image)(coverage, bboxes)

        cand_boxes, cand_valid = select_candidates(cvg, boxes, valid, K)
        B, C = cand_boxes.shape[0], cand_boxes.shape[1]
        det = vote_boxes_batched(
            cand_boxes.reshape(B * C, K, 4), cand_valid.reshape(B * C, K),
            cfg.min_boxes, cfg.nms_eps, cfg.min_box_height)
        d_boxes = det.boxes.reshape(B, C, K, 4)
        d_conf = det.confidence.reshape(B, C, K)
        d_valid = det.valid.reshape(B, C, K)

        # resize_detection back to frame coords (reference
        # fcn_object_detector.py:396-405); the reference materializes int
        # boxes before scaling (np.int cast at :123), then the scaled
        # values are assigned into an int array (truncation).
        diff = jnp.array([in_w / grid.im_width, in_h / grid.im_height] * 2,
                         jnp.float32)
        d_boxes = jnp.trunc(jnp.trunc(d_boxes) * diff).astype(jnp.int32)
        return DetectionResult(d_boxes, d_conf, d_valid)

    def __call__(self, frames) -> DetectionResult:
        """frames: (B, H, W, 3) BGR, uint8 or float in [0, 255]."""
        frames = jnp.asarray(frames)
        if self._frames_sharding is not None:
            from tpufcn.core.mesh import DATA_AXIS
            n = self.mesh.shape[DATA_AXIS]
            if frames.shape[0] % n:
                raise ValueError(
                    f"sharded serving needs batch size divisible by the "
                    f"mesh data axis ({n}); got {frames.shape[0]}")
            frames = jax.device_put(frames, self._frames_sharding)
        return self._infer(self.params, frames)

    def forward_fn(self):
        """(fn, params) pair for compile checks / benchmarking the raw
        jitted pipeline without the class wrapper."""
        return self._infer, self.params

    @classmethod
    def from_checkpoint(cls, snapshot_dir: str,
                        model_name: str = "googlenet_detectnet",
                        step: Optional[int] = None,
                        **kwargs) -> "Detector":
        """Load serving weights from a Trainer orbax snapshot directory
        (the .caffemodel-loading path lives in serve/launch.py)."""
        from tpufcn.train.trainer import load_snapshot_params
        det = cls(model_name, **kwargs)
        det.params = load_snapshot_params(snapshot_dir, step)
        return det
