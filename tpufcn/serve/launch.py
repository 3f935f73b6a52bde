"""Launch-style node-graph wiring (SURVEY.md C22 analog).

The reference wires topics and rosparams through launch files
(reference launch/fcn_object_detector.launch:2-23,
launch/fcn_point_map.launch:3-19).  tpufcn keeps the same shape as a
declarative dict — nodes with params and topic remappings — resolved
onto one in-process TopicBus:

    graph = launch({
        "fcn_object_detector": {
            "type": "detector",
            "params": {"model": "googlenet_detectnet",
                        "detection_threshold": 0.5,
                        "min_boxes": 3, "nms_eps": 0.2,
                        "pretrained_weights": "snapshot.caffemodel"},
            "remap": {"image": "/camera/rgb/image_rect_color"},
        },
        "fcn_point_map": {"type": "point_map", "params": {...}},
    })
    graph.bus.publish(...); graph.spin()
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

from tpufcn.core.config import DetectorConfig
from tpufcn.serve.bus import TopicBus


@dataclasses.dataclass
class LaunchGraph:
    bus: TopicBus
    nodes: Dict[str, Any]

    def spin(self, n: int = 1):
        for _ in range(n):
            self.bus.spin_once()


def _make_detector(bus: TopicBus, params: Dict[str, Any],
                   remap: Dict[str, str]):
    import jax.numpy as jnp
    from tpufcn.models import build, get_spec
    from tpufcn.serve.detector import Detector
    from tpufcn.serve.stream import DetectorNode, TiledSegmenter

    model_name = params.get("model", "googlenet_detectnet")
    spec = get_spec(model_name)
    mkw = {}
    grid = spec.grid
    if "num_classes" in params:
        import dataclasses
        mkw["num_classes"] = int(params["num_classes"])
        grid = dataclasses.replace(grid, num_classes=mkw["num_classes"])
    cfg = DetectorConfig(
        grid=grid,
        detection_threshold=params.get("detection_threshold", 0.5),
        min_boxes=params.get("min_boxes", 3),
        nms_eps=params.get("nms_eps", 0.2),
        model=model_name,
        # None = full grid capacity (every above-threshold cell feeds
        # NMS, like the reference); set for speed — multiples of 128
        # engage the fused Pallas NMS kernel on TPU
        max_candidates=params.get("max_candidates"))

    det_params = None
    weights = params.get("pretrained_weights")
    mode = params.get("mode", "boxes")
    if weights:
        # reference kills the node when model files are missing
        # (fcn_object_detector.py:428-439); same contract here.  Both
        # weight formats load: a .caffemodel file (the reference's
        # launch convention) or a Trainer orbax snapshot DIRECTORY
        # (this framework's native training output).
        import os
        if not os.path.isfile(weights) and not os.path.isdir(weights):
            raise FileNotFoundError(f"PROVIDE PRETRAINED MODEL: {weights}")
        if mode != "tiled":   # tiled mode never runs the box model
            from tpufcn.convert import resolve_weights

            def _init():
                import jax
                model = build(model_name, dtype=jnp.bfloat16, **mkw)
                g = spec.grid
                return jax.jit(model.init)(
                    jax.random.key(0),
                    jnp.zeros((1, g.im_height, g.im_width, 3),
                              jnp.float32))

            det_params = resolve_weights(weights, _init)
    detector = None
    tiled = None
    if mode == "tiled":
        # tiled mode serves through the segmenter alone — building the
        # box Detector here would pay a full model init/compile
        # (30 s-5 min on this host) for an object the node never uses
        tiled = TiledSegmenter(params.get("seg_model", "fcn32s_seg"),
                               prob_thresh=cfg.detection_threshold,
                               stride=params.get("tile_stride", 1))
    else:
        # multi-chip serving from the launch spec: "mesh": {"data": N,
        # "space": M} shards the node's batch over the data axis and
        # (space > 1) row-partitions the conv stack with GSPMD halo
        # exchange — the launch-file analog of
        # Detector(mesh=make_mesh(MeshConfig(...)))
        mesh = None
        if params.get("mesh"):
            from tpufcn.core.config import MeshConfig
            from tpufcn.core.mesh import make_mesh
            m = params["mesh"]
            mesh = make_mesh(MeshConfig(data=int(m.get("data", 1)),
                                        space=int(m.get("space", 1))))
        detector = Detector(model_name, config=cfg, params=det_params,
                            max_candidates=cfg.candidate_capacity,
                            model_kwargs=mkw, mesh=mesh)
    # label manifest -> class display names (reference rosparam
    # ~manifest, fcn_object_detector.launch:8).  The reference silently
    # falls back to generated names when the file is absent
    # (load_label_manifest, fcn_object_detector.py:443) — same here.
    names = None
    manifest = params.get("manifest")
    if manifest:
        import os
        if os.path.isfile(manifest):
            from tpufcn.data.manifest import read_label_names
            names = read_label_names(manifest)
        else:
            import logging
            logging.getLogger(__name__).warning(
                "label manifest %s not found; using object_<i> names",
                manifest)
    return DetectorNode(
        bus, detector=detector, mode=mode, tiled=tiled,
        names=names,
        overlay_topic=params.get("overlay_topic"),
        micro_batch=int(params.get("micro_batch", 1)),
        flush_after_ms=(float(params["flush_after_ms"])
                        if "flush_after_ms" in params else None),
        image_topic=remap.get("image", "image"),
        rects_topic=remap.get("rects", "/fcn_object_detector/rects"),
        pmap_topic=remap.get("pmap", "/fcn_object_detector/pmap"))


def _make_point_map(bus: TopicBus, params: Dict[str, Any],
                    remap: Dict[str, str]):
    from tpufcn.pointmap import PointMapNode
    return PointMapNode(
        bus,
        cloud_topic=remap.get("cloud", "cloud"),
        mask_topic=remap.get("mask", "mask"),
        pmap_topic=remap.get("pmap", "pmap"),
        coef_topic=remap.get("coefficients", "coefficients"),
        cluster_tol=params.get("cluster_tolerance", 0.02),
        min_cluster=params.get("min_cluster_size", 100),
        max_cluster=params.get("max_cluster_size", 25000),
        area_thresh=params.get("rect_thresh", 400))


def _make_capture(bus: TopicBus, params: Dict[str, Any],
                  remap: Dict[str, str]):
    from tpufcn.tools.capture import ImageRectWriter
    return ImageRectWriter(
        bus, out_dir=params.get("out_dir", "capture"),
        label=params.get("label", 1),
        image_topic=remap.get("image", "/camera/rgb/image_rect_color"),
        rect_topic=remap.get("rect", "/object_rect"))


def _make_boundary_refinement(bus: TopicBus, params: Dict[str, Any],
                              remap: Dict[str, str]):
    from tpufcn.tools.boundary_refinement import (
        BoundaryRefiner, BoundaryRefinerNode)
    return BoundaryRefinerNode(
        bus,
        refiner=BoundaryRefiner(
            similarity_thresh=params.get("similarity_distance", 0.5)),
        image_topic=remap.get("image", "/camera/rgb/image_rect_color"),
        rect_topic=remap.get("rect", "/object_rect"),
        out_topic=remap.get("out", "/boundary_refinement/rect"))


def _make_roi_classifier(bus: TopicBus, params: Dict[str, Any],
                         remap: Dict[str, str]):
    from tpufcn.tools.roi_classifier import ROIClassifier, ROIClassifierNode
    clf = params.get("classifier")  # pre-built (e.g. fit_head-trained)
    if clf is None:
        clf = ROIClassifier(num_classes=int(params.get("num_classes", 2)),
                            prob_thresh=params.get("prob_thresh", 0.5))
    return ROIClassifierNode(
        bus, clf,
        image_topic=remap.get("image", "image"),
        rects_topic=remap.get("rects", "/fcn_object_detector/rects"),
        out_topic=remap.get("out", "/rcnn_detector/rects"))


_NODE_TYPES = {
    "detector": _make_detector,
    "point_map": _make_point_map,
    "capture": _make_capture,
    "boundary_refinement": _make_boundary_refinement,
    "roi_classifier": _make_roi_classifier,
}


def launch(config: Dict[str, Dict[str, Any]],
           bus: Optional[TopicBus] = None) -> LaunchGraph:
    bus = bus or TopicBus()
    nodes = {}
    for name, spec in config.items():
        ntype = spec.get("type")
        if ntype not in _NODE_TYPES:
            raise KeyError(f"unknown node type '{ntype}' for '{name}'")
        nodes[name] = _NODE_TYPES[ntype](
            bus, spec.get("params", {}), spec.get("remap", {}))
    return LaunchGraph(bus=bus, nodes=nodes)
