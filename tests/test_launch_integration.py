"""Full launch-graph integration: detector + point-map nodes on one bus
(the reference's fcn_point_map.launch topology, SURVEY.md C22/C15)."""

import numpy as np
import jax.numpy as jnp

from tpufcn.serve.launch import launch


def test_detector_and_pointmap_graph(rng):
    graph = launch({
        "fcn_object_detector": {
            "type": "detector",
            "params": {"model": "googlenet_detectnet_1cls",
                       "max_candidates": 32},
            "remap": {"image": "/camera/rgb/image_rect_color",
                      "pmap": "/fcn_object_detector/pmap"},
        },
        "fcn_point_map": {
            "type": "point_map",
            "params": {"cluster_tolerance": 0.03,
                       "min_cluster_size": 100},
            "remap": {"cloud": "/camera/depth/points",
                      "mask": "/object_mask",
                      "pmap": "/fcn_object_detector/pmap_mono",
                      "coefficients": "/plane_coefficients"},
        },
        "capture": {
            "type": "capture",
            "params": {"out_dir": "/tmp/tpufcn_cap_test", "label": 1},
        },
    })
    assert set(graph.nodes) == {"fcn_object_detector", "fcn_point_map",
                                "capture"}

    # drive the detector
    frame = rng.integers(0, 256, (448, 448, 3)).astype(np.uint8)
    graph.bus.publish("/camera/rgb/image_rect_color", frame, stamp=0.0)
    graph.spin(2)
    assert graph.nodes["fcn_object_detector"].processed == 1

    # drive the point-map node with a synthetic organized cloud
    h, w = 48, 64
    cloud = np.zeros((h, w, 3), np.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    cloud[..., 0] = xs * 0.01
    cloud[..., 1] = ys * 0.01
    cloud[..., 2] = 1.0
    mask = np.zeros((h, w), np.uint8)
    mask[8:40, 8:56] = 255
    got = []
    graph.bus.subscribe("/output/indices", lambda m: got.append(m.data),
                        queue_size=4)
    graph.bus.publish("/camera/depth/points", cloud, stamp=1.0)
    graph.bus.publish("/object_mask", mask, stamp=1.01)
    graph.bus.publish("/fcn_object_detector/pmap_mono", mask.copy(),
                      stamp=1.02)
    graph.bus.publish("/plane_coefficients", None, stamp=1.03)
    graph.spin(3)
    assert graph.nodes["fcn_point_map"].processed == 1
    assert got and len(got[0]) >= 1
