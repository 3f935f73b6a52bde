"""Composed distributed serving: the cross-process netbus fabric AND a
device-meshed detector in ONE deployment (VERDICT round-2 #7).

Round 2 tested meshes in-process and the netbus across processes but
never composed: here one launch spec runs a (data=2)-mesh detector node
in its OWN OS process on a virtual 8-device CPU mesh (`cli launch
--bus --nodes --serve`), frames are published from THIS process, and
the per-frame rects come back over the broker — the reference's
multi-process graph shape (reference launch/fcn_point_map.launch:3-19)
with the TPU build's GSPMD data-parallel serving inside one node.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np
import pytest

from tpufcn.serve.netbus import RemoteTopicBus, start_broker


@pytest.mark.slow
def test_meshed_detector_across_processes(tmp_path):
    handle = start_broker(native="auto")
    spec_path = tmp_path / "graph.json"
    spec = {
        "det": {
            "type": "detector",
            "params": {"model": "vgg_detectnet_train",
                       "num_classes": 2,
                       "micro_batch": 2,
                       "flush_after_ms": 2000,
                       "max_candidates": 32,
                       "mesh": {"data": 2}},
            "remap": {"image": "/cam"},
        }
    }
    spec_path.write_text(json.dumps(spec))
    env = dict(os.environ,
               TPUFCN_PLATFORM="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    proc = subprocess.Popen(
        [sys.executable, "-m", "tpufcn.cli", "launch", str(spec_path),
         "--bus", handle.address, "--nodes", "det", "--serve", "600"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    got = []
    try:
        pub = RemoteTopicBus(handle.address)
        pub.subscribe("/fcn_object_detector/rects",
                      lambda m: got.append(m), queue_size=64)
        rng = np.random.default_rng(0)
        frame = rng.integers(0, 256, (224, 224, 3)).astype(np.uint8)
        # retry-publish until the remote node's SUB registers AND its
        # first meshed dispatch finishes compiling (minutes on this
        # 1-core host); stamps are unique so responses identify frames
        deadline = time.time() + 540
        i = 0
        while time.time() < deadline and len(got) < 2:
            pub.publish("/cam", frame, stamp=float(i))
            i += 1
            for _ in range(10):
                pub.spin_once()
                time.sleep(0.03)
            if proc.poll() is not None:
                break
        assert proc.poll() is None, (
            "detector process died:\n" + proc.stdout.read()[-3000:])
        assert len(got) >= 2, "no rects came back across the fabric"
        from tpufcn.serve.stream import RectsMsg
        assert all(isinstance(m.data, RectsMsg) for m in got)
        # per-frame responses carry the ORIGINAL frame stamps
        stamps = {m.stamp for m in got}
        assert stamps <= set(float(k) for k in range(i))
        pub.close()
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
        handle.stop()
