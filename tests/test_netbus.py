"""Cross-process topic-bus tests (the TCPROS-analog fabric).

Covers the wire protocol end-to-end against BOTH brokers (native C++
poll loop and the pure-Python fallback), synchronizer behaviour over
the network bus, drop-oldest semantics, and a genuine multi-process
node graph: a capture node running in a separate OS process fed over
the broker — the reference's deployment shape
(launch/fcn_point_map.launch:3-19 runs each node as its own process).
"""

import os
import subprocess
import sys
import time

import numpy as np
import pytest

from tpufcn.serve.netbus import (PyBroker, RemoteTopicBus, build_broker,
                                 parse_address, start_broker)


def _wait_for(pred, timeout=5.0, spin=None):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if spin is not None:
            spin()
        if pred():
            return True
        time.sleep(0.01)
    return pred()


@pytest.fixture(params=["native", "python"])
def broker(request):
    handle = start_broker(native="yes" if request.param == "native"
                          else "no")
    yield handle
    handle.stop()


def test_parse_address():
    assert parse_address("tcp://127.0.0.1:45") == ("127.0.0.1", 45)
    assert parse_address("host:9") == ("host", 9)
    with pytest.raises(ValueError):
        parse_address("nocolon")
    with pytest.raises(ValueError):
        parse_address("tcp://host:notaport")


def test_roundtrip_numpy_payload(broker):
    a = RemoteTopicBus(broker.address)
    b = RemoteTopicBus(broker.address)
    try:
        got = []
        b.subscribe("/camera/rgb/image_rect_color",
                    lambda m: got.append(m), queue_size=8)
        time.sleep(0.2)       # SUB must reach the broker before PUB
        img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
        a.publish("/camera/rgb/image_rect_color", img, stamp=7.25)
        assert _wait_for(lambda: got, spin=b.spin_once)
        msg = got[0]
        assert msg.stamp == 7.25
        np.testing.assert_array_equal(msg.data, img)
    finally:
        a.close()
        b.close()


def test_self_delivery_is_local_not_doubled(broker):
    a = RemoteTopicBus(broker.address)
    try:
        got = []
        a.subscribe("/t", lambda m: got.append(m), queue_size=8)
        time.sleep(0.2)
        a.publish("/t", {"k": 1}, stamp=1.0)
        time.sleep(0.3)       # a broker echo would arrive in this window
        a.spin_once()
        assert len(got) == 1
    finally:
        a.close()


def test_drop_oldest_subscriber_queue(broker):
    a = RemoteTopicBus(broker.address)
    b = RemoteTopicBus(broker.address)
    try:
        got = []
        b.subscribe("/t", lambda m: got.append(m), queue_size=2)
        probe = b.subscribe("/probe", lambda m: None, queue_size=1)
        time.sleep(0.2)
        for i in range(5):
            a.publish("/t", i, stamp=float(i))
        # the probe is sent AFTER the burst on the same connection, so
        # once it lands every /t message has been pushed; only then spin
        # (spinning earlier would drain the bounded queue mid-burst)
        a.publish("/probe", "done", stamp=9.0)
        assert _wait_for(lambda: len(probe.queue) > 0)
        b.spin_once()
        assert [m.data for m in got] == [3, 4]
    finally:
        a.close()
        b.close()


def test_exact_time_sync_across_processes_shape(broker):
    """Capture-node style exact-time sync where image and rect come
    from DIFFERENT bus clients (the reference's camera and tracker are
    different processes, image_rect_writer.py:80-84)."""
    from tpufcn.serve.bus import TimeSynchronizer
    cam = RemoteTopicBus(broker.address)
    trk = RemoteTopicBus(broker.address)
    node = RemoteTopicBus(broker.address)
    try:
        fired = []
        TimeSynchronizer(node, ["/image", "/rect"],
                         lambda im, rc: fired.append((im, rc)))
        time.sleep(0.2)
        img = np.zeros((4, 4, 3), np.uint8)
        cam.publish("/image", img, stamp=10.0)
        trk.publish("/rect", (1, 1, 2, 2), stamp=10.5)   # no match
        trk.publish("/rect", (0, 0, 2, 2), stamp=10.0)   # match at 10.0
        assert _wait_for(lambda: fired, spin=node.spin_once)
        im, rc = fired[0]
        assert im.stamp == rc.stamp == 10.0
        assert rc.data == (0, 0, 2, 2)
    finally:
        cam.close()
        trk.close()
        node.close()


def test_native_broker_binary_builds():
    path = build_broker()
    assert os.path.exists(path) and os.access(path, os.X_OK)


def test_pybroker_outbox_bound_drops_oldest():
    """Broker-side outbox bound: frames queued for a stalled subscriber
    are capped at max_outbox, dropping the OLDEST."""
    py = PyBroker(max_outbox=4)
    try:
        client = PyBroker._Client(sock=None, broker=py)
        for i in range(10):
            client.enqueue(b"frame%d" % i)
        assert len(client.outbox) == 4
        assert client.outbox == [b"frame6", b"frame7", b"frame8",
                                 b"frame9"]
    finally:
        py.stop()


def test_reconnect_after_broker_restart():
    """Nodes outlive a fabric restart (ROS nodes survive a roscore
    bounce the same way): the client reconnects, re-subscribes, and
    traffic flows again; publishes during the outage are dropped and
    counted, while LOCAL delivery keeps working throughout."""
    py = PyBroker()
    port = py.port
    a = RemoteTopicBus(f"tcp://127.0.0.1:{port}", retry_interval=0.05)
    b = RemoteTopicBus(f"tcp://127.0.0.1:{port}", retry_interval=0.05)
    try:
        got = []
        b.subscribe("/t", lambda m: got.append(m.data), queue_size=16)
        local = []
        a.subscribe("/t", lambda m: local.append(m.data), queue_size=16)
        time.sleep(0.2)
        a.publish("/t", "before", stamp=1.0)
        assert _wait_for(lambda: got, spin=b.spin_once)

        py.stop()
        time.sleep(0.2)
        a.publish("/t", "during", stamp=2.0)    # broker is down
        a.spin_once()
        assert "during" in local                 # local path unaffected
        assert _wait_for(lambda: a.dropped_publishes >= 1,
                         spin=lambda: a.publish("/t", "during2", stamp=2.5))

        py2 = PyBroker(port=port)
        try:
            # keep publishing until one crosses the restarted broker
            # (reconnect + re-SUB timing is what is under test)
            def attempt():
                a.publish("/t", "after", stamp=3.0)
                b.spin_once()
            assert _wait_for(lambda: "after" in got, spin=attempt,
                             timeout=10)
        finally:
            py2.stop()
    finally:
        a.close()
        b.close()
        py.stop()


def test_multi_process_capture_graph(tmp_path):
    """Full multi-process deployment: broker (native), a capture node in
    a SEPARATE python process (`cli launch --bus --nodes --serve`), and
    this process publishing synced image+rect pairs — the capture node
    must write JPEGs + train.txt in its own process."""
    handle = start_broker(native="auto")
    out_dir = tmp_path / "cap"
    spec_path = tmp_path / "graph.json"
    spec = {
        "capture": {
            "type": "capture",
            "params": {"out_dir": str(out_dir), "label": 2},
            "remap": {"image": "/camera/rgb/image_rect_color",
                      "rect": "/object_rect"},
        }
    }
    import json
    spec_path.write_text(json.dumps(spec))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "tpufcn.cli", "launch", str(spec_path),
         "--bus", handle.address, "--nodes", "capture", "--serve", "60"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    try:
        pub = RemoteTopicBus(handle.address)
        img = np.full((8, 8, 3), 127, np.uint8)
        wrote = False
        # retry-publish until the remote node's SUB has registered.
        # Generous ceiling: on a loaded 1-core host the node process
        # can take >20 s just to import jax before it subscribes
        # (observed flake when a TPU training run shared the core).
        for i in range(450):
            stamp = float(i)
            pub.publish("/camera/rgb/image_rect_color", img, stamp=stamp)
            pub.publish("/object_rect", (1, 1, 4, 4), stamp=stamp)
            time.sleep(0.1)
            if (out_dir / "train.txt").exists():
                wrote = True
                break
        assert wrote, "capture node never wrote (SUB/PUB never met)"
        lines = (out_dir / "train.txt").read_text().strip().splitlines()
        assert lines and lines[0].split()[-1] == "2"    # label plumbed
        jpgs = [p for p in os.listdir(out_dir) if p.endswith(".jpg")]
        assert jpgs
        pub.close()
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
        handle.stop()


def test_payload_encoding_roundtrip():
    """Raw ndarray framing (TCPROS-style binary messages): numeric
    arrays skip pickle on both ends; the decode is a zero-copy
    READ-ONLY view; everything else falls back to pickle."""
    from tpufcn.serve.netbus import (
        _ENC_NDARRAY, _ENC_PICKLE, _decode_payload, _encode_payload)

    for arr in (np.arange(12, dtype=np.uint8).reshape(3, 4),
                np.ones((2, 2), np.float32),
                np.array(5, np.int64),
                np.arange(6, dtype=np.complex64),
                np.zeros((0, 3), np.uint16)):
        parts = _encode_payload(arr)
        assert parts[0][0] == _ENC_NDARRAY
        buf = b"".join(bytes(p) for p in parts)
        out = _decode_payload(memoryview(buf))
        assert out.dtype == arr.dtype and out.shape == arr.shape
        np.testing.assert_array_equal(out, arr)
        assert not out.flags.writeable     # view over the frame buffer

    # non-contiguous input is normalized and still round-trips
    strided = np.arange(24, dtype=np.int32).reshape(4, 6)[::2, ::3]
    buf = b"".join(bytes(p)
                   for p in _encode_payload(strided))
    np.testing.assert_array_equal(_decode_payload(memoryview(buf)), strided)

    # non-array / object payloads ride pickle
    for obj in ({"a": 1}, np.array(["s"], object), [np.ones(2), "x"]):
        parts = _encode_payload(obj)
        assert parts[0][0] == _ENC_PICKLE
        out = _decode_payload(memoryview(b"".join(bytes(p) for p in parts)))
        assert type(out) is type(obj)


def test_mixed_encodings_one_topic(broker):
    """Pickle and raw-ndarray payloads interleave on one topic; the
    remote ndarray arrives as a read-only zero-copy view."""
    a = RemoteTopicBus(broker.address)
    b = RemoteTopicBus(broker.address)
    try:
        got = []
        b.subscribe("/t", lambda m: got.append(m.data), queue_size=8)
        time.sleep(0.2)
        img = np.arange(18, dtype=np.uint8).reshape(2, 3, 3)
        a.publish("/t", {"kind": "meta", "n": 3}, stamp=1.0)
        a.publish("/t", img, stamp=2.0)
        assert _wait_for(lambda: len(got) >= 2, spin=b.spin_once)
        assert got[0] == {"kind": "meta", "n": 3}
        np.testing.assert_array_equal(got[1], img)
        # zero-copy view over the receive buffer (bytearray -> writable)
        assert got[1].base is not None
    finally:
        a.close()
        b.close()
