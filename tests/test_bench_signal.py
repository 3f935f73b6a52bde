"""bench.py signal resilience: a harness timeout (SIGTERM) during the
multi-hour gate phase must flush the already-measured headline as the
single JSON result line instead of losing the whole run, and
BENCH_PENDING.json must mirror it on disk against a SIGKILL.

Companion: Trainer.fit honors TPUFCN_TRAIN_NO_SIGNAL_HANDLERS=1 so the
bench-level handler stays active through gate training (otherwise the
cooperative-stop handler would consume the harness's SIGTERM as a
training snapshot request).
"""

import json
import os
import signal
import subprocess
import sys

import cv2 as cv
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

from tpufcn.core.config import DataConfig, GridConfig, TrainConfig  # noqa: E402
from tpufcn.data.manifest import MaskSample  # noqa: E402
from tpufcn.models import build  # noqa: E402
from tpufcn.train.trainer import Trainer  # noqa: E402


@pytest.fixture
def tiny_dataset(tmp_path, rng):
    samples = []
    for i in range(3):
        img = rng.integers(0, 80, size=(96, 128, 3)).astype(np.uint8)
        mask = np.zeros((96, 128), np.uint8)
        x, y, w, h = 20 + i * 6, 16, 40, 48
        img[y:y + h, x:x + w] = (200, 60 + 60 * i, 90)
        mask[y:y + h, x:x + w] = 255
        ip, mp = str(tmp_path / f"i{i}.png"), str(tmp_path / f"m{i}.png")
        cv.imwrite(ip, img)
        cv.imwrite(mp, mask)
        samples.append(MaskSample(ip, mp, i % 2, np.array([x, y, w, h])))
    return samples


@pytest.fixture
def pending_state(tmp_path, monkeypatch):
    """Seed bench's module state as if the headline phase completed."""
    monkeypatch.setattr(bench, "GATES_PARTIAL_PATH",
                        str(tmp_path / "GATES_LATEST.json"))
    monkeypatch.setattr(bench, "PENDING_PATH",
                        str(tmp_path / "BENCH_PENDING.json"))
    monkeypatch.setattr(bench, "_pending",
                        {"value": 5123.4, "extra": {"batch": 128}})
    monkeypatch.setattr(bench, "_latest_gates", {})
    return tmp_path


def test_pending_line_and_gate_merge(pending_state):
    """_write_gates_partial persists both artifacts; the pending line is
    the full result JSON with flat trend keys from the partial gates."""
    # gate-less line first (the BENCH_SKIP_GATES=1 / pre-gate shape)
    bench._write_pending()
    line0 = json.loads(open(bench.PENDING_PATH).read())
    assert "gates" not in line0["extra"]
    assert line0["value"] == 5123.4

    gates = {"googlenet": {"exact": {"mAP": 0.646}, "fp8": {"mAP": 0.637}},
             "fcn32s": {"skipped": "budget", "est_s": 600}}
    bench._write_gates_partial(gates)

    saved = json.loads(open(bench.GATES_PARTIAL_PATH).read())
    assert saved["googlenet"]["exact"]["mAP"] == 0.646

    line = json.loads(open(bench.PENDING_PATH).read())
    assert line["value"] == 5123.4
    assert line["vs_baseline"] == pytest.approx(1.025, abs=1e-3)
    assert line["extra"]["map_synthetic"] == 0.646
    assert line["extra"]["map_synthetic_fp8"] == 0.637
    assert line["extra"]["gates"]["fcn32s"]["skipped"] == "budget"
    # families the partial run never reached flatten to None, not KeyError
    assert line["extra"]["map_hard_vgg_pyramid"] is None


def test_sigterm_flushes_result_line(tmp_path):
    """A real SIGTERM to a bench process with a pending headline prints
    the result line (marked interrupted) and exits 0."""
    script = f"""
import os, signal, sys
sys.path.insert(0, {REPO!r})
import bench
bench.PENDING_PATH = {str(tmp_path / 'p.json')!r}
bench._pending.update({{"value": 4321.0, "extra": {{"batch": 128}}}})
bench._latest_gates.update(
    {{"googlenet": {{"exact": {{"mAP": 0.65}}, "fp8": {{"mAP": 0.64}}}}}})
bench._install_signal_flush()
assert os.environ["TPUFCN_TRAIN_NO_SIGNAL_HANDLERS"] == "1"
os.kill(os.getpid(), signal.SIGTERM)
raise SystemExit("unreachable: handler should have exited")
"""
    out = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    line = json.loads(out.stdout.strip().splitlines()[-1])
    assert line["value"] == 4321.0
    assert line["extra"]["interrupted"] == f"signal {signal.SIGTERM}"
    assert line["extra"]["map_synthetic"] == 0.65


def test_trainer_skips_handlers_under_env(tmp_path, tiny_dataset,
                                          monkeypatch):
    """With TPUFCN_TRAIN_NO_SIGNAL_HANDLERS=1 a SIGTERM mid-fit goes to
    the OUTER handler and training runs to completion (no early stop)."""
    from tpufcn.data.pipeline import CompositeTrainPipeline

    monkeypatch.setenv("TPUFCN_TRAIN_NO_SIGNAL_HANDLERS", "1")
    grid = GridConfig(im_width=64, im_height=64, stride=8, num_classes=2)
    cfg = TrainConfig(
        grid=grid, model="vgg_detectnet_train",
        data=DataConfig(batch_size=2), snapshot_every=0, max_iter=3,
        snapshot_dir=str(tmp_path / "sig"), log_every=1)
    model = build("vgg_detectnet_train", dtype=jnp.float32, num_classes=2)
    tr = Trainer(cfg, model=model, log_sink=lambda s: None)
    pipe = CompositeTrainPipeline(tiny_dataset, grid,
                                  DataConfig(batch_size=2), box_capacity=4)

    seen = []
    prev = signal.signal(signal.SIGTERM, lambda s, f: seen.append(s))
    try:
        def preempting(src):
            for i, b in enumerate(src):
                if i == 1:
                    os.kill(os.getpid(), signal.SIGTERM)
                yield b

        state = tr.fit(preempting(iter(pipe)), max_iter=3, resume=False)
    finally:
        signal.signal(signal.SIGTERM, prev)
    assert int(state.step) == 3          # NOT stopped early
    assert seen == [signal.SIGTERM]      # outer handler saw the signal


def test_alert_tripwire(pending_state, monkeypatch, tmp_path):
    """The headline tripwire (VERDICT r03 #5): a below-target headline
    or a >5% per-family regression vs BENCH_EXPECT.json floors lands an
    ALERT list in the result line; healthy numbers do not."""
    expect = tmp_path / "expect.json"
    expect.write_text(json.dumps({
        "headline_target": 5000.0,
        "family_floors": {"resnet_fpn_img_per_sec": 6500.0}}))
    monkeypatch.setattr(bench, "EXPECT_PATH", str(expect))
    # isolate from the zero-completed-gates alert (tested separately)
    monkeypatch.setenv("BENCH_SKIP_GATES", "1")

    # healthy: headline above target, family above floor
    bench._pending["value"] = 5123.4
    bench._pending["extra"]["resnet_fpn_img_per_sec"] = 6600.0
    line = json.loads(bench._result_line())
    assert "ALERT" not in line["extra"]

    # injected slow headline + regressed family
    bench._pending["value"] = 4800.0
    bench._pending["extra"]["resnet_fpn_img_per_sec"] = 6000.0
    line = json.loads(bench._result_line())
    alerts = line["extra"]["ALERT"]
    assert any("BELOW target" in a for a in alerts)
    assert any("resnet_fpn" in a for a in alerts)
    # within the 5% tolerance band: no family alert
    bench._pending["extra"]["resnet_fpn_img_per_sec"] = 6300.0
    line = json.loads(bench._result_line())
    assert all("resnet_fpn" not in a for a in line["extra"]["ALERT"])


def test_gates_completed_field(pending_state):
    """gates_completed (VERDICT r03 #8) counts only real results —
    skipped/error entries are incomplete, and the field always exists.
    The denominator comes from the ONE source of truth
    (bench_gate_configs — VERDICT r04 #2)."""
    from tpufcn.train.gates import bench_gate_configs
    n = len(bench_gate_configs())
    line = json.loads(bench._result_line())
    assert line["extra"]["gates_completed"] == f"0/{n}"
    bench._write_gates_partial({
        "googlenet": {"exact": {"mAP": 0.6}},
        "fcn32s": {"skipped": "budget", "est_s": 600},
        "vgg_pyramid": {"error": "ValueError: boom"},
        "voc_fixture": {"mAP": 0.4},
    })
    line = json.loads(bench._result_line())
    assert line["extra"]["gates_completed"] == f"2/{n}"


def test_cost_analysis_counts_scan_body_once():
    """bench's train-MFU divisor (batch alone, NOT batch x
    steps_per_dispatch) rests on XLA costing a lax.scan body ONCE
    regardless of trip count; r04 divided by both and reported a 10x-low
    6.35% (VERDICT r04 #4).  If a jax upgrade changes the convention,
    this fails loudly and the divisor must be revisited."""
    import jax

    a = jnp.zeros((64, 64), jnp.float32)

    def scan_n(n):
        def fn(x):
            def body(c, _):
                return c @ x, None
            c, _ = jax.lax.scan(body, x, None, length=n)
            return c
        return fn

    def flops(fn):
        c = jax.jit(fn).lower(a).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", 0.0))

    f1, f8 = flops(scan_n(1)), flops(scan_n(8))
    assert f1 > 0
    # the len-8 graph may add a couple of scalar loop-counter flops;
    # a body-times-trip-count convention would be ~8x, not ~1.00x
    assert abs(f8 - f1) < 0.01 * f1


def test_tracked_gates_single_source_of_truth():
    """bench's tracked-gate list is DERIVED from bench_gate_configs —
    the r04 artifact's 0/7 denominator came from a drifted static copy
    (VERDICT r04 weak #3)."""
    from tpufcn.train.gates import bench_gate_configs
    assert bench._tracked_gates() == tuple(bench_gate_configs())


def test_zero_gates_alert(pending_state, monkeypatch):
    """An artifact with NO completed accuracy gates is loud (VERDICT
    r04 #2): ALERT fires when gates_completed is 0/N unless gates were
    explicitly skipped via BENCH_SKIP_GATES=1."""
    monkeypatch.delenv("BENCH_SKIP_GATES", raising=False)
    line = json.loads(bench._result_line())
    assert any("NO accuracy gates" in a
               for a in line["extra"].get("ALERT", []))
    # one completed gate clears it
    bench._write_gates_partial({"googlenet": {"exact": {"mAP": 0.6}}})
    line = json.loads(bench._result_line())
    assert all("NO accuracy gates" not in a
               for a in line["extra"].get("ALERT", []))
    # explicit skip (dev runs) does not alert
    bench._write_gates_partial({})
    monkeypatch.setenv("BENCH_SKIP_GATES", "1")
    line = json.loads(bench._result_line())
    assert all("NO accuracy gates" not in a
               for a in line["extra"].get("ALERT", []))
