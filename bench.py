#!/usr/bin/env python3
"""Headline benchmark: 448x448 images/sec/chip for the full fused
inference pipeline (preprocess -> forward -> grid decode ->
groupRectangles NMS -> rescale), matching the BASELINE.md target
(>= 5000 img/s/chip on TPU v5e).

The headline number uses the Caffe-parity flagship (GoogLeNet
DetectNet, faithful LRN/5x5/stride structure) in its serving
configuration: f8e5m2 activation STORAGE for the large stem tensors
(conv1/LRN1/conv2/LRN2 outputs) and the inception concats; all compute
stays bf16 (see models/googlenet.py store_dtype — e5m2 because trained
conv1 activations saturate e4m3, and its bf16-truncation convert is
VPU-cheap).

Extras report, per VERDICT round-2 #1/#4/#8:
* throughput for EVERY model family — exact AND serving where a preset
  exists (googlenet flagship, resnet_fpn, vgg_pyramid B64, fcn8s B64
  full pipeline, fcn32s B128 fwd+argmax) plus single-frame p50 latency
  and the train step;
* MFU (model FLOPs from XLA cost_analysis / 197 TFLOP/s bf16 peak) for
  the tracked serving graphs;
* the HARD-benchmark accuracy gates (tpufcn/train/gates.py): per-family
  trained mAP/mIoU on multi-class cluttered occluded scenes, exact vs
  fp8-serving, calibrated to a non-saturated ~0.6-0.9 regime; fcn8s
  runs 3 seeds with mean/min/max.  BENCH_SKIP_GATES=1 skips them (they
  train 5 models and dominate wall time).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

# On-device scan length per dispatch.  Each DISPATCH pays a fixed
# ~27 ms remote-tunnel round trip that is an artifact of this
# development setup, not of the pipeline: at 20 iters it inflated the
# per-batch wall time by ~0.7 ms (measured 4,995 vs 5,129 img/s
# interleaved).  At 40 iters the wall measurement matches the
# trace-derived device-time sum (24.96 vs 24.9 ms/batch), i.e. it
# reports the true steady-state throughput.
ITERS = 40

PEAK_BF16_FLOPS = 197e12   # v5e MXU peak, the BENCH.md roofline basis


def _progress(msg):
    print(f"bench: {msg}", file=sys.stderr, flush=True)


def _time_loop(infer, params, frames, iters=ITERS, reps=6,
               out_scalar=None):
    """On-device lax.scan loop with a chained data dependency; host-side
    per-dispatch timing is unreliable through the remote-TPU tunnel
    (see CLAUDE.md), so one dispatch covers `iters` full passes and a
    final value fetch forces completion.  Min over reps (each rep is a
    fresh dispatch; more reps only tighten the min against tunnel/system
    noise — within-process spread is <1%, but single dispatches can be
    unlucky).  ``out_scalar`` reduces the pipeline output to a scalar
    for the carry chain (default: detection-result boxes)."""
    import jax
    import jax.numpy as jnp

    if out_scalar is None:
        out_scalar = lambda out: out.boxes.sum()   # noqa: E731

    @jax.jit
    def loop(p, f):
        def body(c, _):
            out = infer(p, f + c)
            return (out_scalar(out) % 2).astype(jnp.uint8), None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.uint8), None,
                            length=iters)
        return c

    _ = int(np.asarray(loop(params, frames)))  # compile + warm (value fetch)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = int(np.asarray(loop(params, frames)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _flops_per_img(infer, params, frames):
    """Model FLOPs per image from the compiled graph's cost analysis
    (XLA's own count over the EXACT bf16 graph — the 'useful FLOPs'
    numerator of MFU).  None when the backend can't report it."""
    import jax
    try:
        c = jax.jit(infer).lower(params, frames).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        f = float(c.get("flops", 0.0))
        return f / frames.shape[0] if f > 0 else None
    except Exception:
        return None


def _mfu_pct(flops_per_img, img_per_sec):
    if not flops_per_img:
        return None
    return round(flops_per_img * img_per_sec / PEAK_BF16_FLOPS * 100.0, 2)


def _train_throughput(batch=32, steps_per_dispatch=20, reps=4):
    """Training throughput (fwd + bwd + adam) on the reference
    bounding_box parity geometry — 224x224 stride 8, the config
    `caffe train` ran (reference train/bounding_box/train_val.prototxt:
    14,31; batch 32 is the solver's parity batch, BENCH.md records 128
    as the per-chip optimum).  Methodology matches the serving loop:
    one multi-step dispatch covers `steps_per_dispatch` full train
    steps chained through the carried state, a loss fetch forces
    completion, min over reps."""
    import jax.numpy as jnp
    from tpufcn.core.config import DataConfig, GridConfig, TrainConfig
    from tpufcn.models import build
    from tpufcn.train.trainer import Trainer

    grid = GridConfig(224, 224, stride=8, num_classes=11)
    cfg = TrainConfig(
        grid=grid, model="vgg_detectnet_train",
        data=DataConfig(batch_size=batch),
        optimizer="adam", learning_rate=1e-4,
        max_iter=10 ** 9, snapshot_every=0,
        snapshot_dir="/tmp/tpufcn_bench_train", log_every=10 ** 9)
    model = build("vgg_detectnet_train", dtype=jnp.bfloat16,
                  num_classes=11)
    trainer = Trainer(cfg, model=model,
                      steps_per_dispatch=steps_per_dispatch,
                      log_sink=lambda s: None)
    state = trainer.init_state()

    rng = np.random.default_rng(0)
    one = {
        "image": rng.integers(0, 256, size=(batch, 224, 224, 3)
                              ).astype(np.uint8),
        "rects": np.tile(np.array([40, 40, 120, 120], np.float32),
                         (batch, 4, 1)),
        "labels": np.ones((batch, 4), np.int32),
        "valid": np.tile(np.array([True, False, False, False]),
                         (batch, 1)),
    }
    b = trainer.put({k: np.stack([v] * steps_per_dispatch)
                     for k, v in one.items()}, stacked=True)
    state, m = trainer.step_fn(state, b)       # compile + warm
    _ = float(np.asarray(m["loss_total"][-1]))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        state, m = trainer.step_fn(state, b)
        _ = float(np.asarray(m["loss_total"][-1]))
        best = min(best, (time.perf_counter() - t0) / steps_per_dispatch)
    ips = batch / best
    # train MFU (VERDICT r03 #6 / r04 #4): XLA's own FLOP count over
    # the compiled multi-step graph (fwd + bwd + adam + on-device
    # grid-label encode) — same roofline basis as the serving MFUs.
    # cost_analysis counts a lax.scan/while body ONCE regardless of
    # trip count (verified: flops(spd=1) == flops(spd=10) on both a
    # toy matmul scan and this exact graph, and the per-image count
    # 89.8 GFLOP matches the VGG16 hand count 15.3 GMAC x 2 x 3 for
    # fwd+bwd), so the divisor is batch alone — dividing by
    # batch x steps_per_dispatch understated r04's train MFU 10x
    # (6.35% reported, ~63% true).
    mfu = None
    try:
        c = trainer.step_fn.lower(state, b).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        f = float(c.get("flops", 0.0))
        if f > 0:
            mfu = _mfu_pct(f / batch, ips)
    except Exception:
        pass
    return ips, mfu


def _seg_forward(model_name, num_classes=12):
    """fcn32s serving surface: demean + forward + argmax (the seg
    family has no decode/NMS stage)."""
    import jax.numpy as jnp
    from tpufcn.models import build
    from tpufcn.ops.image import demean_bgr

    model = build(model_name, dtype=jnp.bfloat16, num_classes=num_classes)

    def infer(p, x):
        logits = model.apply(p, demean_bgr(x.astype(jnp.float32)))["seg"]
        return jnp.argmax(logits, axis=-1)

    return model, infer


GATES_PARTIAL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "GATES_LATEST.json")

# Wall-clock ceiling for the WHOLE bench process, measured from import
# (round-3 lesson: the driver killed the run with only 2 of 6 gates
# captured — its timeout bounds the whole process, so budgeting the
# gate phase alone under-counts whatever the headline phase spent).
# Observed driver windows: r03 SIGTERM at ~28 min, r04 at ~21-22 min
# (BENCH_r04.json rc 124 with 469s of a 1680s self-budget unspent).
# The self-budget is set NEAR the r03 window (1600 s) rather than the
# conservative minimum: the SIGTERM flush is proven (the r04 artifact
# was parsed from it) and gate results sink to disk after every UNIT,
# so overshooting the real window costs at most one in-flight unit —
# while undershooting wastes minutes that would capture more gates.
# Phase order spends the budget accuracy-first: headline block, then
# gate pass 0 (every tracked family, cheapest first), then throughput
# extras, then extra gate seeds.  BENCH_GATE_BUDGET_S (a
# gate-phase-only ceiling) overrides for standalone gate work.
_T_START = time.time()
TOTAL_BUDGET_S = float(os.environ.get("BENCH_TOTAL_BUDGET_S", 1600))

# Calibrated per-extra wall estimates (warm compile cache; BENCH.md
# round-5): each throughput extra is budget-checked against the global
# deadline so a slow run drops diagnostics, never the final JSON line.
EXTRAS_EST_S = {"exact": 80, "train_b128": 150, "resnet_fpn": 100,
                "vgg_pyramid": 120, "fcn8s": 110, "fcn32s": 90,
                "train_b32": 110}

# Signal resilience: the gate phase makes a full run take hours — an
# external harness timeout (SIGTERM) must not lose the headline that
# was measured in the first ~13 minutes.  Once the headline number
# exists, _pending holds the would-be result; a SIGTERM/SIGINT prints
# it (with whatever gates completed, marked "interrupted") and exits,
# and BENCH_PENDING.json mirrors it on disk against a SIGKILL.
_pending = {}        # {"value": float, "extra": dict} once headline known
_latest_gates = {}   # most recent per-family gate results (partial ok)
PENDING_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_PENDING.json")


def _flatten_gate_keys(gates, extra):
    """Flat per-family trend keys (artifact diffing round over round)."""
    g = gates.get("googlenet", {})
    extra["map_synthetic"] = g.get("exact", {}).get("mAP")
    extra["map_synthetic_fp8"] = g.get("fp8", {}).get("mAP")
    for fam in ("googlenet_3cls", "vgg_pyramid", "fcn8s"):
        r = gates.get(fam, {})
        extra[f"map_hard_{fam}"] = r.get("exact", {}).get("mAP")
        extra[f"map_hard_{fam}_fp8"] = r.get("fp8", {}).get("mAP")
    s = gates.get("fcn32s", {})
    extra["seg_miou_synthetic"] = s.get("exact", {}).get("mIoU")
    extra["seg_miou_synthetic_fp8"] = s.get("fp8", {}).get("mIoU")
    if "voc_fixture" in gates:
        extra["voc_fixture"] = gates["voc_fixture"]
        extra["map_voc_fixture"] = gates["voc_fixture"].get("mAP")


_TRACKED_GATES = None


def _tracked_gates():
    """The tracked gate families, derived from the ONE source of truth
    (train/gates.py bench_gate_configs — VERDICT r04 #2: a static copy
    here drifted and made the r04 gates_completed denominator lie)."""
    global _TRACKED_GATES
    if _TRACKED_GATES is None:
        from tpufcn.train.gates import bench_gate_configs
        _TRACKED_GATES = tuple(bench_gate_configs())
    return _TRACKED_GATES


EXPECT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_EXPECT.json")


def _alerts(value, extra):
    """Headline tripwire (VERDICT r03 #5): loud ALERT entries when the
    headline slips under the 5,000 target or any tracked per-family
    throughput regresses >5% vs the committed floors in
    BENCH_EXPECT.json (update the floors when perf legitimately
    moves).  Returned list lands in extra["ALERT"] and forces a
    nonzero exit — a 2.4% headline margin needs a tripwire, not a
    careful reader.  Zero completed gates is likewise loud (VERDICT
    r04 #2): an artifact with no accuracy evidence must not read as a
    clean pass."""
    out = []
    if (os.environ.get("BENCH_SKIP_GATES") != "1"
            and str(extra.get("gates_completed", "")).startswith("0/")):
        out.append("NO accuracy gates completed — the artifact carries "
                   "no accuracy evidence")
    try:
        with open(EXPECT_PATH) as f:
            expect = json.load(f)
    except Exception:
        return out
    target = expect.get("headline_target", 5000.0)
    if value < target:
        out.append(f"headline {value:.1f} img/s BELOW target {target:.0f}")
    for key, floor in expect.get("family_floors", {}).items():
        got = extra.get(key)
        if got is not None and got < floor * 0.95:
            out.append(f"{key} {got:.1f} regressed >5% vs floor {floor:.1f}")
    return out


def _result_line():
    """The single JSON result line from the current pending state."""
    extra = dict(_pending["extra"])
    if _latest_gates:
        extra["gates"] = dict(_latest_gates)
        _flatten_gate_keys(_latest_gates, extra)
    # self-describing completeness (VERDICT r03 #8): how many tracked
    # gate entries produced a real result, in one glance
    tracked = _tracked_gates()
    done = sum(1 for n in tracked
               if isinstance(_latest_gates.get(n), dict)
               and not ({"skipped", "error"} & _latest_gates[n].keys()))
    extra["gates_completed"] = f"{done}/{len(tracked)}"
    baseline = 5000.0  # BASELINE.md north-star target
    value = round(_pending["value"], 1)
    alerts = _alerts(value, extra)
    if alerts:
        extra["ALERT"] = alerts
    else:
        extra.pop("ALERT", None)
    return json.dumps({
        "metric": "448x448_images_per_sec_per_chip_fwd_decode_nms",
        "value": value,
        "unit": "images/sec",
        "vs_baseline": round(_pending["value"] / baseline, 3),
        "extra": extra,
    })


def _write_pending():
    if _pending:
        with open(PENDING_PATH, "w") as f:
            f.write(_result_line() + "\n")


def _on_signal(signum, frame):
    """Print the best-known result line before dying (harness timeout)."""
    if _pending:
        _pending["extra"]["interrupted"] = f"signal {signum}"
        print(_result_line(), flush=True)
        os._exit(0)
    os._exit(1)


def _install_signal_flush():
    import signal
    for s in (signal.SIGTERM, signal.SIGINT):
        signal.signal(s, _on_signal)
    # Trainer.fit (used by the gate phase) must NOT swap in its own
    # cooperative-stop handlers here, or the harness's SIGTERM would be
    # consumed by a training snapshot instead of flushing the result.
    os.environ["TPUFCN_TRAIN_NO_SIGNAL_HANDLERS"] = "1"


def _write_gates_partial(results):
    """Persist gate results incrementally (survives a mid-run kill)."""
    global _latest_gates
    _latest_gates = results
    with open(GATES_PARTIAL_PATH, "w") as f:
        json.dump(results, f, indent=1)
    _write_pending()


def _gates(deadline, passes=None, prior=None):
    """The tracked accuracy gates on the hard synthetic benchmark
    (tpufcn/train/gates.py; VERDICT round-2 #1).  Trains each family —
    dominates bench wall time; BENCH_SKIP_GATES=1 to skip,
    BENCH_GATE_BUDGET_S bounds the phase."""
    from tpufcn.train.gates import run_bench_gates
    return run_bench_gates(root="/tmp/tpufcn_hardgate", log=_progress,
                           deadline=deadline, sink=_write_gates_partial,
                           passes=passes, prior=prior)


def _wait_for_backend():
    """Bounded wait for a reachable jax backend before any in-process use.

    The axon TPU tunnel can be down for multi-hour stretches (CLAUDE.md):
    the first jax call then hangs FOREVER in a nanosleep retry loop, which
    would hang the whole benchmark run.  Probe the backend in a subprocess
    with a hard timeout and retry until the self-healing tunnel returns
    (deadline via BENCH_TPU_WAIT_S, default 2 h), keeping stdout clean for
    the single JSON result line."""
    import subprocess

    deadline_s = float(os.environ.get("BENCH_TPU_WAIT_S", 7200))
    t0 = time.time()
    while True:
        try:
            out = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].platform)"],
                capture_output=True, timeout=120, text=True)
            if out.returncode == 0:
                return out.stdout.strip()
        except subprocess.TimeoutExpired:
            pass
        waited = time.time() - t0
        if waited > deadline_s:
            raise SystemExit(
                f"bench: jax backend unreachable after {int(waited)}s "
                "(TPU tunnel outage — see CLAUDE.md); raise "
                "BENCH_TPU_WAIT_S to wait longer")
        _progress(f"backend probe failed ({int(waited)}s elapsed); "
                  "TPU tunnel likely down, retrying in 60s")
        time.sleep(60)


def main():
    _wait_for_backend()
    from tpufcn.utils.compile_cache import enable as _enable_cache
    _enable_cache()   # warm compiles across seeds/processes/rounds
    import jax
    import jax.numpy as jnp
    from tpufcn.serve.detector import Detector

    batch = 128
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, size=(batch, 448, 448, 3)).astype(np.uint8))
    extra = {"batch": batch,
             "mode": "e5m2_activation_storage_stem+blocks"}

    # headline: serving configuration (fp8 stem activation storage)
    _progress("flagship serving throughput")
    det = Detector("googlenet_detectnet_serving", dtype=jnp.bfloat16,
                   max_candidates=256)
    dt = _time_loop(det._infer_impl, det.params, frames)
    imgs_per_sec = batch / dt

    # headline exists: from here on a SIGTERM/SIGINT flushes the
    # best-known result line instead of losing the run (the gate phase
    # below can run for hours under an external harness timeout)
    extra["device"] = str(jax.devices()[0])
    _pending.update({"value": imgs_per_sec, "extra": extra})
    _install_signal_flush()
    _write_pending()

    # ---- accuracy gates, pass 0: seed[0] of EVERY tracked family,
    # IMMEDIATELY after the headline block (VERDICT r04 #1b: the gates
    # are the accuracy contract; the throughput extras below are
    # diagnostics and run on leftover budget afterwards)
    if os.environ.get("BENCH_GATE_BUDGET_S"):
        gates_deadline = time.time() + float(
            os.environ["BENCH_GATE_BUDGET_S"])
    else:
        gates_deadline = _T_START + TOTAL_BUDGET_S
    gates0 = None
    run_gates = os.environ.get("BENCH_SKIP_GATES") != "1"
    if run_gates:
        _progress(f"gate pass 0: {max(gates_deadline - time.time(), 0):.0f}s"
                  " of budget remains")
        gates0 = _gates(gates_deadline, passes=(0,))

    # ---- per-family throughput extras (diagnostics + tripwire floors),
    # each budget-checked so the later gate seed passes still get a shot
    def _fits(tag, est):
        left = _T_START + TOTAL_BUDGET_S - time.time()
        if est > left:
            _progress(f"extra[{tag}] skipped (est {est}s > {left:.0f}s left)")
            return False
        _progress(f"{tag} throughput")
        return True

    def _x_exact():
        # exact bf16 parity configuration + headline MFU + single-frame
        # latency (diagnostics of the already-measured headline)
        det_x = Detector("googlenet_detectnet", dtype=jnp.bfloat16,
                         max_candidates=256, params=det.params)
        exact_ips = batch / _time_loop(det_x._infer_impl, det_x.params,
                                       frames)
        extra["exact_bf16_img_per_sec"] = round(exact_ips, 1)
        extra["mfu_pct"] = _mfu_pct(
            _flops_per_img(det_x._infer_impl, det_x.params, frames),
            imgs_per_sec)
        lat_ms = _time_loop(det._infer_impl, det.params,
                            frames[:1]) * 1000.0
        extra["p50_single_frame_ms"] = round(lat_ms, 3)

    def _x_resnet():
        # modern-backbone swap (BASELINE config #5)
        det_r = Detector("resnet_fpn_detectnet", dtype=jnp.bfloat16,
                         max_candidates=256,
                         model_kwargs={"store_dtype": jnp.float8_e5m2})
        ips = batch / _time_loop(det_r._infer_impl, det_r.params, frames)
        extra["resnet_fpn_img_per_sec"] = round(ips, 1)
        det_rx = Detector("resnet_fpn_detectnet", dtype=jnp.bfloat16,
                          max_candidates=256, params=det_r.params)
        extra["resnet_fpn_mfu_pct"] = _mfu_pct(
            _flops_per_img(det_rx._infer_impl, det_rx.params, frames), ips)

    def _x_vgg():
        # VGG pyramid deploy net (C17, 20-class, 448²) — the reference's
        # heaviest serving graph, at its measured-optimal batch 64
        det_v = Detector("vgg_pyramid_detectnet_serving",
                         dtype=jnp.bfloat16, max_candidates=256)
        ips = 64 / _time_loop(det_v._infer_impl, det_v.params, frames[:64])
        extra["vgg_pyramid_img_per_sec"] = round(ips, 1)
        det_vx = Detector("vgg_pyramid_detectnet", dtype=jnp.bfloat16,
                          max_candidates=256, params=det_v.params)
        extra["vgg_pyramid_exact_img_per_sec"] = round(
            64 / _time_loop(det_vx._infer_impl, det_vx.params,
                            frames[:64]), 1)
        extra["vgg_pyramid_mfu_pct"] = _mfu_pct(
            _flops_per_img(det_vx._infer_impl, det_vx.params, frames[:64]),
            ips)

    def _x_fcn8s():
        # FCN-8s bbox (C18, 11-cls, 288², B64, full detector pipeline) —
        # serving preset quantizes backbone stages 1-2 only (BENCH.md)
        f288 = jnp.asarray(rng.integers(0, 256, size=(64, 288, 288, 3)
                                        ).astype(np.uint8))
        det_f = Detector("fcn8s_bbox_serving", dtype=jnp.bfloat16,
                         max_candidates=256)
        ips = 64 / _time_loop(det_f._infer_impl, det_f.params, f288)
        extra["fcn8s_bbox_img_per_sec"] = round(ips, 1)
        det_fx = Detector("fcn8s_bbox", dtype=jnp.bfloat16,
                          max_candidates=256, params=det_f.params)
        extra["fcn8s_bbox_exact_img_per_sec"] = round(
            64 / _time_loop(det_fx._infer_impl, det_fx.params, f288), 1)
        # MFU convention (matches the flagship): useful FLOPs from the
        # EXACT bf16 graph x the tracked serving throughput
        extra["fcn8s_bbox_mfu_pct"] = _mfu_pct(
            _flops_per_img(det_fx._infer_impl, det_fx.params, f288), ips)

    def _x_fcn32s():
        # FCN-32s seg (C19, 12-cls, 224², B128, fwd+argmax)
        f224 = jnp.asarray(rng.integers(0, 256, size=(128, 224, 224, 3)
                                        ).astype(np.uint8))
        model_s, seg_infer = _seg_forward("fcn32s_seg_serving")
        seg_params = jax.jit(model_s.init)(
            jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32))
        seg_scalar = lambda out: out.sum()        # noqa: E731
        ips = 128 / _time_loop(seg_infer, seg_params, f224,
                               out_scalar=seg_scalar)
        extra["fcn32s_seg_img_per_sec"] = round(ips, 1)
        _, seg_infer_x = _seg_forward("fcn32s_seg")
        extra["fcn32s_seg_exact_img_per_sec"] = round(
            128 / _time_loop(seg_infer_x, seg_params, f224,
                             out_scalar=seg_scalar), 1)
        extra["fcn32s_seg_mfu_pct"] = _mfu_pct(
            _flops_per_img(seg_infer_x, seg_params, f224), ips)

    def _x_train128():
        # per-chip training optimum (BENCH.md batch sweep: B128 is the
        # throughput knee on v5e; tracked so a codegen shift is visible)
        t128, mfu128 = _train_throughput(batch=128, steps_per_dispatch=10)
        extra["train_b128_img_per_sec"] = round(t128, 1)
        extra["train_b128_mfu_pct"] = mfu128

    def _x_train32():
        t32, _ = _train_throughput()
        extra["train_b32_img_per_sec"] = round(t32, 1)

    # priority order: flagship exact/MFU/latency first (they qualify
    # the headline), then train B128 (its MFU answers the roofline
    # question), the serving families, and the B32 parity config
    for tag, est, fn in (("flagship exact", EXTRAS_EST_S["exact"],
                          _x_exact),
                         ("train B128", EXTRAS_EST_S["train_b128"],
                          _x_train128),
                         ("resnet_fpn", EXTRAS_EST_S["resnet_fpn"],
                          _x_resnet),
                         ("vgg_pyramid", EXTRAS_EST_S["vgg_pyramid"],
                          _x_vgg),
                         ("fcn8s", EXTRAS_EST_S["fcn8s"], _x_fcn8s),
                         ("fcn32s", EXTRAS_EST_S["fcn32s"], _x_fcn32s),
                         ("train B32", EXTRAS_EST_S["train_b32"],
                          _x_train32)):
        if _fits(tag, est):
            try:
                fn()
            except Exception as e:   # noqa: BLE001 — extras are fail-soft
                _progress(f"extra[{tag}] failed: {type(e).__name__}: {e}")
            _write_pending()

    # ---- accuracy gates, later passes: leftover budget appends seeds
    # to the highest-spread families (VERDICT r04 #9)
    if run_gates:
        _progress(f"gate seed passes: "
                  f"{max(gates_deadline - time.time(), 0):.0f}s of budget"
                  " remains")
        _gates(gates_deadline, passes=range(1, 8), prior=gates0)

    line = _result_line()
    print(line)
    if os.path.exists(PENDING_PATH):
        os.remove(PENDING_PATH)   # clean exit: the line is on stdout
    if json.loads(line)["extra"].get("ALERT"):
        raise SystemExit(3)      # tripwire: loud nonzero exit


if __name__ == "__main__":
    main()
