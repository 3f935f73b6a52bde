"""Tracing / profiling hooks (SURVEY.md §5).

The reference's only introspection was a commented wall-clock timer
around ``net.forward()`` (reference scripts/fcn_object_detector.py:205,210)
and Caffe's solver display knobs.  tpufcn provides:

* :func:`device_trace` — a context manager around ``jax.profiler`` that
  writes an XPlane trace viewable in XProf/TensorBoard;
* :func:`aggregate_device_trace` — parse the trace's Chrome-format JSON
  directly and aggregate per-HLO-op device time: the only reliable
  per-op attribution on this remote-TPU setup (host-side timing is
  invalid through the tunnel — CLAUDE.md), and it needs no TensorBoard;
* :class:`StageTimer` — named per-stage wall timers with p50/p95/mean
  summaries, used by the stream driver and the trainer.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def aggregate_device_trace(logdir: str,
                           top: int = 0,
                           exclude_outer: bool = True):
    """Aggregate device-op durations from a ``device_trace`` logdir.

    Reads the newest ``*.trace.json.gz`` under
    ``<logdir>/plugins/profile/<run>/`` and sums the duration of every
    complete ("X") event that carries an HLO ``long_name``, keyed by op
    name.  Control-flow wrapper ops (``while...``, ``conditional...``)
    enclose their body ops in the trace and would double-count, so they
    are dropped when ``exclude_outer`` is set.

    Returns a list of ``{"name", "dur_us", "long_name"}`` dicts sorted
    by descending total duration (all occurrences summed); ``top``
    truncates the list when positive.
    """
    import glob
    import gzip
    import json

    paths = sorted(glob.glob(
        f"{logdir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    events = json.load(gzip.open(paths[-1])).get("traceEvents", [])

    durs: Dict[str, float] = defaultdict(float)
    long_names: Dict[str, str] = {}
    for e in events:
        if e.get("ph") != "X" or e.get("dur", 0) <= 0:
            continue
        args = e.get("args", {})
        # TPU traces carry the full HLO in "long_name"; CPU traces only
        # tag events with "hlo_op"
        long_name = args.get("long_name") or args.get("hlo_op")
        if not long_name:
            continue
        name = e.get("name", "")
        if exclude_outer and name.split(".")[0] in ("while", "conditional"):
            continue
        durs[name] += float(e["dur"])
        long_names[name] = long_name
    out = [{"name": k, "dur_us": v, "long_name": long_names[k]}
           for k, v in sorted(durs.items(), key=lambda kv: -kv[1])]
    return out[:top] if top else out


class StageTimer:
    def __init__(self):
        self._samples: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._samples[name].append(time.perf_counter() - t0)

    def record(self, name: str, seconds: float) -> None:
        self._samples[name].append(seconds)

    def summary(self) -> Dict[str, Dict[str, float]]:
        import numpy as np
        out = {}
        for name, vals in self._samples.items():
            arr = np.asarray(vals)
            out[name] = {
                "count": int(arr.size),
                "mean_ms": float(arr.mean() * 1e3),
                "p50_ms": float(np.percentile(arr, 50) * 1e3),
                "p95_ms": float(np.percentile(arr, 95) * 1e3),
                "total_s": float(arr.sum()),
            }
        return out

    def report(self, sink=print) -> None:
        for name, s in sorted(self.summary().items()):
            sink(f"{name}: n={s['count']} mean={s['mean_ms']:.2f}ms "
                 f"p50={s['p50_ms']:.2f}ms p95={s['p95_ms']:.2f}ms")
