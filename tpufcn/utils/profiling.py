"""Tracing / profiling hooks (SURVEY.md §5).

The reference's only introspection was a commented wall-clock timer
around ``net.forward()`` (reference scripts/fcn_object_detector.py:205,210)
and Caffe's solver display knobs.  tpufcn provides:

* :func:`device_trace` — a context manager around ``jax.profiler`` that
  writes an XPlane trace viewable in XProf/TensorBoard;
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
