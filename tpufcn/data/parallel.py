"""Multi-process host input pipeline.

The reference's data layer runs imread + compositing + label building
synchronously inside every solver iteration on one Python thread
(reference scripts/data_argumentation_layer/data_argumentation_layer.py:
75-124) — the known host bottleneck.  ``tpufcn.data.prefetch`` moves that
work to ONE background thread, which overlaps it with device steps but is
still GIL/core-bound: a single thread of cv2+numpy compositing cannot
feed a ~1,000 img/s train step.  This module fans the scene building out
to a pool of worker PROCESSES, each owning an independent
:class:`~tpufcn.data.pipeline.CompositeTrainPipeline` with a derived
seed, pushing ready batches into a bounded queue.

Scaling note: throughput scales with worker count on multi-core hosts;
the development host for this repo has a single core, so the recorded
numbers there (BENCH.md) demonstrate the architecture, not the ceiling.

Workers are started with the ``spawn`` method by default: the parent
typically holds a live TPU client whose internal threads make ``fork``
unsafe.  Everything a worker needs (samples, grid, config) is picklable.
"""

from __future__ import annotations

import multiprocessing as mp
import time
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

from tpufcn.core.config import DataConfig, GridConfig
from tpufcn.data.manifest import MaskSample


def _worker(samples, grid, data_cfg, backgrounds, box_capacity, seed,
            batch_size, q, stop):
    """Build batches forever until ``stop`` is set (runs in a child
    process; imports stay inside so ``spawn`` children never touch jax)."""
    from tpufcn.data.pipeline import CompositeTrainPipeline
    try:
        pipe = CompositeTrainPipeline(samples, grid, data_cfg,
                                      backgrounds=backgrounds,
                                      box_capacity=box_capacity, seed=seed)
        while not stop.is_set():
            q.put(pipe.batch(batch_size))
    except (KeyboardInterrupt, EOFError, BrokenPipeError):
        pass
    except Exception:           # noqa: BLE001 — relayed to the consumer
        # a data error (unreadable image, bad manifest entry) must reach
        # the CONSUMER, not die on the child's stderr while the pool
        # silently shrinks
        import traceback
        try:
            q.put({"__worker_error__": traceback.format_exc()})
        except Exception:
            pass


class ParallelCompositePipeline:
    """Process-pool batch source with the same yield contract as
    :class:`CompositeTrainPipeline` (dict of image/rects/labels/valid/seg).

    Batches arrive in worker-completion order; each worker seeds its own
    rng stream (``seed + 1000 * worker_id``), so the union is the same
    distribution with no duplicate scenes.
    """

    def __init__(self,
                 samples: Sequence[MaskSample],
                 grid: GridConfig,
                 data_cfg: Optional[DataConfig] = None,
                 backgrounds: Optional[Sequence[str]] = None,
                 box_capacity: int = 8,
                 workers: int = 4,
                 depth: int = 8,
                 seed: int = 0,
                 start_method: str = "spawn"):
        self.cfg = data_cfg or DataConfig()
        ctx = mp.get_context(start_method)
        self._queue = ctx.Queue(maxsize=depth)
        self._stop = ctx.Event()
        self._procs = []
        for w in range(max(workers, 1)):
            p = ctx.Process(
                target=_worker,
                args=(list(samples), grid, self.cfg, list(backgrounds or []),
                      box_capacity, seed + 1000 * w, self.cfg.batch_size,
                      self._queue, self._stop),
                daemon=True)
            p.start()
            self._procs.append(p)

    def _get(self) -> Dict[str, np.ndarray]:
        """Queue get that fails loudly when the pool has died (e.g. a
        ``spawn`` parent whose __main__ is not importable) instead of
        blocking forever."""
        import queue as _q
        while True:
            try:
                item = self._queue.get(timeout=5.0)
            except _q.Empty:
                if not any(p.is_alive() for p in self._procs):
                    raise RuntimeError(
                        "all scene-builder workers exited; with "
                        "start_method='spawn' the parent __main__ must be "
                        "importable (a real script or pytest, not stdin)")
                continue
            if isinstance(item, dict) and "__worker_error__" in item:
                raise RuntimeError(
                    "scene-builder worker failed:\n"
                    + item["__worker_error__"])
            return item

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        while True:
            yield self._get()

    def batch(self, batch_size: Optional[int] = None) -> Dict[str, np.ndarray]:
        """One batch (size is fixed per-pipeline; argument kept for
        interface parity with CompositeTrainPipeline)."""
        return self._get()

    def throughput(self, n_batches: int = 8) -> float:
        """Measured composited images/sec arriving at the consumer."""
        _ = self._get()  # let the pool warm up
        t0 = time.perf_counter()
        for _ in range(n_batches):
            _ = self._get()
        dt = time.perf_counter() - t0
        return n_batches * self.cfg.batch_size / dt

    def close(self):
        self._stop.set()
        # drain so workers blocked on a full queue can see the stop flag
        try:
            while not self._queue.empty():
                self._queue.get_nowait()
        except Exception:
            pass
        for p in self._procs:
            p.join(timeout=2.0)
            if p.is_alive():
                p.terminate()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
