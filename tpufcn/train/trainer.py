"""Training driver: solver loop + checkpointing + metrics.

Replaces the reference's ``caffe train`` CLI + solver snapshotting
(reference train/train.sh:26, train/*/solver.prototxt snapshot every
5k/10k iters to ``snapshots/``) with a Python loop around the jitted
step: orbax checkpoints (params + optimizer state + step), periodic and
final snapshots, preemption-tolerant resume from the latest checkpoint,
and structured per-step metrics with the solver's smoothed-loss display
cadence (``display: 20, average_loss: 20``).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from tpufcn.core.config import TrainConfig
from tpufcn.core.mesh import make_mesh
from tpufcn.models import build as build_model
from tpufcn.train.step import (
    TrainState, batch_sharding, init_state, make_train_step)


def load_snapshot_params(snapshot_dir: str, step: Optional[int] = None):
    """Params-only restore from a Trainer orbax snapshot directory —
    the serving/eval weight-loading path (the .caffemodel analog lives
    in tpufcn/convert).  Shared by Detector.from_checkpoint and the
    eval CLI."""
    mgr = ocp.CheckpointManager(os.path.abspath(snapshot_dir))
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoints in {snapshot_dir}")
    # restore DEVICE-AGNOSTICALLY (host numpy, then put on the current
    # default device): a target-less restore replays the snapshot's
    # saved sharding metadata, which fails outright when it was written
    # on different hardware (train on TPU -> serve/eval on a CPU host)
    path = os.path.join(os.path.abspath(snapshot_dir), str(step), "default")
    ck = ocp.PyTreeCheckpointer()
    tmeta = ck.metadata(path).item_metadata
    mtree = getattr(tmeta, "tree", tmeta)
    # restore ONLY the params subtree (transforms={} drops the rest):
    # a full-state restore would also materialize the optimizer moments
    # (~2x the params bytes of wasted IO/RAM) just to discard them
    leaves, treedef = jax.tree_util.tree_flatten(mtree["params"])
    restore_args = jax.tree_util.tree_unflatten(
        treedef,
        [ocp.RestoreArgs(restore_type=np.ndarray)] * len(leaves))
    item = jax.tree_util.tree_unflatten(treedef, [0] * len(leaves))
    restored = ck.restore(
        path, args=ocp.args.PyTreeRestore(
            item={"params": item},
            restore_args={"params": restore_args},
            transforms={}))
    return jax.tree_util.tree_map(jnp.asarray, restored["params"])


class MetricLogger:
    """Smoothed-loss console metrics (reference solver display semantics)
    plus throughput/step-time meters."""

    def __init__(self, log_every: int = 20, avg_window: int = 20,
                 sink: Callable[[str], None] = print):
        self.log_every = log_every
        self.window: list = []
        self.avg_window = avg_window
        self.sink = sink
        self._t0 = time.perf_counter()
        self._imgs = 0
        self._step0: Optional[int] = None   # first step seen (resume-aware)
        self.history: list = []

    def update(self, step: int, metrics: Dict[str, jax.Array],
               batch_size: int):
        self._imgs += batch_size
        if self._step0 is None:
            self._step0 = step - 1   # steps completed before this session
        # smoothed loss over the last avg_window ITERATIONS (Caffe
        # solver average_loss semantics), appended every step — the
        # early return below only gates printing.  The device scalar is
        # held UNCONVERTED until a print boundary: float() here would
        # block on the dispatched step every iteration, serializing
        # dispatches (each sync pays the ~40 ms tunnel RTT — CLAUDE.md)
        self.window.append(metrics["loss_total"])
        self.window = self.window[-self.avg_window:]
        if step % self.log_every:
            return
        self.window = [float(v) for v in self.window]
        vals = {k: float(v) for k, v in metrics.items()}
        dt = time.perf_counter() - self._t0
        ips = self._imgs / dt if dt > 0 else 0.0
        done = max(step - self._step0, 1)   # steps THIS session
        line = (f"iter {step}: loss={np.mean(self.window):.6f} "
                + " ".join(f"{k}={v:.5f}" for k, v in vals.items()
                           if k != "loss_total")
                + f" ({ips:.1f} img/s, {dt / done * 1000:.1f} ms/it)")
        self.history.append({"step": step, **vals, "img_per_sec": ips})
        self.sink(line)

    def log_scalars(self, step: int, vals: Dict[str, float]):
        """Out-of-band scalar record (validation metrics): appended to
        the history (and thus --metrics-out JSONL) and printed
        regardless of the display cadence."""
        self.history.append({"step": step, **vals})
        self.sink(f"iter {step}: " + " ".join(
            f"{k}={v:.5f}" if isinstance(v, float) else f"{k}={v}"
            for k, v in vals.items()))


class Trainer:
    """End-to-end training over a host batch iterator."""

    def __init__(self, cfg: TrainConfig,
                 model=None,
                 mesh=None,
                 with_seg: bool = False,
                 steps_per_dispatch: int = 1,
                 validator: Optional[Callable] = None,
                 val_metric: Optional[str] = None,
                 log_sink: Callable[[str], None] = print):
        self.cfg = cfg
        self.model = model or build_model(cfg.model)
        if getattr(self.model, "store_dtype", None) is not None:
            # measured hard negative (BENCH.md): differentiating through
            # fp8 activation-storage converts CRASHES the remote TPU
            # compiler (pipeline_emitter.cc chunk-size check, signal 6).
            # The *_serving registry presets are inference-only; train
            # the exact model and serve its snapshot with the preset.
            raise ValueError(
                f"model '{cfg.model}' has store_dtype="
                f"{self.model.store_dtype}: fp8 activation storage is a "
                "serving-only mode (its backward pass crashes the TPU "
                "compiler) — train the exact model; snapshots "
                "interchange with the serving preset")
        self.with_seg = with_seg
        self.steps_per_dispatch = max(steps_per_dispatch, 1)
        if mesh is None and cfg.mesh.num_devices > 1:
            mesh = make_mesh(cfg.mesh)
        self.mesh = mesh
        try:
            from tpufcn.models.registry import get_spec
            spec = get_spec(cfg.model)
            preprocessing = spec.preprocessing
            bg = spec.background_channel
        except KeyError:
            preprocessing = "demean"
            bg = None
        # background-channel families train with object ids shifted past
        # the background channel (see make_loss_fn label_offset)
        if bg not in (None, 0):
            raise ValueError(
                f"background_channel={bg}: only channel 0 is supported "
                "as the background (the label-offset convention)")
        label_offset = 1 if bg is not None else 0
        if cfg.iter_size > 1 and self.steps_per_dispatch > 1:
            raise ValueError(
                "iter_size > 1 cannot combine with steps_per_dispatch > 1 "
                "(gradient accumulation vs. multi-step dispatch — pick one)")
        if self.steps_per_dispatch > 1:
            from tpufcn.train.step import make_multi_train_step
            self.step_fn = make_multi_train_step(
                self.model, cfg, mesh=mesh, with_seg=with_seg,
                preprocessing=preprocessing, label_offset=label_offset)
        else:
            self.step_fn = make_train_step(self.model, cfg, mesh=mesh,
                                           with_seg=with_seg,
                                           preprocessing=preprocessing,
                                           label_offset=label_offset)
        self._shardings = batch_sharding(mesh) if mesh is not None else None
        self.logger = MetricLogger(cfg.log_every, sink=log_sink)
        self.ckpt_dir = os.path.abspath(cfg.snapshot_dir)
        self._mgr = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=5, create=True))
        # in-training validation (Caffe TEST phase, reference
        # train/bounding_box/solver.prototxt:6-7): `validator` is
        # params -> {metric: float}; see tpufcn.train.validate for the
        # mAP/mIoU validators.  Selection metric for best-checkpoint
        # retention defaults to the first key the validator returns.
        self.validator = validator
        self.val_metric = val_metric
        self.best: Optional[Dict] = None
        self._best_mgr = None
        if validator is not None and not cfg.eval_every:
            raise ValueError(
                "a validator was given but cfg.eval_every is 0 — set "
                "TrainConfig.eval_every to the validation cadence")

    # --- checkpointing (reference: solver snapshot .caffemodel/.solverstate)
    def save(self, state: TrainState):
        self._mgr.save(int(state.step),
                       args=ocp.args.StandardSave(_to_save(state)))
        self._mgr.wait_until_finished()

    def restore_latest(self, state: TrainState) -> TrainState:
        latest = self._mgr.latest_step()
        if latest is None:
            return state
        restored = self._mgr.restore(
            latest, args=ocp.args.StandardRestore(_to_save(state)))
        return state.replace(
            step=restored["step"],
            params=restored["params"],
            opt_state=restored["opt_state"],
            dropout_rng=state.dropout_rng)

    def _run_validation(self, state: TrainState, step: int):
        """Score held-out data and retain the best checkpoint.

        Runs at the dispatch boundary (params are consistent there);
        the best snapshot lives in ``<snapshot_dir>/best`` as a normal
        orbax checkpoint — ``load_snapshot_params(dir + "/best")``
        serves it — plus a BEST.json sidecar with the winning
        step/score."""
        import json
        metrics = {k: (float(v) if not isinstance(v, (int, np.integer))
                       else int(v))
                   for k, v in self.validator(state.params).items()}
        self.logger.log_scalars(
            step, {f"val_{k}": v for k, v in metrics.items()})
        key = self.val_metric or next(iter(metrics))
        score = float(metrics[key])
        if self.best is None or score > self.best["score"]:
            self.best = {"step": int(step), "score": score, "metric": key}
            if self._best_mgr is None:
                self._best_mgr = ocp.CheckpointManager(
                    os.path.join(self.ckpt_dir, "best"),
                    options=ocp.CheckpointManagerOptions(
                        max_to_keep=1, create=True))
            self._best_mgr.save(
                int(step), args=ocp.args.StandardSave(_to_save(state)))
            self._best_mgr.wait_until_finished()
            # sidecar OUTSIDE best/ (orbax scans that dir for step
            # subdirectories)
            with open(os.path.join(self.ckpt_dir, "BEST.json"), "w") as f:
                json.dump({**self.best, "metrics": metrics}, f)

    def init_state(self) -> TrainState:
        g = self.cfg.grid
        return init_state(self.model, self.cfg,
                          (1, g.im_height, g.im_width, 3),
                          rng_seed=self.cfg.seed)

    def put(self, batch: Dict[str, np.ndarray], stacked: bool = None):
        """Host batch -> device arrays (sharded when on a mesh); images are
        demeaned on device by the step's preprocessing, so uint8 transfers
        stay small.

        ``stacked`` batches carry a leading (N, B, ...) steps axis
        (multi-step dispatch): the steps axis is replicated and the
        inner axes follow ``batch_sharding`` — matching the multi
        step's ``in_shardings`` so jit does not re-shard per dispatch.
        Default: inferred from ``steps_per_dispatch``."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        if stacked is None:
            stacked = self.steps_per_dispatch > 1
        out = {}
        for k, v in batch.items():
            if k == "seg" and not self.with_seg:
                continue
            if self._shardings is not None:
                sh = self._shardings[k]
                if stacked:
                    sh = NamedSharding(sh.mesh, P(None, *sh.spec))
                # device_put straight from the source array: a
                # jnp.asarray first would commit the batch to the
                # default device and pay a SECOND transfer for the
                # resharding
                out[k] = jax.device_put(v, sh)
            else:
                out[k] = jnp.asarray(v)
        return out

    def fit(self, batches: Iterator[Dict[str, np.ndarray]],
            max_iter: Optional[int] = None,
            state: Optional[TrainState] = None,
            resume: bool = True) -> TrainState:
        """Run the solver loop.  Preemption-tolerant: while fitting (in
        the main thread), SIGTERM/SIGINT request a cooperative stop —
        the current dispatch finishes, a snapshot is saved, and fit
        returns the state (SURVEY.md §5 checkpoint plan: "periodic +
        on-signal"; a later ``fit(resume=True)`` continues from it).
        Previous handlers are restored on exit."""
        import signal
        import threading

        cfg = self.cfg
        max_iter = max_iter or cfg.max_iter
        state = state or self.init_state()
        if resume:
            state = self.restore_latest(state)
        start = int(state.step)
        if self.logger._step0 is None:
            self.logger._step0 = start   # resume-aware ms/it accounting

        stop_sig = []
        prev_handlers = {}
        if (threading.current_thread() is threading.main_thread()
                and os.environ.get(
                    "TPUFCN_TRAIN_NO_SIGNAL_HANDLERS") != "1"):
            # signal.signal is main-thread-only; worker-thread fits
            # (bus nodes, tests) simply skip the handlers.  The env
            # opt-out keeps an outer harness's own SIGTERM handler
            # active through training (bench.py sets it so a timeout
            # flushes the result line instead of being consumed by a
            # cooperative training stop).
            for s in (signal.SIGTERM, signal.SIGINT):
                prev_handlers[s] = signal.signal(
                    s, lambda signum, frame: stop_sig.append(signum))
        try:
            return self._fit_loop(batches, max_iter, state, start,
                                   stop_sig)
        finally:
            for s, h in prev_handlers.items():
                signal.signal(s, h)

    def _fit_loop(self, batches, max_iter, state, start, stop_sig):
        cfg = self.cfg

        n_multi = self.steps_per_dispatch
        if n_multi > 1 and (max_iter - start) % n_multi:
            self.logger.sink(
                f"note: max_iter {max_iter} is not a multiple of "
                f"steps_per_dispatch {n_multi}; training stops at step "
                f"{start + -(-(max_iter - start) // n_multi) * n_multi}")
        pending = []
        last_snap = start
        last_eval = start
        # host-side step counter: the loop/log/snapshot checks must not
        # read state.step (a device scalar) — int() on it blocks until
        # the dispatched step finishes, serializing dispatches through
        # the ~40 ms-RTT tunnel.  The jitted step advances by exactly 1
        # (or n_multi) per dispatch, so the host count stays in lockstep.
        step = start
        it = iter(batches)
        while step < max_iter:
            # check BEFORE drawing: the old for-loop built one surplus
            # batch (a full imread+compositing round) after the final
            # step just to discard it
            try:
                batch = next(it)
            except StopIteration:
                break
            if cfg.iter_size > 1 and getattr(batch["image"], "ndim", 0) == 4:
                # Caffe iter_size: one solver iteration consumes
                # iter_size micro-batches (accumulated on device by the
                # step — see make_grads_fn).  Draw the rest of this
                # iteration's micro-batches and stack them to
                # (iter_size, B, ...); sources may also yield
                # pre-stacked (iter_size, B, ...) groups directly.
                micros = [batch]
                try:
                    for _ in range(cfg.iter_size - 1):
                        micros.append(next(it))
                except StopIteration:
                    self.logger.sink(
                        f"note: source exhausted mid-iteration — "
                        f"{len(micros)} micro-batch(es) short of "
                        f"iter_size {cfg.iter_size} were not trained")
                    break
                from tpufcn.train.step import stack_batches
                batch = stack_batches(micros)
            prestacked = (cfg.iter_size == 1
                          and getattr(batch["image"], "ndim", 0) == 5)
            if prestacked and batch["image"].shape[0] != n_multi:
                raise ValueError(
                    f"pre-stacked batch carries {batch['image'].shape[0]} "
                    f"steps but steps_per_dispatch={n_multi}; construct "
                    "the Trainer with steps_per_dispatch == the cache's "
                    "n_batches")
            if n_multi > 1:
                if prestacked:
                    # (N, B, ...) device-resident batch (DeviceBatchCache):
                    # dispatch directly, no re-upload
                    b, bs = batch, batch["image"].shape[1]
                else:
                    pending.append(batch)
                    if len(pending) < n_multi:
                        continue
                    from tpufcn.train.step import stack_batches
                    stacked = stack_batches(pending)
                    bs = pending[0]["image"].shape[0]
                    pending = []
                    b = self.put(stacked)
                state, metrics = self.step_fn(state, b)
                step += n_multi
                # metrics come back stacked (N,); log the last step
                last = {k: v[-1] for k, v in metrics.items()}
                self.logger.update(step, last, bs * n_multi)
            else:
                if prestacked:
                    # one-batch cache: unstack the leading length-1 axis
                    b = {k: v[0] for k, v in batch.items()}
                else:
                    # iter_size groups carry a leading replicated
                    # micro-batch axis — shard like stacked batches
                    b = self.put(batch, stacked=cfg.iter_size > 1)
                bs = b["image"].shape[0]
                if cfg.iter_size > 1:
                    bs *= b["image"].shape[1]   # images per iteration
                state, metrics = self.step_fn(state, b)
                step += 1
                self.logger.update(step, metrics, bs)
            # Snapshot whenever a cadence boundary was CROSSED since the
            # last snapshot — with steps_per_dispatch > 1 the step counter
            # advances by N at a time and may never land exactly on a
            # multiple of snapshot_every.
            if (cfg.snapshot_every and
                    step // cfg.snapshot_every
                    > last_snap // cfg.snapshot_every):
                self.save(state)
                last_snap = step
            # validation whenever an eval_every boundary was crossed
            # (same crossed-boundary semantics as snapshots: with
            # steps_per_dispatch > 1 the counter advances by N)
            if (self.validator is not None and cfg.eval_every and
                    step // cfg.eval_every > last_eval // cfg.eval_every):
                self._run_validation(state, step)
                last_eval = step
            if stop_sig:
                # cooperative preemption stop: snapshot the completed
                # step and return (the dispatch boundary is the only
                # safe save point — params mid-dispatch live on device)
                self.save(state)
                last_snap = step
                self.logger.sink(
                    f"signal {stop_sig[0]}: snapshot saved at step "
                    f"{step}, stopping")
                break
        if pending:
            self.logger.sink(
                f"note: {len(pending)} trailing batch(es) smaller than a "
                f"{n_multi}-step dispatch were not trained (source "
                "exhausted mid-dispatch)")
        if step > start and last_snap != step:
            self.save(state)
        # final validation (the solver also tests at exit): short runs
        # that never crossed an eval boundary still get a val record +
        # best snapshot
        if self.validator is not None and step > start and last_eval != step:
            self._run_validation(state, step)
        return state


def _to_save(state: TrainState):
    return {"step": int(state.step), "params": state.params,
            "opt_state": state.opt_state}
