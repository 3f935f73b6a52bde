"""Jitted data-parallel train step over the (data, space) mesh.

The reference training loop is NVCaffe's C++ solver calling a *host*
Python data layer every iteration (reference train/train.sh:26,
scripts/data_argumentation_layer/data_argumentation_layer.py:75-124 — the
known bottleneck).  Here the whole iteration is one XLA program:

  batch {image, gt rects, labels}  --(sharded over "data"/"space")-->
  on-device DetectNet grid-label encoding (tpufcn.ops.grid_codec)
  -> forward -> Caffe-semantics losses -> backward -> optax update,
with gradients all-reduced over ICI by GSPMD (no hand-written NCCL
analog: the mesh sharding annotations make XLA insert the collectives).

Spatial sharding: activations NHWC are sharded over ("data", "space") on
(N, H); XLA's spatial partitioning inserts conv halo exchanges
automatically — this is the honest CP/SP analog for an FCN (SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpufcn.core.config import TrainConfig
from tpufcn.core.mesh import DATA_AXIS, SPACE_AXIS
from tpufcn.ops.grid_codec import encode_grid_labels_batch
from tpufcn.train.losses import detectnet_loss


class TrainState(train_state.TrainState):
    """flax TrainState + dropout rng."""

    dropout_rng: jax.Array = struct.field(pytree_node=True, default=None)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Caffe solver semantics (reference train/*/solver.prototxt):

    * adam recipe: ADAM lr 1e-4, step lr *0.1 every 10k, wd 1e-7
      (train/bounding_box/solver.prototxt:3-16);
    * sgd recipe: momentum 0.9, fixed lr, wd 1e-7
      (train/fcn_bbox/solver.prototxt:1-13).
    Caffe weight decay is L2 added to gradients (all params).
    """
    # the step schedule honors lr_decay_step for EITHER optimizer (the
    # reference sgd solvers use lr_policy "fixed", i.e. lr_decay_step=0
    # in their recipes — but a configured decay must not be silently
    # ignored just because the solver is sgd)
    if cfg.lr_decay_step > 0:
        sched = optax.exponential_decay(
            cfg.learning_rate, cfg.lr_decay_step, cfg.lr_gamma,
            staircase=True)
    else:
        sched = optax.constant_schedule(cfg.learning_rate)
    if cfg.warmup_steps > 0:
        # linear 0 -> lr over the first warmup_steps, then the step
        # schedule (which counts its decay boundaries from the end of
        # the warmup)
        sched = optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.learning_rate,
                                   cfg.warmup_steps), sched],
            [cfg.warmup_steps])
    if cfg.optimizer == "adam":
        opt = optax.adam(sched)
    elif cfg.optimizer == "sgd":
        opt = optax.sgd(sched, momentum=cfg.momentum)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer}")
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        opt,
    )


def batch_sharding(mesh: Mesh) -> Dict[str, NamedSharding]:
    """Shardings for the raw batch dict: images batch+space sharded,
    box tensors batch sharded."""
    img = NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS, None, None))
    vec = NamedSharding(mesh, P(DATA_AXIS))
    return {"image": img, "rects": vec, "labels": vec, "valid": vec,
            "seg": NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS, None))}


def make_loss_fn(model, cfg: TrainConfig, with_seg: bool = False,
                 preprocessing: str = "demean",
                 label_offset: int = 0) -> Callable:
    """(params, batch, dropout_rng) -> (total_loss, metrics) — shared by
    the single-step and multi-step jitted steps (preprocessing dispatch,
    on-device grid-label encoding, DetectNet loss graph).

    ``label_offset=1`` for background-channel families (fcn8s_bbox):
    the pipeline's 0-based object ids shift to 1..C-1 before grid
    encoding so object j's coverage/bbox supervision lands on channel
    j+1 / block j+1 — the SAME channel the seg softmax supervises as
    class j+1 (they share the fuse_pool3 logits) and the same layout
    the reference's training encoder produces with its one-based
    manifest labels (argumentation_engine.py:82 ``k = label * 4``).
    Without the shift the Euclidean coverage loss pushes channel j
    while the seg loss pushes channel j+1 — conflicting supervision on
    channel 0 (background) at every object cell."""
    grid = cfg.grid

    def loss_fn(params, batch, dropout_rng):
        img = batch["image"]
        if preprocessing == "demean":
            from tpufcn.ops.image import demean_bgr
            img = demean_bgr(img)
        else:
            img = jnp.asarray(img, jnp.float32)
        out = model.apply(params, img, train=True,
                          rngs={"dropout": dropout_rng})
        glabels = encode_grid_labels_batch(
            batch["rects"], batch["labels"] + label_offset,
            batch["valid"], grid)
        if with_seg and "seg" not in batch:
            # fail at trace time: silently training a seg head on
            # nothing (e.g. record-shard batches, which carry no masks)
            # is the degradation class the loss-term guard exists for
            raise ValueError(
                "with_seg=True but the batch carries no 'seg' masks — "
                "use a mask-manifest pipeline, or train with "
                "with_seg=False (detection heads only)")
        seg_labels = batch.get("seg") if with_seg else None
        return detectnet_loss(
            out, glabels,
            bbox_weight=cfg.bbox_loss_weight,
            coverage_weight=cfg.coverage_loss_weight,
            seg_labels=seg_labels,
            seg_weight=cfg.seg_loss_weight)

    return loss_fn


def make_grads_fn(loss_fn: Callable, iter_size: int = 1) -> Callable:
    """(params, batch, rng) -> (grads, metrics).

    ``iter_size == 1``: one ``jax.grad`` over the (B, ...) batch.

    ``iter_size > 1``: Caffe solver gradient accumulation (the
    ``iter_size`` knob the reference solvers carry at 1,
    train/bounding_box/solver.prototxt:5).  Batch leaves carry a leading
    (iter_size, B, ...) micro-batch axis; a ``lax.scan`` accumulates the
    per-micro-batch gradients ON DEVICE (one grad-tree of live memory,
    not ``iter_size`` of them) and the update uses their MEAN — Caffe's
    ``Solver::Normalize`` divides accumulated diffs by iter_size — so
    effective batch = iter_size x batch_size with one optimizer update.
    Each micro-batch draws its own dropout rng; metrics come back
    averaged over the micro-batches (the solver's displayed iteration
    loss).
    """
    if iter_size <= 1:
        def grads_fn(params, batch, rng):
            return jax.grad(loss_fn, has_aux=True)(params, batch, rng)
        return grads_fn

    def grads_fn(params, batch, rng):
        rngs = jax.random.split(rng, iter_size)
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)

        def body(gsum, xs):
            micro, r = xs
            g, m = jax.grad(loss_fn, has_aux=True)(params, micro, r)
            return jax.tree_util.tree_map(jnp.add, gsum, g), m

        gsum, ms = jax.lax.scan(body, zeros, (batch, rngs))
        grads = jax.tree_util.tree_map(lambda x: x / iter_size, gsum)
        metrics = jax.tree_util.tree_map(lambda x: x.mean(0), ms)
        return grads, metrics

    return grads_fn


def make_train_step(model,
                    cfg: TrainConfig,
                    mesh: Optional[Mesh] = None,
                    with_seg: bool = False,
                    preprocessing: str = "demean",
                    label_offset: int = 0) -> Callable:
    """Build the jitted step: (state, batch) -> (state, metrics).

    batch dict:
      image: (B, H, W, 3) uint8/float raw BGR — sharded (data, space);
        preprocessing ("demean" for the VGG/FCN families, "shift127" for
        GoogLeNet — handled inside the model, "none" for pre-processed
        inputs) runs ON DEVICE as part of the step.
      rects: (B, M, 4) float GT boxes
      labels: (B, M) int32 class ids
      valid: (B, M) bool
      seg:   (B, H, W) int32 mask (only when with_seg)

    With ``cfg.iter_size > 1`` every leaf gains a leading
    (iter_size, ...) micro-batch axis and the step performs Caffe
    gradient accumulation (see ``make_grads_fn``).
    """
    loss_fn = make_loss_fn(model, cfg, with_seg=with_seg,
                           preprocessing=preprocessing,
                           label_offset=label_offset)
    grads_fn = make_grads_fn(loss_fn, cfg.iter_size)

    def step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jax.Array]]:
        rng, new_rng = jax.random.split(state.dropout_rng)
        grads, metrics = grads_fn(state.params, batch, rng)
        new_state = state.apply_gradients(grads=grads, dropout_rng=new_rng)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=0)

    repl = NamedSharding(mesh, P())
    bsh = batch_sharding(mesh)
    lead = (None,) if cfg.iter_size > 1 else ()
    in_batch = {k: NamedSharding(mesh, P(*lead, *bsh[k].spec)) for k in
                (["image", "rects", "labels", "valid"]
                 + (["seg"] if with_seg else []))}
    return jax.jit(
        step,
        in_shardings=(repl, in_batch),
        out_shardings=(repl, repl),
        donate_argnums=0,
    )


def make_multi_train_step(model,
                          cfg: TrainConfig,
                          mesh: Optional[Mesh] = None,
                          with_seg: bool = False,
                          preprocessing: str = "demean",
                          label_offset: int = 0) -> Callable:
    """N train steps per dispatch: (state, stacked_batch) -> (state, metrics).

    ``stacked_batch`` leaves have a leading steps axis (N, B, ...); a
    ``lax.scan`` consumes one slice per step on device.  Amortizes
    per-dispatch overhead (hundreds of param-leaf handles per call —
    pathological through remote-TPU tunnels, non-trivial everywhere).
    Metrics come back stacked (N,) per key.
    """
    if cfg.iter_size > 1:
        raise ValueError(
            "iter_size > 1 is not supported with multi-step dispatch "
            "(steps_per_dispatch > 1): pick gradient accumulation OR "
            "step batching per dispatch")
    loss_fn = make_loss_fn(model, cfg, with_seg=with_seg,
                           preprocessing=preprocessing,
                           label_offset=label_offset)

    def multi(state: TrainState, stacked_batch):
        def body(st, batch):
            rng, new_rng = jax.random.split(st.dropout_rng)
            grads, metrics = jax.grad(loss_fn, has_aux=True)(
                st.params, batch, rng)
            return st.apply_gradients(grads=grads, dropout_rng=new_rng), \
                metrics
        return jax.lax.scan(body, state, stacked_batch)

    if mesh is None:
        return jax.jit(multi, donate_argnums=0)
    repl = NamedSharding(mesh, P())
    bsh = batch_sharding(mesh)
    keys = ["image", "rects", "labels", "valid"] + (
        ["seg"] if with_seg else [])
    # stacked batches: steps axis replicated, inner axes as batch_sharding
    stacked = {k: NamedSharding(mesh, P(None, *bsh[k].spec)) for k in keys}
    return jax.jit(multi, in_shardings=(repl, stacked),
                   out_shardings=(repl, repl), donate_argnums=0)


def stack_batches(batches):
    """[{k: (B, ...)}] -> {k: (N, B, ...)} for multi-step dispatch.

    Device-resident batches (e.g. from DeviceCompositePipeline) stack
    ON device — np.stack would silently pull them to the host and pay a
    D2H + H2D round trip per dispatch."""
    import numpy as np
    keys = batches[0].keys()
    out = {}
    for k in keys:
        vals = [b[k] for b in batches]
        out[k] = (jnp.stack(vals) if isinstance(vals[0], jax.Array)
                  else np.stack(vals))
    return out


def init_state(model, cfg: TrainConfig, sample_image_shape,
               rng_seed: int = 0) -> TrainState:
    rng = jax.random.key(rng_seed)
    p_rng, d_rng = jax.random.split(rng)
    x0 = jnp.zeros(sample_image_shape, jnp.float32)
    params = model.init(p_rng, x0)
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=make_optimizer(cfg),
        dropout_rng=d_rng)
