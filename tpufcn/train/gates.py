"""Tracked accuracy gates: train each model family on the hard
synthetic benchmark (tpufcn/data/hardbench.py) and score it held-out.

This is the verification surface every fp8-placement / structural
decision leans on (BENCH.md: "gate such edits on the trained-model mAP
tracker, not output parity").  Round 2's gate config saturated at
mAP 1.0; these gates target a 0.6-0.9 regime so they can trend in both
directions, count >= 300 detections per family, and support multi-seed
runs for the high-variance families (fcn8s — BENCH.md negative
results).  bench.py publishes the results as BENCH json extras.

Detection semantics under test: the reference decode + NMS chain
(reference scripts/fcn_object_detector.py:337-394) as implemented by
the single-dispatch Detector pipeline.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from tpufcn.core.config import DataConfig, GridConfig, TrainConfig
from tpufcn.data.hardbench import (
    BOX_CAPACITY, build_eval_set, eval_cache_path, hard_data_config,
    hard_pipeline)

DEFAULT_ROOT = "/tmp/tpufcn_hardgate"

# Scene-cache format version: bump whenever hard_pipeline / the host
# compositor changes the bytes it composes for a given (geometry,
# classes, batch, n, seed) key — the key alone cannot see such a change
# and would silently reuse stale scenes, skewing the tracked gate mAP
# (round-4 advisor finding).  Version 1 keeps the legacy unversioned
# tag so existing multi-GB caches stay valid; later versions append
# ``_v{N}``.
SCENE_CACHE_VERSION = 1


def train_cache_path(root: str, grid: GridConfig, *, classes: int,
                     batch: int, n_cached: int, seed: int) -> str:
    """On-disk location of a memoized host-composited train-scene set."""
    tag = (f"hard_train_{grid.im_height}x{grid.im_width}_s{grid.stride}"
           f"_c{classes}_b{batch}_n{n_cached}_seed{seed}")
    if SCENE_CACHE_VERSION > 1:
        tag += f"_v{SCENE_CACHE_VERSION}"
    return os.path.join(root, tag + ".npz")


def _cached_host_batches(root: str, grid: GridConfig, *, classes: int,
                         batch: int, n_cached: int, seed: int,
                         log=None):
    """The gate's fixed epoch-training scene set, composed ONCE on the
    host parity path and memoized on disk.

    The gates train on a fixed ``n_cached``-batch cache either way
    (DeviceBatchCache reuses the same batches from HBM), so composing
    that cache with the host compositor and keying it on disk by
    (geometry, classes, batch, n, seed) changes nothing statistically —
    while removing BOTH costs the round-4 calibration measured: the
    1-core host-compositing wall (~6 min per family-seed at 448², which
    is why round 4 briefly moved gate training to the device
    compositor) and the train/eval domain gap that move introduced
    (device-composited scenes scored 0.04-0.12 mAP below host scenes on
    the host-parity eval set at matched steps: googlenet_3cls 0.208 vs
    0.249 @3k, 0.374 vs ~0.49 @6k).  Driver bench runs hit the warm
    cache and pay pure device time.  ``log``: progress callback
    (default: stderr — bench.py reserves stdout for the JSON line)."""
    import sys as _sys
    import time as _t
    if log is None:
        log = lambda m: print(m, file=_sys.stderr)   # noqa: E731
    path = train_cache_path(root, grid, classes=classes, batch=batch,
                            n_cached=n_cached, seed=seed)
    if not os.path.isfile(path):
        t0 = _t.time()
        pipe = hard_pipeline(root, grid, batch_size=batch, seed=seed,
                             classes=classes)
        batches = [pipe.batch(batch) for _ in range(n_cached)]
        arrs = {}
        for k in batches[0]:
            stacked = np.stack([b[k] for b in batches])
            if k == "seg":       # labels <= classes+1: store compactly
                stacked = stacked.astype(np.uint8)
            arrs[k] = stacked
        tmp = path + ".tmp.npz"
        np.savez(tmp, **arrs)
        os.replace(tmp, path)    # atomic vs a concurrent gate run
        log(f"gate host-batch cache: composed {os.path.basename(path)} "
            f"in {_t.time() - t0:.0f}s")
    z = np.load(path)
    n = z[list(z.files)[0]].shape[0]
    return [{k: (z[k][i].astype(np.int32) if k == "seg" else z[k][i])
             for k in z.files} for i in range(n)]


def _train_hard(model_name: str, grid: GridConfig, root: str, *,
                classes: int, steps: int, batch: int, n_cached: int,
                seed: int, with_seg: bool, model_kwargs: Optional[dict],
                lr: float = 3e-4, weights: Optional[str] = None,
                data_mode: str = "host_cached", warmup: int = 0,
                log=None):
    """Train ``model_name`` on the hard benchmark with DeviceBatchCache
    epoch training (n_cached batches composed+uploaded once, reused from
    HBM) and return the final TrainState.  ``seed`` varies BOTH the
    param init and the composited training scenes.

    ``weights``: optional pretrained seed for fine-tune init (the
    reference's ``caffe train --weights`` path, train/train.sh:26 —
    here usually the in-repo hardbench VGG16 pretrain,
    tpufcn/train/pretrain.py), resolved leniently by name.

    ``data_mode``: where the fixed training scene set comes from —
      * "host_cached" (gate default): host parity-path compositor,
        memoized on disk (_cached_host_batches) so only the first-ever
        run pays the 1-core compositing wall;
      * "device": compose ON DEVICE (hard_device_pipeline) — fastest
        cold, but the device compositor's documented deviations cost
        0.04-0.12 mAP of train/eval domain gap (PARITY.md);
      * "host": compose on host every run (the round-3 behavior).
    The held-out EVAL set stays on the host parity path in all modes."""
    import jax.numpy as jnp
    from tpufcn.convert import resolve_weights
    from tpufcn.data import DeviceBatchCache
    from tpufcn.data.hardbench import hard_device_pipeline
    from tpufcn.models import build
    from tpufcn.train.trainer import Trainer

    cfg = TrainConfig(
        grid=grid, model=model_name,
        data=DataConfig(batch_size=batch),
        optimizer="adam", learning_rate=lr,
        lr_decay_step=max(steps // 2, 1), lr_gamma=0.3,
        warmup_steps=warmup,
        max_iter=steps, snapshot_every=0,
        snapshot_dir=os.path.join(root, f"snap_{model_name}_{seed}"),
        log_every=10 ** 9, seed=seed)
    model = build(model_name, dtype=jnp.bfloat16, **(model_kwargs or {}))
    trainer = Trainer(cfg, model=model, with_seg=with_seg,
                      steps_per_dispatch=n_cached, log_sink=lambda s: None)
    if data_mode == "host_cached":
        src = iter(_cached_host_batches(root, grid, classes=classes,
                                        batch=batch, n_cached=n_cached,
                                        seed=1000 + seed, log=log))
    else:
        make_pipe = (hard_device_pipeline if data_mode == "device"
                     else hard_pipeline)
        src = iter(make_pipe(root, grid, batch_size=batch,
                             seed=1000 + seed, classes=classes))
    cache = DeviceBatchCache(trainer.put, src, n_batches=n_cached)
    state = None
    if weights:
        state = trainer.init_state()
        state = state.replace(params=resolve_weights(
            weights, lambda: state.params))
    return trainer.fit(iter(cache), max_iter=steps, state=state,
                       resume=False)


def _score_detector(model_name: str, params, grid: GridConfig,
                    images: np.ndarray, gts, classes: int,
                    model_kwargs: dict, chunk: int = 32):
    """mAP@0.5 of ``params`` under the full serving pipeline; also
    returns the detection count (gate power diagnostic)."""
    import jax.numpy as jnp
    from tpufcn.serve.detector import Detector
    from tpufcn.train.evaluate import evaluate_detections

    det = Detector(model_name, dtype=jnp.bfloat16, max_candidates=128,
                   model_kwargs=dict(model_kwargs))
    det.params = params
    dets_all = []
    n_det = 0
    for i in range(0, images.shape[0], chunk):
        for items in det(images[i:i + chunk]).to_lists():
            boxes = np.asarray([b for b, _, _ in items],
                               np.float64).reshape(-1, 4)
            labels = np.asarray([l for _, l, _ in items], np.int64)
            scores = np.asarray([c for _, _, c in items], np.float64)
            dets_all.append((boxes, labels, scores))
            n_det += len(items)
    ev = evaluate_detections(gts, dets_all, num_classes=classes,
                             iou_thresh=0.5)
    return float(ev["mAP"]), n_det


def detection_gate(model_name: str, *,
                   serving_kwargs: Optional[dict] = None,
                   classes: int = 4,
                   im: int = 448, stride: int = 16,
                   steps: int = 2500, batch: int = 16,
                   n_cached: int = 30,
                   seeds: Sequence[int] = (0,),
                   eval_images: int = 128,
                   root: str = DEFAULT_ROOT,
                   with_seg: bool = False,
                   lr: float = 3e-4,
                   warmup: int = 0,
                   weights: Optional[str] = None,
                   log=None) -> Dict[str, object]:
    """Train + score one detection family on the hard benchmark.

    Trains the EXACT model per seed and scores the same params under
    both the exact and (when ``serving_kwargs`` is given) the
    fp8-serving pipeline — fp8 storage is a serving-only mode (its
    backward crashes the TPU compiler, Trainer refuses it), so serving
    accuracy is always measured on exact-trained params, matching
    deployment.

    Returns {"exact": {"mAP", "per_seed"}, optional "fp8": {...},
    "n_gt", "n_det"} with mean/min/max over seeds.
    """
    from tpufcn.models import get_spec

    spec = get_spec(model_name)
    model_classes = classes + (1 if spec.background_channel is not None
                               else 0)
    grid = GridConfig(im, im, stride=stride, num_classes=model_classes)
    model_kwargs = {"num_classes": model_classes}
    images, gts, _ = build_eval_set(root, grid, classes=classes,
                                    n_images=eval_images)
    n_gt = int(sum(len(g[1]) for g in gts))

    per_seed: Dict[str, list] = {"exact": []}
    if serving_kwargs:
        per_seed["fp8"] = []
    n_det = 0
    train_s = eval_s = 0.0
    import time as _t
    for seed in seeds:
        t0 = _t.time()
        state = _train_hard(model_name, grid, root, classes=classes,
                            steps=steps, batch=batch, n_cached=n_cached,
                            seed=seed, with_seg=with_seg,
                            model_kwargs=model_kwargs, lr=lr,
                            warmup=warmup, weights=weights, log=log)
        train_s += _t.time() - t0
        t0 = _t.time()
        m, nd = _score_detector(model_name, state.params, grid, images,
                                gts, classes, model_kwargs)
        per_seed["exact"].append(round(m, 4))
        n_det = max(n_det, nd)
        if serving_kwargs:
            m8, _ = _score_detector(model_name, state.params, grid,
                                    images, gts, classes,
                                    {**model_kwargs, **serving_kwargs})
            per_seed["fp8"].append(round(m8, 4))
        eval_s += _t.time() - t0
    out: Dict[str, object] = {"n_gt": n_gt, "n_det": n_det,
                              "eval_images": int(images.shape[0]),
                              "seeds": list(seeds),
                              "train_s": round(train_s, 1),
                              "eval_s": round(eval_s, 1)}
    for tag, vals in per_seed.items():
        out[tag] = {"mAP": round(float(np.mean(vals)), 4),
                    "min": min(vals), "max": max(vals),
                    "per_seed": vals}
    return out


FIXTURE_CLASSES = ("ball", "crate", "cone")


def voc_fixture_gate(fixture_root: Optional[str] = None, *,
                     steps: int = 3000, batch: int = 16,
                     n_cached: int = 10, lr: float = 1e-4, seed: int = 0,
                     work_root: str = "/tmp/tpufcn_vocgate"
                     ) -> Dict[str, object]:
    """Tracked mAP on the committed photoreal-ish VOC fixture
    (tests/fixtures/voc_mini, rendered by examples/render_voc_fixture.py
    — an image source INDEPENDENT of the training compositor): VOC
    converter -> record shards -> vgg_detectnet_train training ->
    held-out val-split mAP under the full serving pipeline.  This is
    the reference's actual data flow (scripts/voc/create_train_val.py
    -> create_training_lmdb.py -> caffe train) driven on non-compositor
    imagery."""
    import jax.numpy as jnp
    from tpufcn.core.config import DataConfig, GridConfig, TrainConfig
    from tpufcn.data import DeviceBatchCache, create_detection_records
    from tpufcn.data.manifest import read_voc_manifest
    from tpufcn.data.pipeline import RecordTrainPipeline
    from tpufcn.data.voc import PascalVOC
    from tpufcn.models import build
    from tpufcn.train.trainer import Trainer
    from tpufcn.train.validate import (
        detection_validator, val_set_from_voc)

    if fixture_root is None:
        fixture_root = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), "tests", "fixtures",
            "voc_mini")
    import time as _t
    t0 = _t.time()
    man = os.path.join(work_root, "man")
    PascalVOC(fixture_root, classes=FIXTURE_CLASSES).create(man)
    rec = os.path.join(work_root, "rec", "ds")
    create_detection_records(
        read_voc_manifest(os.path.join(man, "train.txt")), rec)
    convert_s = _t.time() - t0

    grid = GridConfig(224, 224, stride=8, num_classes=11)
    cfg = TrainConfig(grid=grid, model="vgg_detectnet_train",
                      data=DataConfig(batch_size=batch),
                      optimizer="adam", learning_rate=lr,
                      lr_decay_step=max(steps // 2, 1), lr_gamma=0.3,
                      max_iter=steps, snapshot_every=0,
                      snapshot_dir=os.path.join(work_root, "snap"),
                      log_every=10 ** 9, seed=seed)
    model = build("vgg_detectnet_train", dtype=jnp.bfloat16)
    trainer = Trainer(cfg, model=model, steps_per_dispatch=n_cached,
                      log_sink=lambda s: None)
    t0 = _t.time()
    pipe = RecordTrainPipeline(rec, grid, batch_size=batch,
                               seed=1000 + seed)
    cache = DeviceBatchCache(trainer.put, iter(pipe), n_batches=n_cached)
    compose_s = _t.time() - t0
    t0 = _t.time()
    state = trainer.fit(iter(cache), max_iter=steps, resume=False)
    train_s = _t.time() - t0

    t0 = _t.time()
    # eval at 448² (train stays 224²): the net is fully convolutional,
    # so doubling the eval resolution doubles object scale relative to
    # the NMS h>=20 floor and roughly quadruples the per-image grid
    # evidence — measured, it lifted the gate's detection count well
    # past the ~30-detection power floor the 224² eval had
    # (VERDICT r03 #7) while keeping the train split untouched
    vi, vg = val_set_from_voc(os.path.join(man, "val.txt"), (448, 448))
    res = detection_validator("vgg_detectnet_train", vi, vg,
                              chunk=min(8, len(vi)))(state.params)
    res["val_images"] = int(vi.shape[0])
    res["n_gt"] = int(sum(len(g[1]) for g in vg))
    res.update(convert_s=round(convert_s, 1), compose_s=round(compose_s, 1),
               train_s=round(train_s, 1), eval_s=round(_t.time() - t0, 1))
    return res


def bench_gate_configs(tier: str = "bench") -> Dict[str, dict]:
    """The tracked per-family gate configurations (bench.py extras).

    Two tiers (VERDICT r04 #1c):

    * ``"bench"`` (default — what bench.py and the driver run): the
      capture tier, sized so PASS 0 (seed[0] of all six families) fits
      the observed ~19-min driver window alongside the headline
      phase.  Batch 32 (the gate's r03/r04 batch-16 training paid a
      measured ~1.8x per-image small-batch tax: fcn32s b16 1.6 ms/img
      vs the b32 tracker's 0.9), fewer steps, halved eval sets.
      Tracked values re-pinned on TPU (BENCH.md round-5 gate table);
      they sit lower on the training curve than the full tier by
      design — the gate's job is to TREND, two-sided, not to reach the
      best reachable mAP.
    * ``"full"``: the r03/r04 deep-calibration regime (batch 16, 6k
      steps) — `cli gates --tier full`; the round-5 full-tier
      calibration numbers are the BENCH.md reference points.

    Round-4 redesign (VERDICT r03 #1/#3/#4), driven by a measured
    isolation matrix (BENCH.md round-4 calibration):

    * training scenes come from the HOST parity compositor, memoized on
      disk (_cached_host_batches).  The r03 gate walls were dominated
      by per-step ~9.6 MB batch uploads through the 40 ms-RTT TPU
      tunnel, NOT by compositing (960 scenes = 23 s); the round-4
      device-compositor detour fixed the wall but cost a measured
      0.04-0.12 mAP train/eval domain gap.  host_cached keeps the r03
      accuracy regime bit-for-bit (googlenet_3cls 6k lr 2e-4: 0.495/370
      det vs r03's 0.492/370) at device-path speed.
    * step counts / lrs are the r03-pinned per-family optima — the
      calibration matrix measured both warmup-enabled higher-lr
      variants (googlenet_3cls 4k lr 4e-4 wu400: 0.185 — WORSE; the
      instability is not a warmup problem) and pretrain seeding
      (vgg_pyramid 2k/6k with the hardbench VGG16 pretrain: no better
      than scratch at 2k, far below the host-scene regime at 6k) and
      kept neither in the tracked configs.  ``cli pretrain`` remains a
      product feature; the gate table documents the negative result.
    * every detection family runs >= 2 seeds (VERDICT r03 #4), but
      seeds are scheduled in PASSES by run_bench_gates: pass 0 runs
      seed[0] of EVERY family (breadth — the artifact carries every
      tracked key even under a tight or tunnel-degraded budget), later
      passes append seeds and merge.  The voc flow gate runs in pass 0
      (r03 #1).

    fp8 serving kwargs mirror each family's ``*_serving`` registry
    preset (pinned by tests/test_voc_e2e.py).  ``est_s`` is the
    measured PER-SEED wall (train + exact & fp8 eval, warm caches,
    healthy tunnel — BENCH.md round-5 gate table); ``est_s0`` is the
    first-touch wall (scene-cache compose + eval-set compose + first
    compiles), applied by run_bench_gates only when ``_unit_cold``
    finds the unit's on-disk caches missing.  The axon tunnel degrades
    by up to ~5x for stretches (observed round 4); the per-unit skip
    check degrades a slow run by dropping later units, never by dying
    mid-gate."""
    import jax.numpy as jnp
    e5m2 = jnp.float8_e5m2
    gnet_fp8 = {"store_dtype": e5m2, "store_blocks": True,
                "store_stem2": True}
    if tier == "full":
        # est_s: round-5 quiet-host TPU walls (BENCH.md round-5
        # full-tier table); contended walls ran up to ~2x these
        return {
            "fcn32s": dict(
                kind="segmentation", steps=2500, n_cached=60,
                seeds=(0, 1), est_s=350, est_s0=420),
            "googlenet_3cls": dict(
                kind="detection", model="googlenet_detectnet_3cls",
                classes=3, im=448, stride=16, steps=6000, n_cached=60,
                seeds=(0, 1), lr=2e-4, eval_images=192, est_s=880,
                est_s0=1030, serving_kwargs=dict(gnet_fp8)),
            "voc_fixture": dict(kind="voc", est_s=100),
            "googlenet": dict(
                kind="detection", model="googlenet_detectnet",
                classes=4, im=448, stride=16, steps=6000, n_cached=60,
                seeds=(0, 1), est_s=830, est_s0=980,
                serving_kwargs=dict(gnet_fp8)),
            "fcn8s": dict(
                kind="detection", model="fcn8s_bbox",
                classes=4, im=288, stride=8, steps=6000, n_cached=90,
                seeds=(0, 1, 2), with_seg=True, est_s=860, est_s0=1000,
                serving_kwargs={"store_dtype": e5m2, "store_stages": 2}),
            "vgg_pyramid": dict(
                kind="detection", model="vgg_pyramid_detectnet",
                classes=4, im=448, stride=16, steps=6000, n_cached=60,
                seeds=(0, 1), lr=1e-4, est_s=1550, est_s0=1700,
                serving_kwargs={"store_dtype": e5m2}),
        }
    # Capture-tier shape (round-5 TPU pins, BENCH.md round-5 table):
    # segmentation keeps batch 32 (image-bound: b32x1250 matches the
    # full tier's mIoU on the same 40k images), but DETECTION reverted
    # to batch 16 — convergence there is adam-STEP-bound (b32/1200
    # collapsed BOTH googlenets to 0 detections while b16 at the same
    # per-family wall trains ~2x the steps).  Config order = run
    # priority, cheapest first, so a degraded budget still maximizes
    # gates_completed.
    return {
        "fcn32s": dict(
            kind="segmentation", steps=1250, batch=32, n_cached=30,
            seeds=(0, 1), est_s=110, est_s0=170),
        "voc_fixture": dict(kind="voc", est_s=100),
        "fcn8s": dict(
            kind="detection", model="fcn8s_bbox",
            classes=4, im=288, stride=8, steps=2500, n_cached=90,
            seeds=(0, 1, 2), with_seg=True, eval_images=64,
            est_s=220, est_s0=290,
            serving_kwargs={"store_dtype": e5m2, "store_stages": 2}),
        # the shared VGG16 backbone pretrain (round-5 experiment,
        # BENCH.md: fine-tune BEATS scratch for vgg_pyramid at the
        # capture horizon — scratch 0.0 mAP / 0 detections vs 0.0232 /
        # 64 seed-paired — while fcn8s is slightly better from scratch
        # (0.3047 vs 0.2856), so only vgg_pyramid consumes it).
        # Cached on disk: warm runs cost seconds, est_s0 covers the
        # cold ~350 s train.
        "vgg16_pretrain": dict(
            kind="pretrain", classes=6, steps=4000, size=128,
            n_bank=8192, lr=1e-4, seed=0, est_s=40, est_s0=380),
        "vgg_pyramid": dict(
            kind="detection", model="vgg_pyramid_detectnet",
            classes=4, im=448, stride=16, steps=2000, n_cached=60,
            seeds=(0, 1), lr=1e-4, eval_images=64, pretrain=True,
            est_s=300, est_s0=380,
            serving_kwargs={"store_dtype": e5m2}),
        "googlenet_3cls": dict(
            kind="detection", model="googlenet_detectnet_3cls",
            classes=3, im=448, stride=16, steps=2000, n_cached=60,
            seeds=(0, 1), lr=1e-4, eval_images=96, est_s=320,
            est_s0=400, serving_kwargs=dict(gnet_fp8)),
        "googlenet": dict(
            kind="detection", model="googlenet_detectnet",
            classes=4, im=448, stride=16, steps=2000, n_cached=60,
            seeds=(0, 1), eval_images=128, est_s=330, est_s0=410,
            serving_kwargs=dict(gnet_fp8)),
    }


# Later-pass seed order (VERDICT r03 #4 / r04 #9): leftover budget goes
# to extra seeds of the families with the largest KNOWN seed spread
# first — fcn8s's measured spread is an order of magnitude
# (0.072-0.258, BENCH.md round-3 gate table), googlenet_3cls sits near
# a training instability, vgg_pyramid is the from-scratch-unstable VGG.
SEED_APPEND_PRIORITY = ("fcn8s", "googlenet_3cls", "vgg_pyramid",
                        "googlenet", "fcn32s")


def _seed_rank(name: str) -> int:
    try:
        return SEED_APPEND_PRIORITY.index(name)
    except ValueError:
        return len(SEED_APPEND_PRIORITY)


def plan_gate_units(cfgs: Dict[str, dict]):
    """Breadth-first per-seed schedule: ``[(family, seed_index), ...]``.

    Pass 0 runs seed[0] of EVERY family in config order, so even a
    tight or tunnel-degraded budget produces an artifact carrying every
    tracked key.  Later passes append one more seed per multi-seed
    family, highest-known-spread families first (SEED_APPEND_PRIORITY).
    """
    units = [(name, 0) for name in cfgs]
    n_extra = max((len(c.get("seeds", (0,))) for c in cfgs.values()),
                  default=1) - 1
    for p in range(1, n_extra + 1):
        for name in sorted(cfgs, key=_seed_rank):
            if len(cfgs[name].get("seeds", (0,))) > p:
                units.append((name, p))
    return units


def _gate_defaults(fn) -> Dict[str, object]:
    import inspect
    return {k: v.default for k, v in inspect.signature(fn).parameters.items()
            if v.default is not inspect.Parameter.empty}


def _unit_cold(kind: str, cfg: dict, root: str, seed: int) -> bool:
    """Whether this gate unit pays first-touch costs (its train-scene
    npz or the family's eval-set npz is not on disk), i.e. whether the
    scheduler should budget ``est_s0`` instead of the warm ``est_s``."""
    if kind == "pretrain":
        from tpufcn.train.pretrain import pretrain_cache_path
        return not os.path.isfile(pretrain_cache_path(root, **cfg))
    if kind == "segmentation":
        g = {**_gate_defaults(segmentation_gate), **cfg}
        model_classes = g["classes"] + 1
    elif kind == "detection":
        from tpufcn.models import get_spec
        g = {**_gate_defaults(detection_gate), **cfg}
        spec = get_spec(cfg["model"])
        model_classes = g["classes"] + (
            1 if spec.background_channel is not None else 0)
    else:
        return False     # voc first-touch costs live in est_s
    grid = GridConfig(g["im"], g["im"], stride=g["stride"],
                      num_classes=model_classes)
    train = train_cache_path(root, grid, classes=g["classes"],
                             batch=g["batch"], n_cached=g["n_cached"],
                             seed=1000 + seed)
    ev = eval_cache_path(root, grid, g["classes"], g["eval_images"])
    return not (os.path.isfile(train) and os.path.isfile(ev))


def _merge_family(old: Optional[dict], new: dict) -> dict:
    """Fold one seed unit's result into the family's accumulated result
    (recomputing mean/min/max over the concatenated per-seed lists)."""
    if (not isinstance(old, dict) or "error" in old or "skipped" in old
            or not any(isinstance(old.get(t), dict) and "per_seed" in old[t]
                       for t in ("exact", "fp8"))):
        return new
    if "error" in new:
        out = dict(old)
        out["error_later_seed"] = new["error"]
        return out
    out = dict(new)
    out["seeds"] = list(old.get("seeds", [])) + list(new.get("seeds", []))
    for tag in ("exact", "fp8"):
        if isinstance(old.get(tag), dict) and isinstance(new.get(tag), dict):
            vals = list(old[tag]["per_seed"]) + list(new[tag]["per_seed"])
            key = "mIoU" if "mIoU" in new[tag] else "mAP"
            out[tag] = {key: round(float(np.mean(vals)), 4),
                        "min": min(vals), "max": max(vals),
                        "per_seed": vals}
    if "n_det" in old or "n_det" in new:
        out["n_det"] = max(old.get("n_det", 0), new.get("n_det", 0))
    for k in ("train_s", "eval_s", "wall_s"):
        if k in old or k in new:
            out[k] = round(old.get(k, 0.0) + new.get(k, 0.0), 1)
    return out


def warm_gate_caches(root: str = DEFAULT_ROOT,
                     only: Optional[Sequence[str]] = None,
                     log=print, tier: str = "bench") -> Dict[str, str]:
    """Compose every tracked gate's on-disk inputs WITHOUT training
    (VERDICT r04 #8): the per-seed train-scene npz caches and the
    per-family held-out eval npz.  Run at the end of a builder session
    (``cli gates --warm-caches``) so the driver's end-of-round bench
    pays pure device time — the r04 driver run lost 79 s of its gate
    budget composing cold caches.  Returns {cache path: "composed" |
    "warm"}."""
    from tpufcn.models import get_spec
    out: Dict[str, str] = {}

    def _touch(path, compose):
        if os.path.isfile(path):
            out[path] = "warm"
        else:
            compose()
            out[path] = "composed"
        log(f"{out[path]}: {os.path.basename(path)}")

    for name, cfg in bench_gate_configs(tier).items():
        if only is not None and name not in only:
            continue
        kind = cfg["kind"]
        if kind == "segmentation":
            g = {**_gate_defaults(segmentation_gate), **cfg}
            model_classes = g["classes"] + 1
        elif kind == "detection":
            g = {**_gate_defaults(detection_gate), **cfg}
            spec = get_spec(cfg["model"])
            model_classes = g["classes"] + (
                1 if spec.background_channel is not None else 0)
        elif kind == "pretrain":
            # NOTE: a cold pretrain trains on the active jax backend
            # (~350 s on TPU) — the one warm-caches step that is not
            # host-only compositing
            from tpufcn.train.pretrain import (
                cached_vgg16_pretrain, pretrain_cache_path)
            c = {k: v for k, v in cfg.items()
                 if k not in ("kind", "est_s", "est_s0")}
            _touch(pretrain_cache_path(root, **c),
                   lambda: cached_vgg16_pretrain(root, log=log, **c))
            continue
        else:
            continue          # voc composes its own small inputs in-run
        grid = GridConfig(g["im"], g["im"], stride=g["stride"],
                          num_classes=model_classes)
        _touch(eval_cache_path(root, grid, g["classes"], g["eval_images"]),
               lambda: build_eval_set(root, grid, classes=g["classes"],
                                      n_images=g["eval_images"]))
        for seed in g.get("seeds", (0,)):
            path = train_cache_path(root, grid, classes=g["classes"],
                                    batch=g["batch"],
                                    n_cached=g["n_cached"],
                                    seed=1000 + seed)
            _touch(path, lambda s=seed: _cached_host_batches(
                root, grid, classes=g["classes"], batch=g["batch"],
                n_cached=g["n_cached"], seed=1000 + s, log=log))
    return out


def run_bench_gates(root: str = DEFAULT_ROOT,
                    only: Optional[Sequence[str]] = None,
                    log=print,
                    deadline: Optional[float] = None,
                    sink=None,
                    passes: Optional[Sequence[int]] = None,
                    prior: Optional[Dict[str, dict]] = None,
                    tier: str = "bench") -> Dict[str, dict]:
    """Run the tracked family gates as budgeted per-seed UNITS;
    -> {family: gate result dict}.

    Scheduling (VERDICT r04 #1): units come from ``plan_gate_units`` —
    pass 0 is seed[0] of every family (breadth first: the artifact
    carries every tracked key even when the budget is tight or the
    tunnel is degraded), later passes append seeds in
    SEED_APPEND_PRIORITY order.  Before each unit the scheduler checks
    the calibrated per-seed wall ``est_s`` — or ``est_s0``, the
    first-touch wall covering scene-cache compose + first compiles,
    whenever the unit's on-disk caches are cold (``_unit_cold``) —
    against the remaining budget; a unit that does not fit is skipped
    ({"skipped": "budget"} when the family has no results yet,
    ``seeds_skipped`` noted when it does) and never risks the whole
    bench process being killed mid-gate by an external timeout.
    Estimates self-correct DURING the run: each completed unit's
    wall/est ratio feeds a median factor applied to later estimates,
    so a tunnel-degraded run (walls up to ~5x est, observed r04/r05)
    skips forward-looking rather than dying, and a healthy run admits
    more seed units than the conservative est_s alone would.

    Fail-soft per unit: a unit's failure is reported as {"error": ...}
    (the family's later units are dropped — gate failures are
    deterministic) instead of aborting the whole bench run; the
    headline JSON line must still print.  ``sink(partial_results)`` is
    called after every unit so partial results survive a kill.

    Entry kinds beyond detection/segmentation:
      * ``pretrain`` — the shared VGG16 backbone pretrain
        (tpufcn/train/pretrain.py); later entries with
        ``pretrain=True`` fine-tune from its exported caffemodel.
        If it was budget-skipped (or failed), consumers train from
        scratch and report ``"pretrained": false``.
      * ``voc`` — the committed-fixture converter->records->train->eval
        flow gate (voc_fixture_gate), budgeted like every family
        (VERDICT round-3 #1: it must run INSIDE the budgeted loop).

    ``passes``: when given, only units whose pass index (= seed index)
    is in it run — bench.py runs pass 0 first (every tracked key),
    then its throughput extras, then the later seed passes with
    whatever budget remains.  ``prior``: results from an earlier
    partial invocation to merge into (families it marks skipped/error
    stay dead).
    """
    import time as _t
    import traceback
    cfgs = bench_gate_configs(tier)
    if only is not None:
        cfgs = {k: v for k, v in cfgs.items() if k in only}
    out: Dict[str, dict] = dict(prior) if prior else {}
    # families with no more runnable units (reconstructed from prior:
    # budget-skipped and errored families stay dead across invocations)
    done: set = {n for n, r in out.items()
                 if isinstance(r, dict) and ({"skipped", "error",
                                              "seeds_skipped"} & r.keys())}
    # a pretrain unit completed in an earlier partial invocation
    # (bench.py pass split) re-resolves from its prior result, so
    # later-pass fine-tune seeds still find the backbone
    pretrain_path: Optional[str] = None
    for n, r in out.items():
        if (cfgs.get(n, {}).get("kind") == "pretrain"
                and isinstance(r, dict) and r.get("path")):
            pretrain_path = r["path"]
    # Adaptive wall scaling: the axon tunnel degrades up to ~5x for
    # stretches and a healthy run beats the calibrated est_s — scale
    # later unit estimates by the median observed wall/est ratio so a
    # degraded run skips early (instead of being killed mid-gate) and
    # a fast run admits more units.  Bounded below so one lucky unit
    # cannot talk the scheduler into overcommitting.
    ratios: list = []

    def _factor():
        if not ratios:
            return 1.0
        return max(0.6, float(np.median(ratios)))

    for name, si in plan_gate_units(cfgs):
        if name in done or (passes is not None and si not in passes):
            continue
        cfg = dict(cfgs[name])
        kind = cfg.pop("kind")
        est_s = cfg.pop("est_s", 0)
        est_s0 = cfg.pop("est_s0", est_s)
        seeds = tuple(cfg.pop("seeds", (0,)))
        base_est = (est_s0 if _unit_cold(kind, cfg, root, seeds[si])
                    else est_s)
        unit_est = base_est * _factor()
        if deadline is not None and _t.time() + unit_est > deadline:
            left = max(deadline - _t.time(), 0)
            if name in out:
                out[name]["seeds_skipped"] = (
                    out[name].get("seeds_skipped", 0) + len(seeds) - si)
                log(f"gate[{name}]: seeds {list(seeds[si:])} skipped — "
                    f"est {unit_est:.0f}s/unit exceeds the remaining "
                    f"budget ({left:.0f}s)")
            else:
                out[name] = {"skipped": "budget",
                             "est_s": round(unit_est, 1)}
                log(f"gate[{name}]: skipped — est {unit_est:.0f}s "
                    f"exceeds the remaining budget ({left:.0f}s)")
            done.add(name)
            continue
        t0 = _t.time()
        try:
            if kind == "pretrain":
                from tpufcn.train.pretrain import cached_vgg16_pretrain
                pretrain_path = cached_vgg16_pretrain(root, log=log, **cfg)
                res = {"path": pretrain_path}
            elif kind == "voc":
                res = voc_fixture_gate(**cfg)
            elif kind == "segmentation":
                res = segmentation_gate(root=root, seeds=(seeds[si],),
                                        log=log, **cfg)
            else:
                model = cfg.pop("model")
                fine_tune = cfg.pop("pretrain", False)
                if fine_tune:
                    cfg["weights"] = pretrain_path
                res = detection_gate(model, root=root, seeds=(seeds[si],),
                                     log=log, **cfg)
                if fine_tune:
                    res["pretrained"] = pretrain_path is not None
        except Exception as e:   # noqa: BLE001 — report, don't abort
            log(traceback.format_exc())
            res = {"error": f"{type(e).__name__}: {e}"}
            done.add(name)
        res["wall_s"] = round(_t.time() - t0, 1)
        if base_est > 0:
            ratios.append((_t.time() - t0) / base_est)
        if kind in ("pretrain", "voc"):
            done.add(name)       # single-unit kinds
        out[name] = _merge_family(out.get(name), res)
        log(f"gate[{name}] unit seed[{si}]: {res}")
        if sink is not None:
            try:
                sink(dict(out))
            except Exception as e:   # noqa: BLE001 — sink is best-effort
                log(f"gate sink failed: {e}")
    return out


def segmentation_gate(model_name: str = "fcn32s_seg", *,
                      serving_name: str = "fcn32s_seg_serving",
                      classes: int = 4,
                      im: int = 224, stride: int = 16,
                      steps: int = 2500, batch: int = 16,
                      n_cached: int = 30,
                      seeds: Sequence[int] = (0,),
                      eval_images: int = 64,
                      root: str = DEFAULT_ROOT,
                      warmup: int = 0,
                      weights: Optional[str] = None,
                      log=None) -> Dict[str, object]:
    """FCN-32s seg family gate: held-out mean-IoU on the hard benchmark
    (masks carry label+1 per compositor convention; class 0 background)."""
    import jax
    import jax.numpy as jnp
    from tpufcn.models import build
    from tpufcn.ops.image import demean_bgr
    from tpufcn.train.evaluate import evaluate_segmentation

    C = classes + 1
    grid = GridConfig(im, im, stride=stride, num_classes=C)
    images, _, segs = build_eval_set(root, grid, classes=classes,
                                     n_images=eval_images)

    per_seed: Dict[str, list] = {"exact": [], "fp8": []}
    train_s = eval_s = 0.0
    import time as _t
    for seed in seeds:
        t0 = _t.time()
        state = _train_hard(model_name, grid, root, classes=classes,
                            steps=steps, batch=batch, n_cached=n_cached,
                            seed=seed, with_seg=True,
                            model_kwargs={"num_classes": C},
                            warmup=warmup, weights=weights, log=log)
        train_s += _t.time() - t0
        t0 = _t.time()
        for tag, name in (("exact", model_name), ("fp8", serving_name)):
            m = build(name, dtype=jnp.bfloat16, num_classes=C)

            @jax.jit
            def seg_fwd(p, x, m=m):
                logits = m.apply(
                    p, demean_bgr(jnp.asarray(x, jnp.float32)))["seg"]
                return jnp.argmax(logits, axis=-1)

            preds = []
            for i in range(0, images.shape[0], 32):
                preds.append(np.asarray(seg_fwd(state.params,
                                                images[i:i + 32])))
            res = evaluate_segmentation(list(segs), list(np.concatenate(preds)),
                                        num_classes=C)
            per_seed[tag].append(round(float(res["mean_iou"]), 4))
        eval_s += _t.time() - t0
    out: Dict[str, object] = {"eval_images": int(images.shape[0]),
                              "seeds": list(seeds),
                              "train_s": round(train_s, 1),
                              "eval_s": round(eval_s, 1)}
    for tag, vals in per_seed.items():
        out[tag] = {"mIoU": round(float(np.mean(vals)), 4),
                    "min": min(vals), "max": max(vals),
                    "per_seed": vals}
    return out
