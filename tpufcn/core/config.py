"""Typed configuration tree for the whole framework.

Replaces the reference's three scattered config layers — rosparams
(reference scripts/fcn_object_detector.py:33-38), prototxt ``param_str``
mini-configs (reference train/bounding_box/train_val.prototxt:14), and
shell env vars (reference train/train.sh:19-22) — with one dataclass tree.
Hardcoded constants in the reference (ImageNet BGR means x5 copies, decode
stride 16/2, NMS eps) become explicit fields with the reference values as
defaults.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


# ImageNet BGR channel means used (five separate copies) throughout the
# reference, e.g. scripts/fcn_object_detector.py:407-413.
IMAGENET_BGR_MEAN: Tuple[float, float, float] = (
    104.0069879317889,
    116.66876761696767,
    122.6789143406786,
)


@dataclasses.dataclass(frozen=True)
class GridConfig:
    """Geometry of the DetectNet label/decode grid.

    The reference encodes this in prototxt param_str as
    ``w,h,stride,num_classes,batch`` (reference
    train/bounding_box/train_val.prototxt:14) and hardcodes the runtime
    decode stride as ``16/2`` (reference scripts/fcn_object_detector.py:360).
    """

    im_width: int = 448
    im_height: int = 448
    stride: int = 8
    num_classes: int = 1  # foreground classes (background handled separately)

    @property
    def grid_w(self) -> int:
        return self.im_width // self.stride

    @property
    def grid_h(self) -> int:
        return self.im_height // self.stride

    @property
    def cell_w(self) -> int:
        return self.im_width // self.grid_w

    @property
    def cell_h(self) -> int:
        return self.im_height // self.grid_h


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """Inference-time detector parameters.

    Defaults mirror the reference rosparams (reference
    scripts/fcn_object_detector.py:33-35 and
    launch/fcn_object_detector.launch:4-6).
    """

    grid: GridConfig = dataclasses.field(default_factory=GridConfig)
    detection_threshold: float = 0.5  # coverage mask threshold
    min_boxes: int = 3                # groupRectangles groupThreshold
    nms_eps: float = 0.2              # groupRectangles eps
    min_box_height: int = 20          # reject grouped rect if y2-y1 < this
    model: str = "googlenet_detectnet"
    # Maximum decoded candidate cells per class fed to box grouping.  The
    # reference considers every above-threshold cell; we keep full capacity
    # (grid_h*grid_w) by default so behaviour matches, but this can be
    # lowered for speed.
    max_candidates: Optional[int] = None

    @property
    def candidate_capacity(self) -> int:
        if self.max_candidates is not None:
            return self.max_candidates
        return self.grid.grid_h * self.grid.grid_w


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout: ``data`` (batch DP) x ``space`` (spatial sharding).

    The reference is single-device (reference scripts/fcn_object_detector.py:68).
    The TPU build scales via a 2-axis mesh: the batch axis is data-parallel
    with all-reduce over ICI; the ``space`` axis shards activation H for
    large-frame inference/training with halo exchange.  Axis size 1
    degenerates cleanly to single-chip.
    """

    data: int = 1
    space: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.space


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Input pipeline configuration.

    Replaces the reference Python-layer param_str configs
    (reference scripts/data_argumentation_layer/data_argumentation_layer.py:25-32)
    and LMDB writer rosparams (reference scripts/misc/create_training_lmdb.py:78-88).
    """

    manifest: Optional[str] = None       # train.txt path
    batch_size: int = 32
    shuffle_seed: int = 0
    num_compose: Tuple[int, int] = (1, 3)   # min/max pasted objects per scene
    compose_iou_thresh: float = 0.05        # paste overlap rejection threshold
    compose_max_trials: int = 100           # bounded rejection sampling
    scale_range: Tuple[float, float] = (1.0, 2.2)  # paste rescale range
    prefetch: int = 2
    add_background_class: bool = True
    # the reference's +/-5 deg rotation augmentation exists but is gated
    # off upstream (argumentation_engine.py:179); same default here
    rotate: bool = False


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Solver configuration.

    Defaults follow the reference ADAM recipe (reference
    train/bounding_box/solver.prototxt:3-16); the fcn_bbox/seg SGD recipe
    (reference train/fcn_bbox/solver.prototxt:1-13) is selectable via
    ``optimizer``.
    """

    grid: GridConfig = dataclasses.field(default_factory=lambda: GridConfig(
        im_width=224, im_height=224, stride=8, num_classes=11))
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    model: str = "vgg_detectnet_train"
    optimizer: str = "adam"            # "adam" | "sgd"
    # Caffe solver gradient accumulation (reference
    # train/bounding_box/solver.prototxt:5 carries ``iter_size: 1``):
    # one optimizer update per ``iter_size`` micro-batches, update =
    # mean of the per-micro-batch gradients — effective batch =
    # iter_size x data.batch_size without growing the device working set.
    iter_size: int = 1
    learning_rate: float = 1e-4
    lr_decay_step: int = 10000         # step lr schedule: gamma every N iters
    lr_gamma: float = 0.1
    # Linear lr warmup over the first N steps (0 = off, the Caffe-parity
    # default — no reference solver warms up because every reference
    # recipe fine-tunes from pretrained weights, train/train.sh:26).
    # From-scratch VGG training sits near an instability (lr 3e-4
    # diverges, BENCH.md round-3 gate table); warmup is the standard
    # from-scratch stabilizer and is what the accuracy gates use.
    warmup_steps: int = 0
    momentum: float = 0.9
    weight_decay: float = 1e-7
    max_iter: int = 100000
    snapshot_every: int = 5000
    snapshot_dir: str = "snapshots"
    # In-training validation cadence (the Caffe TEST-phase knobs,
    # reference train/bounding_box/solver.prototxt:6-7 test_iter/
    # test_interval): every N steps Trainer.fit runs its `validator`
    # callable on held-out data, logs the metrics, and retains the
    # best-scoring checkpoint in <snapshot_dir>/best.  0 = off.
    eval_every: int = 0
    bbox_loss_weight: float = 2.0      # reference models/train_val.prototxt:2264
    coverage_loss_weight: float = 1.0
    seg_loss_weight: float = 1.0
    log_every: int = 20                # reference solver display: 20
    seed: int = 0
