"""Model zoo registry: the four reference graph families (SURVEY.md C16-C19)
plus their head-width variants, each with its canonical grid geometry and
input preprocessing convention.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict

import flax.linen as nn
import jax.numpy as jnp

from tpufcn.core.config import GridConfig
from tpufcn.models.googlenet import GoogLeNetDetectNet
from tpufcn.models.vgg import VGGDetectNet, VGGPyramidDetectNet
from tpufcn.models.fcn import FCN8sBBox, FCN32sSeg


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """A zoo entry: module factory, grid geometry, IO conventions."""

    factory: Callable[..., nn.Module]
    grid: GridConfig
    preprocessing: str          # "shift127" (raw-127) | "demean" (demean+minmax)
    background_channel: Any     # int channel to skip in coverage, or None
    heads: tuple                # subset of ("coverage", "bboxes", "seg")
    reference: str              # prototxt this mirrors (for parity checks)


_REGISTRY: Dict[str, ModelSpec] = {}


def register(name: str, spec: ModelSpec) -> None:
    _REGISTRY[name] = spec


def get_spec(name: str) -> ModelSpec:
    if name not in _REGISTRY:
        raise KeyError(f"unknown model '{name}'; have {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def build(name: str, dtype=jnp.bfloat16, **overrides) -> nn.Module:
    return get_spec(name).factory(dtype=dtype, **overrides)


def names():
    return sorted(_REGISTRY)


# --- GoogLeNet DetectNet family (reference models/*.prototxt) -------------
register("googlenet_detectnet", ModelSpec(
    factory=lambda dtype=jnp.bfloat16, **kw: GoogLeNetDetectNet(
        num_classes=kw.pop("num_classes", 4), dtype=dtype, **kw),
    grid=GridConfig(448, 448, stride=16, num_classes=4),
    preprocessing="shift127",
    background_channel=None,
    heads=("coverage", "bboxes"),
    reference="models/deploy.prototxt",
))
register("googlenet_detectnet_1cls", ModelSpec(
    factory=lambda dtype=jnp.bfloat16, **kw: GoogLeNetDetectNet(
        num_classes=kw.pop("num_classes", 1), dtype=dtype, **kw),
    grid=GridConfig(448, 448, stride=16, num_classes=1),
    preprocessing="shift127",
    background_channel=None,
    heads=("coverage", "bboxes"),
    reference="models/train_val.prototxt",
))
register("googlenet_detectnet_serving", ModelSpec(
    # The flagship's serving configuration: f8e5m2 activation STORAGE
    # for the stem tensors (conv1/LRN1/conv2_reduce/conv2/LRN2 outputs
    # plus the pool1/pool2 buffers, which stay fp8 exactly), the
    # fused-1x1 branch tensors, and the inception concats; all compute
    # bf16.
    # Same param tree as googlenet_detectnet (checkpoints interchange);
    # accuracy tracked in bench extras (mAP 0.995 vs exact 0.992).
    factory=lambda dtype=jnp.bfloat16, **kw: GoogLeNetDetectNet(
        num_classes=kw.pop("num_classes", 4), dtype=dtype,
        store_dtype=kw.pop("store_dtype", jnp.float8_e5m2),
        store_blocks=kw.pop("store_blocks", True),
        store_stem2=kw.pop("store_stem2", True), **kw),
    grid=GridConfig(448, 448, stride=16, num_classes=4),
    preprocessing="shift127",
    background_channel=None,
    heads=("coverage", "bboxes"),
    reference="models/deploy.prototxt",
))
register("googlenet_detectnet_3cls", ModelSpec(
    factory=lambda dtype=jnp.bfloat16, **kw: GoogLeNetDetectNet(
        num_classes=kw.pop("num_classes", 3), dtype=dtype, **kw),
    grid=GridConfig(448, 448, stride=16, num_classes=3),
    preprocessing="shift127",
    background_channel=None,
    heads=("coverage", "bboxes"),
    reference="models/train_val2.prototxt",
))

# --- VGG DetectNet family (reference train/bounding_box/) -----------------
register("vgg_detectnet_train", ModelSpec(
    factory=lambda dtype=jnp.bfloat16, **kw: VGGDetectNet(
        num_classes=kw.pop("num_classes", 11), dtype=dtype, **kw),
    grid=GridConfig(224, 224, stride=8, num_classes=11),
    preprocessing="demean",
    background_channel=None,
    heads=("coverage", "bboxes"),
    reference="train/bounding_box/train_val.prototxt",
))
register("vgg_pyramid_detectnet", ModelSpec(
    factory=lambda dtype=jnp.bfloat16, **kw: VGGPyramidDetectNet(
        num_classes=kw.pop("num_classes", 20), dtype=dtype, **kw),
    grid=GridConfig(448, 448, stride=16, num_classes=20),
    preprocessing="demean",
    background_channel=None,
    heads=("coverage", "bboxes"),
    reference="train/bounding_box/deploy.prototxt",
))
register("vgg_pyramid_detectnet_serving", ModelSpec(
    # e5m2 activation storage on the VGG conv stack + pyramid concat
    # (measured 904 -> 1,026 img/s full pipeline at 448, batch 64);
    # same param tree as vgg_pyramid_detectnet.
    factory=lambda dtype=jnp.bfloat16, **kw: VGGPyramidDetectNet(
        num_classes=kw.pop("num_classes", 20), dtype=dtype,
        store_dtype=kw.pop("store_dtype", jnp.float8_e5m2), **kw),
    grid=GridConfig(448, 448, stride=16, num_classes=20),
    preprocessing="demean",
    background_channel=None,
    heads=("coverage", "bboxes"),
    reference="train/bounding_box/deploy.prototxt",
))

# --- FCN families ---------------------------------------------------------
register("fcn8s_bbox", ModelSpec(
    factory=lambda dtype=jnp.bfloat16, **kw: FCN8sBBox(
        num_classes=kw.pop("num_classes", 11), dtype=dtype, **kw),
    # coverage grid at stride 8; classes include background (channel 0)
    grid=GridConfig(288, 288, stride=8, num_classes=11),
    preprocessing="demean",
    background_channel=0,
    heads=("coverage", "bboxes", "seg"),
    reference="train/fcn_bbox/train_val.prototxt",
))
register("fcn8s_bbox_serving", ModelSpec(
    # e5m2 activation storage on backbone stages 1-2 ONLY (the
    # bandwidth-heavy large-spatial stages — they carry ~the whole
    # throughput win, +10.2%): FULL-backbone quantization measured
    # below exact on trained mAP in every gate run.  Measured accuracy
    # cost of stages-1-2 on the powered round-3 hard-bench gate
    # (449 detections, 3 seeds, paired): a small but CONSISTENT
    # ~0.02 mAP (-0.020/-0.027/-0.014 per seed) below exact — ~8%
    # relative on this family; see BENCH.md.  Gate on your own data
    # before serving this preset.  Same param tree as fcn8s_bbox
    # (checkpoints interchange).
    factory=lambda dtype=jnp.bfloat16, **kw: FCN8sBBox(
        num_classes=kw.pop("num_classes", 11), dtype=dtype,
        store_dtype=kw.pop("store_dtype", jnp.float8_e5m2),
        store_stages=kw.pop("store_stages", 2), **kw),
    grid=GridConfig(288, 288, stride=8, num_classes=11),
    preprocessing="demean",
    background_channel=0,
    heads=("coverage", "bboxes", "seg"),
    reference="train/fcn_bbox/train_val.prototxt",
))
# --- Modern backbone swap (BASELINE config #5) ----------------------------
register("resnet_fpn_detectnet", ModelSpec(
    factory=lambda dtype=jnp.bfloat16, **kw: _resnet_fpn(dtype, **kw),
    grid=GridConfig(448, 448, stride=16, num_classes=4),
    preprocessing="shift127",   # model normalizes internally from raw BGR
    background_channel=None,
    heads=("coverage", "bboxes"),
    reference="(new design — no reference prototxt)",
))


def _resnet_fpn(dtype, **kw):
    from tpufcn.models.resnet_fpn import ResNetFPNDetectNet
    return ResNetFPNDetectNet(num_classes=kw.pop("num_classes", 4),
                              dtype=dtype, **kw)


register("fcn32s_seg", ModelSpec(
    factory=lambda dtype=jnp.bfloat16, **kw: FCN32sSeg(
        num_classes=kw.pop("num_classes", 12), dtype=dtype, **kw),
    grid=GridConfig(224, 224, stride=16, num_classes=12),
    preprocessing="demean",
    background_channel=0,
    heads=("seg",),
    reference="train/semantic_segmentation/train_val.prototxt",
))
register("fcn32s_seg_serving", ModelSpec(
    # e5m2 activation storage on the VGG16 backbone; score_fr/deconv
    # stay exact.  Same param tree as fcn32s_seg; accuracy gated by the
    # bench seg tracker (seg_miou_synthetic_fp8).
    factory=lambda dtype=jnp.bfloat16, **kw: FCN32sSeg(
        num_classes=kw.pop("num_classes", 12), dtype=dtype,
        store_dtype=kw.pop("store_dtype", jnp.float8_e5m2), **kw),
    grid=GridConfig(224, 224, stride=16, num_classes=12),
    preprocessing="demean",
    background_channel=0,
    heads=("seg",),
    reference="train/semantic_segmentation/train_val.prototxt",
))
