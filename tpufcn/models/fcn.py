"""FCN families: FCN-8s + bbox branch ("fcn_bbox") and FCN-32s segmentation.

:class:`FCN8sBBox` is the net family the reference *runtime* decoder
expects (reference train/fcn_bbox/train_val.prototxt; decode stride 8 and
blob ``upscore_pool5_bbox`` at scripts/fcn_object_detector.py:89-90,360):

* VGG16 + pool5 + dropout 0.5;
* bbox branch: 1x1 ``score_conv5_bbox`` (4C ch) -> fixed bilinear deconv
  k8 s4 p2 -> stride-8 ``upscore_pool5_bbox``;
* seg branch (FCN-8s skips): ``score_conv5`` -> up x2 + ``score_pool4``
  -> up x2 + ``score_pool3`` -> ``fuse_pool3`` (stride 8) -> up x8 ->
  full-res ``upscore_pool3`` logits.

Output contract note: the reference script reads a blob ``pool_score``
that exists in no committed prototxt (SURVEY.md top-level caveats).  We
define the coherent equivalent: ``coverage`` is the softmax of
``fuse_pool3`` — the stride-8 class-score grid, exactly the resolution
the runtime decode loop assumes.  Channel 0 is background; the serving
layer skips it (reference fcn_object_detector.py:89 reads ``[1:]``).

:class:`FCN32sSeg` is the semantic-segmentation net (reference
train/semantic_segmentation/train_val.prototxt): VGG16 (note: **no**
pool5 — score_fr consumes conv5_3 at stride 16) -> 1x1 ``score_fr`` ->
fixed bilinear deconv k32 s16 p8 -> full-res logits.

All fixed-bilinear Deconvs here use the separable two-matmul form
(ops/caffe_layers.upsample_bilinear_separable): same numerics as the
depthwise deconv (pinned by tests/test_caffe_layers.py) but lowered as
two dense matmuls on the MXU — the ``group == C`` deconv was the
fcn32s serving tail (33 % MFU, BENCH.md round-3).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from tpufcn.models.layers import conv_relu, max_pool_caffe
from tpufcn.ops.caffe_layers import upsample_bilinear_separable
from tpufcn.models.vgg import VGG16Backbone


class FCN8sBBox(nn.Module):
    """num_classes includes background (reference: 11)."""

    num_classes: int = 11
    dropout_rate: float = 0.5
    dtype: Any = jnp.bfloat16
    store_dtype: Any = None    # serving: compact activation storage
    store_stages: int = 5      # quantize backbone stages <= this

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> Dict[str, jnp.ndarray]:
        C = self.num_classes
        taps = VGG16Backbone(dtype=self.dtype, store_dtype=self.store_dtype,
                             store_stages=self.store_stages,
                             name="backbone")(x)
        p5 = max_pool_caffe(taps["conv5_3"], 2, 2)            # pool5, stride 32
        y = nn.Dropout(self.dropout_rate, deterministic=not train,
                       name="dropout5")(p5)

        # bbox branch (stride 8)
        sb = conv_relu(y, 4 * C, 1, name="score_conv5_bbox", relu=False,
                       dtype=self.dtype)
        bboxes = upsample_bilinear_separable(sb.astype(jnp.float32), 8, 4, 2)

        # seg branch: FCN-8s skip fusion
        s5 = conv_relu(y, C, 1, name="score_conv5", relu=False,
                       dtype=self.dtype).astype(jnp.float32)
        up5 = upsample_bilinear_separable(s5, 4, 2, 1)            # stride 16
        s4 = conv_relu(taps["pool4"], C, 1, name="score_pool4", relu=False,
                       dtype=self.dtype).astype(jnp.float32)
        fuse4 = up5 + s4
        up4 = upsample_bilinear_separable(fuse4, 4, 2, 1)         # stride 8
        s3 = conv_relu(taps["pool3"], C, 1, name="score_pool3", relu=False,
                       dtype=self.dtype).astype(jnp.float32)
        fuse3 = up4 + s3                                      # stride 8
        seg = upsample_bilinear_separable(fuse3, 16, 8, 4)        # full res

        coverage = nn.softmax(fuse3, axis=-1)
        return {"coverage": coverage, "bboxes": bboxes, "seg": seg}


class FCN32sSeg(nn.Module):
    """num_classes includes background (reference: 12)."""

    num_classes: int = 12
    dtype: Any = jnp.bfloat16
    store_dtype: Any = None    # serving: compact activation storage
    store_stages: int = 5      # quantize backbone stages <= this

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> Dict[str, jnp.ndarray]:
        taps = VGG16Backbone(dtype=self.dtype, store_dtype=self.store_dtype,
                             store_stages=self.store_stages,
                             name="backbone")(x)
        # Caffe layer name "score_fr_6" (top blob "score_fr") — the module
        # uses the LAYER name so .caffemodel blobs map 1:1.
        s = conv_relu(taps["conv5_3"], self.num_classes, 1, name="score_fr_6",
                      relu=False, dtype=self.dtype).astype(jnp.float32)
        seg = upsample_bilinear_separable(s, 32, 16, 8)           # full res
        return {"seg": seg, "score": nn.softmax(seg, axis=-1)}
