"""DetectNet loss graph, Caffe semantics (reference SURVEY.md C20).

The reference expresses the loss declaratively in prototxt (reference
train/fcn_bbox/train_val.prototxt:568-659, models/train_val.prototxt:2237-2281):

  label side:  bbox-label (*) size-block (*) obj-block
  pred side:   bboxes (*) coverage-block (*) size-block (*) obj-block
  losses:      L1Loss(pred, label) * 2.0          (NVCaffe layer)
             + EuclideanLoss(coverage, coverage-label)
  [fcn_bbox]   + SoftmaxWithLoss(seg, label)       (normalize: false)

Caffe loss normalizations (preserved exactly):
  * NVCaffe L1Loss:      sum(|a - b|) / batch
  * EuclideanLoss:       sum((a - b)^2) / (2 * batch)
  * SoftmaxWithLoss with ``normalize: false``: sum(xent) / batch
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tpufcn.ops.grid_codec import GridLabels


def l1_loss_caffe(pred: jax.Array, target: jax.Array) -> jax.Array:
    """NVCaffe L1Loss: sum of absolute differences over everything,
    divided by the leading (batch) dimension."""
    b = pred.shape[0]
    return jnp.sum(jnp.abs(pred.astype(jnp.float32)
                           - target.astype(jnp.float32))) / b


def euclidean_loss_caffe(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Caffe EuclideanLoss: 1/(2N) * sum of squared differences."""
    b = pred.shape[0]
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.sum(jnp.square(d)) / (2.0 * b)


def seg_loss(logits: jax.Array, label: jax.Array,
             normalize: bool = False) -> jax.Array:
    """SoftmaxWithLoss over NHWC logits and integer NHW labels.

    ``normalize=False`` divides by batch only (the reference seg nets set
    normalize: false — train/fcn_bbox/train_val.prototxt:833-847).
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, label[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    if normalize:
        return jnp.mean(nll)
    return jnp.sum(nll) / logits.shape[0]


def detectnet_loss(outputs: Dict[str, jax.Array],
                   labels: GridLabels,
                   bbox_weight: float = 2.0,
                   coverage_weight: float = 1.0,
                   seg_labels: jax.Array | None = None,
                   seg_weight: float = 1.0,
                   seg_normalize: bool = False,
                   ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Total DetectNet training loss with per-term metrics.

    Args:
      outputs: model dict with "coverage" (B,gh,gw,C), "bboxes" (B,gh,gw,4C)
        and optionally "seg" (B,H,W,C).  Heads a family does not produce
        are skipped (FCN-32s is seg-only — its train graph has just the
        SoftmaxWithLoss term, train/semantic_segmentation/train_val.prototxt).
      labels: batched GridLabels (leading batch axis).
      seg_labels: (B, H, W) int mask for the fcn_bbox family, or None.
    """
    total = jnp.zeros((), jnp.float32)
    metrics: Dict[str, jax.Array] = {}
    if "bboxes" in outputs:
        # masked/normalized eltwise chains (Caffe Eltwise PROD)
        label_side = labels.bbox * labels.size * labels.obj
        pred_side = (outputs["bboxes"].astype(jnp.float32)
                     * labels.coverage_block * labels.size * labels.obj)
        bbox_l = l1_loss_caffe(pred_side, label_side)
        total = total + bbox_weight * bbox_l
        metrics["loss_bbox"] = bbox_l
    if "coverage" in outputs:
        cov_l = euclidean_loss_caffe(outputs["coverage"], labels.coverage)
        total = total + coverage_weight * cov_l
        metrics["loss_coverage"] = cov_l

    if seg_labels is not None and "seg" in outputs:
        s = seg_loss(outputs["seg"], seg_labels, seg_normalize)
        total = total + seg_weight * s
        metrics["loss_seg"] = s
        # take_along_axis CLAMPS out-of-range labels to the last class
        # inside jit (a num_classes mis-set trains wrong supervision
        # with a finite, falling loss) — surface the count so the
        # misconfiguration is visible in the step metrics
        C = outputs["seg"].shape[-1]
        lab = seg_labels.astype(jnp.int32)
        metrics["seg_invalid_px"] = jnp.sum(
            (lab < 0) | (lab >= C)).astype(jnp.float32)

    if not metrics:
        # trace-time check: a seg-only model with with_seg=False would
        # otherwise "train" on a constant zero loss with no diagnostic
        raise ValueError(
            f"no loss term matches the model outputs {sorted(outputs)}; "
            "seg-only families need with_seg=True")
    metrics["loss_total"] = total
    return total, metrics
