"""Visualization util + seg-family (fcn8s_bbox) train step."""

import numpy as np
import jax.numpy as jnp

from tpufcn.core.config import GridConfig, TrainConfig, DataConfig
from tpufcn.models import build
from tpufcn.serve.viz import class_colors, colorize_pmap, draw_detections
from tpufcn.train.step import init_state, make_train_step


def test_draw_detections(rng):
    frame = rng.integers(0, 255, (120, 160, 3)).astype(np.uint8)
    dets = [([10, 20, 60, 90], 0, 1.1), ([80, 10, 150, 100], 1, 0.7)]
    out = draw_detections(frame, dets, names=["cup", "box"])
    assert out.shape == frame.shape and out.dtype == np.uint8
    assert (out != frame).any()            # something was drawn
    assert (draw_detections(frame, []) == frame).all()


def test_colorize_pmap(rng):
    pmap = rng.integers(0, 255, (60, 80)).astype(np.uint8)
    out = colorize_pmap(pmap)
    assert out.shape == (60, 80, 3)


def test_class_colors_stable():
    assert class_colors(3) == class_colors(3)
    assert len(class_colors(5)) == 5


def test_fcn32s_seg_only_train_step(rng):
    """The semantic_segmentation recipe's model has ONLY a seg head
    (reference train/semantic_segmentation/train_val.prototxt: one
    SoftmaxWithLoss) — the loss graph must skip the absent bbox and
    coverage heads (regression: KeyError 'bboxes' made the recipe
    untrainable)."""
    grid = GridConfig(im_width=64, im_height=64, stride=16, num_classes=3)
    cfg = TrainConfig(grid=grid, model="fcn32s_seg",
                      data=DataConfig(batch_size=2),
                      optimizer="sgd", learning_rate=1e-6)
    model = build("fcn32s_seg", dtype=jnp.float32, num_classes=3)
    state = init_state(model, cfg, (1, 64, 64, 3))
    step = make_train_step(model, cfg, with_seg=True)
    batch = {
        "image": jnp.asarray(rng.random((2, 64, 64, 3),
                                        dtype=np.float32) * 255),
        "rects": jnp.tile(jnp.asarray([8.0, 8.0, 30.0, 30.0]), (2, 4, 1)),
        "labels": jnp.ones((2, 4), jnp.int32),
        "valid": jnp.asarray(np.tile([True, False, False, False], (2, 1))),
        "seg": jnp.asarray(rng.integers(0, 3, (2, 64, 64)).astype(np.int32)),
    }
    state2, metrics = step(state, batch)
    assert int(state2.step) == 1
    assert "loss_bbox" not in metrics and "loss_coverage" not in metrics
    assert np.isfinite(float(metrics["loss_seg"]))
    assert float(metrics["loss_total"]) == float(metrics["loss_seg"])

    # with_seg left False on a seg-only model: NO loss term matches —
    # must raise at trace time, not silently train on a constant zero
    import pytest
    step_bad = make_train_step(model, cfg, with_seg=False)
    with pytest.raises(ValueError, match="no loss term"):
        step_bad(state, {k: v for k, v in batch.items() if k != "seg"})


def test_fcn8s_train_step_with_seg(rng):
    """Joint bbox + coverage + softmax-seg losses (the reference fcn_bbox
    recipe, SURVEY.md C18/C20)."""
    grid = GridConfig(im_width=64, im_height=64, stride=8, num_classes=3)
    cfg = TrainConfig(grid=grid, model="fcn8s_bbox",
                      data=DataConfig(batch_size=2),
                      optimizer="sgd", learning_rate=1e-6)
    model = build("fcn8s_bbox", dtype=jnp.float32, num_classes=3)
    state = init_state(model, cfg, (1, 64, 64, 3))
    step = make_train_step(model, cfg, with_seg=True)
    batch = {
        "image": jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32) * 255),
        "rects": jnp.tile(jnp.asarray([8.0, 8.0, 30.0, 30.0]), (2, 4, 1)),
        "labels": jnp.ones((2, 4), jnp.int32),
        "valid": jnp.asarray(np.tile([True, False, False, False], (2, 1))),
        "seg": jnp.asarray(rng.integers(0, 3, (2, 64, 64)).astype(np.int32)),
    }
    state2, metrics = step(state, batch)
    assert int(state2.step) == 1
    for k in ("loss_bbox", "loss_coverage", "loss_seg", "loss_total"):
        assert np.isfinite(float(metrics[k])), k


def test_feature_grid_vis_square():
    """vis_square analog (reference fcn_object_detector.py:416-426):
    C maps tile into a ceil(sqrt(C))^2 mosaic, globally normalized."""
    from tpufcn.serve.viz import feature_grid
    rng = np.random.default_rng(0)
    f = rng.normal(size=(1, 5, 7, 10)).astype(np.float32)  # NHWC, C=10
    g = feature_grid(f, pad=1)
    assert g.dtype == np.uint8
    # 10 maps -> 4x4 grid of (5+1)x(7+1) padded tiles
    assert g.shape == (4 * 6, 4 * 8)
    # tile (0,0) equals the normalized first channel
    ch0 = f[0, :, :, 0]
    want = (ch0 - f.min()) / (f.max() - f.min())
    np.testing.assert_allclose(g[:5, :7] / 255.0, want, atol=1 / 255.0)
    # constant input doesn't divide by zero
    assert feature_grid(np.ones((3, 3, 4))).min() >= 0
