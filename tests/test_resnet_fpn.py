"""ResNet-FPN DetectNet (modern backbone swap): shapes, serve pipeline,
and a train step."""

import numpy as np
import jax
import jax.numpy as jnp

from tpufcn.core.config import DataConfig, GridConfig, TrainConfig
from tpufcn.models import build, get_spec
from tpufcn.serve.detector import Detector
from tpufcn.train.step import init_state, make_train_step


def test_store_dtype_agrees_with_exact(rng):
    """e5m2 block-output storage: coverage close to exact (GroupNorm
    stats computed in f32 BEFORE storage; verified mAP 1.0 both modes
    on a trained run — BENCH.md)."""
    import jax
    import jax.numpy as jnp
    from tpufcn.models import build
    exact = build("resnet_fpn_detectnet", dtype=jnp.bfloat16)
    fast = build("resnet_fpn_detectnet", dtype=jnp.bfloat16,
                 store_dtype=jnp.float8_e5m2)
    x = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3)).astype(np.float32))
    p = exact.init(jax.random.key(0), x)
    a = exact.apply(p, x)["coverage"]
    b = fast.apply(p, x)["coverage"]
    assert float(jnp.abs(a - b).mean()) < 0.05


def test_shapes_and_contract():
    model = build("resnet_fpn_detectnet", dtype=jnp.float32, num_classes=3)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out["coverage"].shape == (1, 8, 8, 3)      # stride 16
    assert out["bboxes"].shape == (1, 8, 8, 12)
    cov = np.asarray(out["coverage"])
    assert (cov >= 0).all() and (cov <= 1).all()


def test_serves_through_detector(rng):
    det = Detector("resnet_fpn_detectnet", dtype=jnp.float32,
                   max_candidates=32, model_kwargs={"num_classes": 2})
    frames = rng.integers(0, 256, (1, 448, 448, 3)).astype(np.uint8)
    res = det(frames)
    assert res.boxes.shape == (1, 2, 32, 4)


def test_train_step(rng):
    grid = GridConfig(128, 128, stride=16, num_classes=2)
    cfg = TrainConfig(grid=grid, model="resnet_fpn_detectnet",
                      data=DataConfig(batch_size=2))
    model = build("resnet_fpn_detectnet", dtype=jnp.float32, num_classes=2)
    state = init_state(model, cfg, (1, 128, 128, 3))
    step = make_train_step(model, cfg, preprocessing="shift127")
    batch = {
        "image": jnp.asarray(
            rng.integers(0, 255, (2, 128, 128, 3)).astype(np.uint8)),
        "rects": jnp.tile(jnp.asarray([16.0, 16.0, 60.0, 70.0]), (2, 4, 1)),
        "labels": jnp.zeros((2, 4), jnp.int32),
        "valid": jnp.asarray(np.tile([True, False, False, False], (2, 1))),
    }
    state2, metrics = step(state, batch)
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss_total"]))
