"""On-device copy-paste compositing (tpufcn.data.device_compositor).

Semantics mirrored from the reference Mapping engine
(reference scripts/data_argumentation_layer/argumentation_engine.py:601-754)
— the host pipeline (tpufcn.data.compositor) is the parity-exact path,
so these tests pin the device path's CONTRACT: batch shapes/dtypes,
rect/mask alignment, the scaled-IoU(<=0.05) placement constraint,
determinism, and train-step integration.
"""

import numpy as np
import pytest

from tpufcn.core.config import DataConfig, GridConfig
from tpufcn.data.compositor import _scaled_iou
from tpufcn.data.device_compositor import DeviceCompositePipeline
from tpufcn.data.manifest import MaskSample


@pytest.fixture(scope="module")
def dataset():
    rng = np.random.default_rng(0)
    store = {}
    samples = []
    for i in range(4):
        H, W = 48 + i * 8, 64 + i * 4
        img = rng.integers(0, 256, (H, W, 3)).astype(np.uint8)
        m = np.zeros((H, W), np.uint8)
        x, y, w, h = 5 + i, 6, 20, 16
        m[y:y + h, x:x + w] = 255
        store[f"img{i}"] = img
        store[f"msk{i}"] = m
        samples.append(MaskSample(f"img{i}", f"msk{i}", i % 2,
                                  np.array([x, y, w, h], np.int32)))
    return samples, store.get


GRID = GridConfig(im_width=96, im_height=96, stride=8, num_classes=2)


def test_batch_contract_and_determinism(dataset):
    samples, imread = dataset
    pipe = DeviceCompositePipeline(samples, GRID, DataConfig(batch_size=4),
                                   imread=imread, seed=3)
    b = pipe.batch(4)
    img = np.asarray(b["image"])
    assert img.shape == (4, 96, 96, 3) and img.dtype == np.uint8
    assert np.asarray(b["seg"]).shape == (4, 96, 96)
    assert np.asarray(b["rects"]).shape == (4, 8, 4)
    valid = np.asarray(b["valid"])
    assert valid.sum(1).min() >= 1          # every scene has >= 1 paste
    # rects inside the frame
    rects = np.asarray(b["rects"])
    for i in range(4):
        for r in rects[i][valid[i]]:
            assert r[0] >= 0 and r[1] >= 0
            assert r[0] + r[2] <= 96 + 1e-3 and r[1] + r[3] <= 96 + 1e-3
    # same seed -> bit-identical batch; successive batches differ
    pipe2 = DeviceCompositePipeline(samples, GRID, DataConfig(batch_size=4),
                                    imread=imread, seed=3)
    assert np.array_equal(np.asarray(pipe2.batch(4)["image"]), img)
    assert not np.array_equal(np.asarray(pipe.batch(4)["image"]), img)


def test_mask_rect_alignment_and_iou_constraint(dataset):
    samples, imread = dataset
    pipe = DeviceCompositePipeline(samples, GRID, DataConfig(batch_size=8),
                                   imread=imread, seed=5,
                                   scene_flip=False, zoom=False,
                                   photometric=False)
    b = pipe.batch(8)
    seg = np.asarray(b["seg"])
    rects = np.asarray(b["rects"])
    valid = np.asarray(b["valid"])
    labels = np.asarray(b["labels"])
    tol = 2   # bilinear mask edges
    for i in range(8):
        vr, vl = rects[i][valid[i]], labels[i][valid[i]]
        ys, xs = np.nonzero(seg[i])
        for yy, xx in zip(ys, xs):
            assert any(r[0] - tol <= xx <= r[0] + r[2] + tol
                       and r[1] - tol <= yy <= r[1] + r[3] + tol
                       for r in vr)
        for r, l in zip(vr, vl):
            x0, y0, w, h = [int(v) for v in r]
            win = seg[i, max(y0, 0):y0 + h + 1, max(x0, 0):x0 + w + 1]
            # instance mask stores label+1 (reference :728)
            assert (win == l + 1).sum() > 0
        for a in range(len(vr)):
            for c in range(a + 1, len(vr)):
                assert _scaled_iou(vr[a], vr[c]) <= 0.05 + 1e-6


def test_scene_transforms_keep_alignment(dataset):
    """Flip + zoom + photometric on: rects still bound their seg pixels
    (the transforms move image, mask, and rects together)."""
    samples, imread = dataset
    pipe = DeviceCompositePipeline(samples, GRID, DataConfig(batch_size=8),
                                   imread=imread, seed=11)
    b = pipe.batch(8)
    seg = np.asarray(b["seg"])
    rects = np.asarray(b["rects"])
    valid = np.asarray(b["valid"])
    tol = 4   # flip -1 shifts + zoom resampling + rounding
    for i in range(8):
        vr = rects[i][valid[i]]
        ys, xs = np.nonzero(seg[i])
        for yy, xx in zip(ys, xs):
            assert any(r[0] - tol <= xx <= r[0] + r[2] + tol
                       and r[1] - tol <= yy <= r[1] + r[3] + tol
                       for r in vr), (i, xx, yy, vr)


def test_photometric_changes_pixels_in_range(dataset):
    samples, imread = dataset
    mk = lambda pm, seed: DeviceCompositePipeline(
        samples, GRID, DataConfig(batch_size=2), imread=imread, seed=seed,
        scene_flip=False, zoom=False, photometric=pm)
    plain = np.asarray(mk(False, 7).batch(2)["image"])
    jit_ = np.asarray(mk(True, 7).batch(2)["image"])
    assert jit_.min() >= 0 and jit_.max() <= 255
    assert not np.array_equal(plain, jit_)


def test_rotate_refused(dataset):
    samples, imread = dataset
    with pytest.raises(ValueError, match="rotation"):
        DeviceCompositePipeline(samples, GRID,
                                DataConfig(batch_size=2, rotate=True),
                                imread=imread)


def test_mesh_sharded_generation_matches_single_device(dataset):
    """out_shardings=batch_sharding(mesh): GSPMD partitions the
    generator over the mesh with IDENTICAL numerics, and the batch
    lands already sharded for the train step (zero resharding)."""
    import jax
    from tpufcn.core.config import MeshConfig
    from tpufcn.core.mesh import make_mesh
    from tpufcn.train.step import batch_sharding

    samples, imread = dataset
    mesh = make_mesh(MeshConfig(data=4, space=2))
    kw = dict(imread=imread, seed=21, box_capacity=4)
    single = DeviceCompositePipeline(samples, GRID,
                                     DataConfig(batch_size=8), **kw)
    sharded = DeviceCompositePipeline(samples, GRID,
                                      DataConfig(batch_size=8),
                                      mesh=mesh, **kw)
    b1 = single.batch(8)
    b2 = sharded.batch(8)
    for k in b1:
        np.testing.assert_array_equal(np.asarray(b1[k]), np.asarray(b2[k]))
    sh = batch_sharding(mesh)
    assert b2["image"].sharding.is_equivalent_to(sh["image"],
                                                 b2["image"].ndim)
    assert b2["rects"].sharding.is_equivalent_to(sh["rects"],
                                                 b2["rects"].ndim)


@pytest.mark.slow
def test_train_step_integration(dataset):
    import jax.numpy as jnp
    from tpufcn.core.config import TrainConfig
    from tpufcn.models import build
    from tpufcn.train.step import init_state, make_train_step

    samples, imread = dataset
    grid = GridConfig(im_width=64, im_height=64, stride=8, num_classes=1)
    cfg = TrainConfig(grid=grid, model="vgg_detectnet_train",
                      data=DataConfig(batch_size=2))
    model = build("vgg_detectnet_train", dtype=jnp.float32, num_classes=1)
    state = init_state(model, cfg, (1, 64, 64, 3))
    step = make_train_step(model, cfg)
    pipe = DeviceCompositePipeline(samples, grid, DataConfig(batch_size=2),
                                   imread=imread, box_capacity=4, seed=1)
    it = iter(pipe)
    for _ in range(2):
        state, metrics = step(state, next(it))
    assert np.isfinite(float(metrics["loss_total"]))

    # multi-step dispatch: Trainer stacks device batches ON device
    # (stack_batches keeps jax.Arrays resident) and trains from them
    import dataclasses
    from tpufcn.train.trainer import Trainer
    cfg2 = dataclasses.replace(cfg, max_iter=4, snapshot_every=0,
                               snapshot_dir="/tmp/devcomp_trainer_test")
    tr = Trainer(cfg2, model=model, steps_per_dispatch=2,
                 log_sink=lambda s: None)
    st = tr.fit(iter(pipe), resume=False)
    assert int(st.step) == 4
