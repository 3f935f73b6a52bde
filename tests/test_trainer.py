"""Trainer loop: fit over a synthetic compositing pipeline, checkpoint
save/resume, metric logging."""

import os

import numpy as np
import cv2 as cv
import jax.numpy as jnp
import pytest

from tpufcn.core.config import DataConfig, GridConfig, TrainConfig
from tpufcn.data import CompositeTrainPipeline
from tpufcn.data.manifest import MaskSample
from tpufcn.models import build
from tpufcn.train.trainer import Trainer


@pytest.fixture
def tiny_dataset(tmp_path, rng):
    samples = []
    for i in range(3):
        img = rng.integers(0, 80, size=(96, 128, 3)).astype(np.uint8)
        mask = np.zeros((96, 128), np.uint8)
        x, y, w, h = 20 + i * 6, 16, 40, 48
        img[y:y + h, x:x + w] = (200, 60 + 60 * i, 90)
        mask[y:y + h, x:x + w] = 255
        ip, mp = str(tmp_path / f"i{i}.png"), str(tmp_path / f"m{i}.png")
        cv.imwrite(ip, img)
        cv.imwrite(mp, mask)
        samples.append(MaskSample(ip, mp, i % 2, np.array([x, y, w, h])))
    return samples


def test_trainer_fit_and_resume(tmp_path, tiny_dataset):
    grid = GridConfig(im_width=64, im_height=64, stride=8, num_classes=2)
    cfg = TrainConfig(
        grid=grid, model="vgg_detectnet_train",
        data=DataConfig(batch_size=2),
        snapshot_every=2, max_iter=3,
        snapshot_dir=str(tmp_path / "snap"),
        log_every=1)
    model = build("vgg_detectnet_train", dtype=jnp.float32, num_classes=2)
    lines = []
    tr = Trainer(cfg, model=model, log_sink=lines.append)
    pipe = CompositeTrainPipeline(tiny_dataset, grid,
                                  DataConfig(batch_size=2), box_capacity=4)
    state = tr.fit(iter(pipe), max_iter=3)
    assert int(state.step) == 3
    assert lines and "loss=" in lines[0]
    # snapshots on disk
    assert os.path.isdir(cfg.snapshot_dir)

    # resume: a fresh trainer picks up at step 3 and continues to 5
    tr2 = Trainer(cfg, model=model, log_sink=lines.append)
    state2 = tr2.fit(iter(pipe), max_iter=5)
    assert int(state2.step) == 5


def test_trainer_metrics_finite(tmp_path, tiny_dataset):
    grid = GridConfig(im_width=64, im_height=64, stride=8, num_classes=2)
    cfg = TrainConfig(
        grid=grid, model="vgg_detectnet_train",
        data=DataConfig(batch_size=2), snapshot_every=0, max_iter=2,
        snapshot_dir=str(tmp_path / "s2"), log_every=1)
    model = build("vgg_detectnet_train", dtype=jnp.float32, num_classes=2)
    tr = Trainer(cfg, model=model, log_sink=lambda s: None)
    pipe = CompositeTrainPipeline(tiny_dataset, grid,
                                  DataConfig(batch_size=2), box_capacity=4)
    tr.fit(iter(pipe), max_iter=2)
    hist = tr.logger.history
    assert len(hist) == 2
    assert all(np.isfinite(h["loss_total"]) for h in hist)


def test_trainer_multistep_snapshot_cadence(tmp_path, tiny_dataset):
    # steps_per_dispatch=2 never lands exactly on snapshot_every=3; a
    # snapshot must still be taken when the cadence boundary is crossed
    # (step 4 crosses the 3-boundary), not only at the final save.
    grid = GridConfig(im_width=64, im_height=64, stride=8, num_classes=2)
    cfg = TrainConfig(
        grid=grid, model="vgg_detectnet_train",
        data=DataConfig(batch_size=2),
        snapshot_every=3, max_iter=6,
        snapshot_dir=str(tmp_path / "snap_multi"),
        log_every=1)
    model = build("vgg_detectnet_train", dtype=jnp.float32, num_classes=2)
    tr = Trainer(cfg, model=model, steps_per_dispatch=2,
                 log_sink=lambda s: None)
    pipe = CompositeTrainPipeline(tiny_dataset, grid,
                                  DataConfig(batch_size=2), box_capacity=4)
    state = tr.fit(iter(pipe), max_iter=6)
    assert int(state.step) == 6
    steps = sorted(tr._mgr.all_steps())
    assert 4 in steps, f"mid-run snapshot missing: {steps}"
    assert 6 in steps


def test_trainer_fit_from_parallel_pipeline(tmp_path, tiny_dataset):
    """Trainer consumes the process-pool pipeline end to end."""
    from tpufcn.data.parallel import ParallelCompositePipeline

    grid = GridConfig(im_width=64, im_height=64, stride=8, num_classes=2)
    cfg = TrainConfig(
        grid=grid, model="vgg_detectnet_train",
        data=DataConfig(batch_size=2),
        snapshot_every=0, max_iter=2,
        snapshot_dir=str(tmp_path / "snap_par"), log_every=1)
    model = build("vgg_detectnet_train", dtype=jnp.float32, num_classes=2)
    tr = Trainer(cfg, model=model, log_sink=lambda s: None)
    with ParallelCompositePipeline(
            tiny_dataset, grid, DataConfig(batch_size=2), box_capacity=4,
            workers=2, depth=2, seed=5) as pipe:
        state = tr.fit(iter(pipe), max_iter=2)
    assert int(state.step) == 2


def test_trainer_iter_size_groups_micro_batches(tmp_path, tiny_dataset):
    """iter_size=2: each solver iteration consumes TWO pipeline
    micro-batches and performs one update (Caffe iter_size semantics);
    a source exhausting mid-iteration drops the partial group."""
    grid = GridConfig(im_width=64, im_height=64, stride=8, num_classes=2)
    cfg = TrainConfig(
        grid=grid, model="vgg_detectnet_train",
        data=DataConfig(batch_size=2), iter_size=2,
        snapshot_every=0, max_iter=2,
        snapshot_dir=str(tmp_path / "snap"), log_every=1)
    model = build("vgg_detectnet_train", dtype=jnp.float32, num_classes=2)
    pipe = CompositeTrainPipeline(tiny_dataset, grid,
                                  DataConfig(batch_size=2), box_capacity=4)
    drawn = []

    def counted():
        for b in pipe:
            drawn.append(1)
            yield b

    lines = []
    tr = Trainer(cfg, model=model, log_sink=lines.append)
    state = tr.fit(counted(), max_iter=2)
    assert int(state.step) == 2          # 2 updates...
    assert sum(drawn) == 4               # ...from 4 micro-batches
    assert any("loss=" in l for l in lines)

    # partial final group: 3 micro-batches at iter_size 2 -> 1 update
    def three():
        it = iter(pipe)
        for _ in range(3):
            yield next(it)

    tr2 = Trainer(cfg, model=model, log_sink=lines.append)
    state2 = tr2.fit(three(), max_iter=50, resume=False)
    assert int(state2.step) == 1
    assert any("mid-iteration" in l for l in lines)


def test_trainer_iter_size_with_multistep_rejected(tmp_path):
    grid = GridConfig(im_width=64, im_height=64, stride=8, num_classes=2)
    cfg = TrainConfig(grid=grid, model="vgg_detectnet_train",
                      data=DataConfig(batch_size=2), iter_size=2,
                      snapshot_dir=str(tmp_path / "snap"))
    model = build("vgg_detectnet_train", dtype=jnp.float32, num_classes=2)
    with pytest.raises(ValueError, match="iter_size"):
        Trainer(cfg, model=model, steps_per_dispatch=2)


def test_trainer_refuses_fp8_serving_models(tmp_path):
    """fp8 activation storage is serving-only: differentiating through
    the e5m2 converts crashes the remote TPU compiler (BENCH.md
    negative), so Trainer must refuse store_dtype models with a clear
    error instead of an opaque remote-compiler signal 6."""
    cfg = TrainConfig(
        grid=GridConfig(im_width=64, im_height=64, stride=8, num_classes=2),
        model="googlenet_detectnet_serving",
        snapshot_dir=str(tmp_path / "snap"))
    model = build("googlenet_detectnet_serving")
    with pytest.raises(ValueError, match="serving-only"):
        Trainer(cfg, model=model, log_sink=lambda s: None)


def test_trainer_signal_snapshot_stop(tmp_path, tiny_dataset):
    """Preemption tolerance (SURVEY.md §5 "periodic + on-signal"):
    SIGTERM mid-fit stops the loop at the next dispatch boundary with a
    snapshot saved at the stopped step; previous handlers are restored;
    a resume continues from the preempted step."""
    import os
    import signal

    grid = GridConfig(im_width=64, im_height=64, stride=8, num_classes=2)
    cfg = TrainConfig(
        grid=grid, model="vgg_detectnet_train",
        data=DataConfig(batch_size=2), snapshot_every=0, max_iter=50,
        snapshot_dir=str(tmp_path / "sig"), log_every=1)
    model = build("vgg_detectnet_train", dtype=jnp.float32, num_classes=2)
    lines = []
    tr = Trainer(cfg, model=model, log_sink=lines.append)
    pipe = CompositeTrainPipeline(tiny_dataset, grid,
                                  DataConfig(batch_size=2), box_capacity=4)

    def preempting(src, after):
        for i, b in enumerate(src):
            if i == after:              # delivered DURING fit: the loop
                os.kill(os.getpid(), signal.SIGTERM)   # must stop + save
            yield b

    before = signal.getsignal(signal.SIGTERM)
    state = tr.fit(preempting(iter(pipe), after=1), max_iter=50)
    assert signal.getsignal(signal.SIGTERM) is before   # handler restored
    assert int(state.step) == 2                          # stopped early
    assert tr._mgr.latest_step() == 2                    # snapshot saved
    assert any("signal" in l and "stopping" in l for l in lines)

    # resume picks up exactly at the preempted step
    tr2 = Trainer(cfg, model=model, log_sink=lines.append)
    state2 = tr2.fit(iter(pipe), max_iter=3)
    assert int(state2.step) == 3
