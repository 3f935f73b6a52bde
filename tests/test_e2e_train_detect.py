"""End-to-end: train on synthetic compositor data, snapshot, load the
snapshot into the serving Detector, run detection — the full user
workflow (BASELINE config #3 shape, tiny scale)."""

import numpy as np
import cv2 as cv
import jax.numpy as jnp
import pytest

from tpufcn.core.config import DataConfig, GridConfig, TrainConfig
from tpufcn.data import CompositeTrainPipeline
from tpufcn.data.manifest import MaskSample
from tpufcn.models import build
from tpufcn.serve.detector import Detector
from tpufcn.train.trainer import Trainer


@pytest.fixture
def dataset(tmp_path, rng):
    samples = []
    for i in range(3):
        img = rng.integers(0, 60, size=(120, 160, 3)).astype(np.uint8)
        mask = np.zeros((120, 160), np.uint8)
        x, y, w, h = 30 + 8 * i, 20, 48, 56
        gy, gx = np.mgrid[0:h, 0:w]
        img[y:y + h, x:x + w] = np.stack(
            [200 - gx, 60 + gy, 120 + ((gx + gy) % 5) * 20], -1
        ).clip(0, 255).astype(np.uint8)
        mask[y:y + h, x:x + w] = 255
        ip, mp = str(tmp_path / f"i{i}.png"), str(tmp_path / f"m{i}.png")
        cv.imwrite(ip, img)
        cv.imwrite(mp, mask)
        samples.append(MaskSample(ip, mp, 0, np.array([x, y, w, h])))
    return samples


def test_train_snapshot_serve_roundtrip(tmp_path, dataset):
    grid = GridConfig(im_width=64, im_height=64, stride=8, num_classes=1)
    snap = str(tmp_path / "snap")
    cfg = TrainConfig(
        grid=grid, model="vgg_detectnet_train",
        data=DataConfig(batch_size=2),
        snapshot_every=0, max_iter=4, snapshot_dir=snap, log_every=1)
    model = build("vgg_detectnet_train", dtype=jnp.float32, num_classes=1)
    losses = []
    tr = Trainer(cfg, model=model,
                 log_sink=lambda s: losses.append(s))
    pipe = CompositeTrainPipeline(dataset, grid, DataConfig(batch_size=2),
                                  box_capacity=4, seed=1)
    state = tr.fit(iter(pipe), max_iter=4)
    assert int(state.step) == 4

    # loss must be finite and have moved over the 4 steps
    hist = tr.logger.history
    assert len(hist) == 4
    assert all(np.isfinite(h["loss_total"]) for h in hist)
    assert hist[0]["loss_total"] != hist[-1]["loss_total"]

    # serving path loads the snapshot (written at fit end) and detects
    det = Detector.from_checkpoint(
        snap, "vgg_detectnet_train", dtype=jnp.float32, max_candidates=64,
        model_kwargs={"num_classes": 1})
    frame = np.asarray(cv.imread(dataset[0].image_path))
    result = det(frame[None])
    assert result.boxes.shape[1] == 1        # one foreground class
    assert result.valid.dtype == bool
    # restored params match the trained ones (spot check one leaf)
    a = np.asarray(det.params["params"]["cvg/classifier"]["conv"]["bias"])
    b = np.asarray(state.params["params"]["cvg/classifier"]["conv"]["bias"])
    np.testing.assert_array_equal(a, b)
